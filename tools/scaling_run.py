"""Scaling-evidence protocol runner (BASELINE.md): the same index-build +
query job on the SAME input at two parallelism levels (N=local[4] vs
4N=local[16]), shuffle partitions scaled 2x cores, median of R runs.

N=4/16 rather than 8/32 because this VM's all-core turbo budget caps even
embarrassingly-parallel pure-Python CPU work at ~2.6x from 8->32 workers
(0.66 efficiency ceiling), while 4->16 sustains ~3.6x (0.89 ceiling) — the
calibration harness below reproduces this.  Run with --calibrate to print
the hardware ceiling alongside.

Each measurement runs bench.py in a FRESH subprocess (its own SparkSession
and JVM) so levels don't share executor state.

Usage: python tools/scaling_run.py [rows] [runs]
Writes BENCH/BASELINE.md-ready JSON to stdout and .scratch/scaling.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_once(cpus: int, rows: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ROWS=str(rows),
        PYTHONPATH=str(REPO),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    if not out.stdout.strip():
        raise RuntimeError(
            f"bench.py (cpus={cpus}, rows={rows}) produced no stdout "
            f"(rc={out.returncode}); stderr tail:\n"
            + "\n".join(out.stderr.strip().splitlines()[-30:])
        )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def calibrate() -> dict:
    """Pure-CPU multiprocessing throughput at each level — the hardware
    ceiling any Spark job on this box is bounded by."""
    import multiprocessing as mp
    import time

    out = {}
    for n in (4, 8, 16, 32):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_burn, range(n))
        out[str(n)] = round(n / (time.time() - t0), 2)
    out["ceiling_4_to_16"] = round(out["16"] / out["4"] / 4.0, 3)
    out["ceiling_8_to_32"] = round(out["32"] / out["8"] / 4.0, 3)
    for n in (4, 16):
        out[f"membw_{n}_gbps"] = _membw(n)
    out["membw_ceiling_4_to_16"] = round(
        out["membw_16_gbps"] / out["membw_4_gbps"] / 4.0, 3
    )
    return out


def pair_ceiling() -> dict:
    """Quick 4-vs-16 hardware ceilings, run alongside each measurement
    pair: tenancy on this host swings tens of percent over minutes, so a
    single start-of-run calibration cannot qualify individual pairs.

    TWO axes, because they fail independently (measured 2026-08-19: a
    window with a 0.98 pure-CPU ceiling had DRAM saturating at ~4 workers
    — aggregate memcpy 54.7 GB/s @4 procs vs 43.3 @16, a 0.20 bandwidth
    ceiling — and the build's bandwidth-bound stages ran 3x slower at 16c
    while CPU-bound stages were unaffected):

    * ``cpu``  — pure-Python int loop (registers/L1; no memory traffic);
    * ``membw`` — aggregate preallocated-buffer memcpy GB/s, the ceiling
      the tokenize feed and postings shuffle/merge actually live under.
    """
    import multiprocessing as mp
    import time

    rates = {}
    for n in (4, 16):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_burn, range(n))
        rates[n] = n / (time.time() - t0)
    bw4, bw16 = _membw(4), _membw(16)
    return {
        "cpu": round(rates[16] / rates[4] / 4.0, 3),
        "membw": round(bw16 / bw4 / 4.0, 3),
        "membw_4_gbps": bw4,
        "membw_16_gbps": bw16,
    }


def _burn(_):
    s = 0
    for i in range(60_000_000):
        s += i
    return s


def _membw(procs: int) -> float:
    """Aggregate memcpy GB/s over ``procs`` workers (preallocated 64 MB
    src/dst per worker, ~1.5 s of copies — no page faults in the timed
    loop, so it reads the DRAM subsystem, not the allocator).  Best of
    two pools: the first measurement after other load routinely
    under-reads (cold scheduler/frequency state — observed 0.3 GB/s
    immediately after a CPU-burn pool vs ~45 settled)."""
    import multiprocessing as mp

    best = 0.0
    for _ in range(2):
        with mp.Pool(procs) as p:
            best = max(best, sum(p.map(_copy_rate, range(procs))))
    return round(best, 1)


def _copy_rate(_):
    import time

    import numpy as np

    a = np.empty(1 << 26, dtype=np.uint8)
    a[:] = 1
    b = np.empty(1 << 26, dtype=np.uint8)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 1.5:
        np.copyto(b, a)
        n += 1
    return 2 * n * len(a) / (time.time() - t0) / 1e9


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report: dict = {"rows": rows, "runs": runs, "levels": {}}
    report["hardware_calibration"] = calibrate()
    # INTERLEAVE levels (4,16,4,16,...) — this host's throughput drifts
    # +-40% over tens of minutes (shared tenancy), so grouping all runs of
    # one level confounds level with time; interleaving decorrelates it
    import time as _time

    samples_by: dict[int, list] = {4: [], 16: []}
    pairs: list[dict] = []
    for it in range(runs):
        if it:
            # let the previous pair's ceiling burn + JVM teardown decay so
            # the next 4c run doesn't start against our own residual load
            # (observed load_at_start ~10 on pairs 2+ without this)
            _time.sleep(45)
        load0 = os.getloadavg()[0]
        for cpus in (4, 16):
            samples_by[cpus].append(run_once(cpus, rows, sf_dir))
        ceil = pair_ceiling()
        s4, s16 = samples_by[4][-1], samples_by[16][-1]
        t4 = s4["queries"]["index_build"]
        t16 = s16["queries"]["index_build"]
        sc4 = s4["queries"].get("categorise_136_scored_top100")
        sc16 = s16["queries"].get("categorise_136_scored_top100")
        pairs.append(
            {
                "t4_build": t4,
                "t16_build": t16,
                "pair_eff_build": round((t4 / t16) / 4.0, 3),
                "pair_eff_scored": (
                    round((sc4 / sc16) / 4.0, 3) if sc4 and sc16 else None
                ),
                # in-window load sentinels (1-min loadavg at each sample's
                # start and at end-of-build): a 4c sample whose load rose
                # mid-run was externally slowed — its pair reads too HIGH
                "load_4": [
                    s4.get("loadavg_start", [None])[0],
                    s4.get("loadavg_after_build", [None])[0],
                ],
                "load_16": [
                    s16.get("loadavg_start", [None])[0],
                    s16.get("loadavg_after_build", [None])[0],
                ],
                # pure-CPU axis (back-compat key) + the DRAM axis the
                # build's tokenize/merge stages actually live under
                "pair_ceiling": ceil["cpu"],
                "pair_membw_ceiling": ceil["membw"],
                "pair_membw_gbps": [
                    ceil["membw_4_gbps"], ceil["membw_16_gbps"],
                ],
                "load_at_start": round(load0, 2),
            }
        )
    # per-PAIR efficiency: adjacent 4c/16c runs share a time window, so
    # the ratio cancels tenancy drift that per-level medians (taken over
    # the whole session) confound; the pair ceiling qualifies each pair
    report["pairs"] = pairs
    report["pair_eff_build_median"] = statistics.median(
        p["pair_eff_build"] for p in pairs
    )
    # "best" window = highest on its WEAKER axis: a 0.98-CPU pair over a
    # saturated DRAM bus is not a clean pair (see pair_ceiling docstring)
    best = max(
        pairs,
        key=lambda p: min(p["pair_ceiling"], p["pair_membw_ceiling"]),
    )
    report["pair_eff_build_at_best_ceiling"] = {
        "eff": best["pair_eff_build"],
        "ceiling": best["pair_ceiling"],
        "membw_ceiling": best["pair_membw_ceiling"],
        "t4": best["t4_build"],
        "t16": best["t16_build"],
    }
    for cpus in (4, 16):
        samples = samples_by[cpus]
        med = lambda k: (  # noqa: E731
            statistics.median(s[k] for s in samples)
            if all(k in s for s in samples)
            else None
        )
        medq = lambda k: (  # noqa: E731
            statistics.median(s["queries"][k] for s in samples)
            if all(k in s["queries"] for s in samples)
            else None
        )
        report["levels"][str(cpus)] = {
            "index_build_sec_median": medq("index_build"),
            "index_build_docs_per_sec_median": med("index_build_docs_per_sec"),
            "categorise_136_bool_sec_median": medq("categorise_136_bool"),
            "categorise_136_scored_sec_median": medq(
                "categorise_136_scored_top100"
            ),
            "query_p50_sec_median": med("query_p50_sec"),
            "query_p95_sec_median": med("query_p95_sec"),
            "samples": samples,
        }
    t_n = report["levels"]["4"]["index_build_sec_median"]
    t_4n = report["levels"]["16"]["index_build_sec_median"]
    report["scaling_efficiency_index_build"] = round((t_n / t_4n) / 4.0, 3)
    tq_n = report["levels"]["4"]["categorise_136_scored_sec_median"]
    tq_4n = report["levels"]["16"]["categorise_136_scored_sec_median"]
    report["scaling_efficiency_query"] = (
        round((tq_n / tq_4n) / 4.0, 3) if tq_n and tq_4n else None
    )
    Path(REPO / ".scratch").mkdir(exist_ok=True)
    (REPO / ".scratch" / "scaling.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
