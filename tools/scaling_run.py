"""Scaling-evidence protocol runner (BASELINE.md): the same index-build +
query job on the SAME input at two parallelism levels (N=local[8] vs
4N=local[32]), shuffle partitions scaled 2x cores, median of R runs.

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
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report: dict = {"rows": rows, "runs": runs, "levels": {}}
    for cpus in (8, 32):
        samples = [run_once(cpus, rows, sf_dir) for _ in range(runs)]
        med = lambda k: statistics.median(s[k] for s in samples)  # noqa: E731
        report["levels"][str(cpus)] = {
            "index_build_sec_median": statistics.median(
                s["queries"]["index_build"] for s in samples
            ),
            "index_build_docs_per_sec_median": med("index_build_docs_per_sec"),
            "categorise_136_bool_sec_median": statistics.median(
                s["queries"]["categorise_136_bool"] for s in samples
            ),
            "categorise_136_scored_sec_median": statistics.median(
                s["queries"]["categorise_136_scored_top100"] for s in samples
            ),
            "query_p50_sec_median": med("query_p50_sec"),
            "query_p95_sec_median": med("query_p95_sec"),
            "samples": samples,
        }
    t8 = report["levels"]["8"]["index_build_sec_median"]
    t32 = report["levels"]["32"]["index_build_sec_median"]
    report["scaling_efficiency_index_build"] = round((t8 / t32) / 4.0, 3)
    tq8 = report["levels"]["8"]["categorise_136_scored_sec_median"]
    tq32 = report["levels"]["32"]["categorise_136_scored_sec_median"]
    report["scaling_efficiency_query"] = round((tq8 / tq32) / 4.0, 3)
    Path(REPO / ".scratch").mkdir(exist_ok=True)
    (REPO / ".scratch" / "scaling.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
