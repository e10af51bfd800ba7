"""sf1 single-run gate (VERDICT r4 #5): one full build + 136-query
categorise at 2.5M docs (10x the bench scale) on 32c — the memory-cliff
and file-count check the 100x story needs.

Wraps bench.py (BENCH_ROWS=2_500_000) in a subprocess, samples its
process-tree peak RSS once a second, and afterwards counts files/bytes of
the produced index tables.  Prints ONE JSON line for BENCH.md.

Usage: python tools/sf1_gate.py [rows] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def tree_rss_gb(pid: int) -> float:
    """Sum RSS over the process tree rooted at pid (GB)."""
    total = 0
    try:
        pids = [pid]
        seen = set()
        while pids:
            p = pids.pop()
            if p in seen:
                continue
            seen.add(p)
            try:
                with open(f"/proc/{p}/statm") as f:
                    total += int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
                with open(f"/proc/{p}/task/{p}/children") as f:
                    pids += [int(c) for c in f.read().split()]
            except (FileNotFoundError, ProcessLookupError):
                continue
    except Exception:
        pass
    return round(total / 1e9, 2)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    env = dict(os.environ)
    env.update(
        BENCH_ROWS=str(rows),
        SPARK_GRAFT_CPUS=cpus,
        PYTHONPATH=str(REPO),
    )
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    peak = {"rss": 0.0}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak["rss"] = max(peak["rss"], tree_rss_gb(proc.pid))
            time.sleep(1.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    out, _ = proc.communicate(timeout=7200)
    stop.set()
    th.join(timeout=2)
    bench = json.loads(out.strip().splitlines()[-1])

    idx = REPO / ".scratch" / f"bench_index_{cpus}_{rows}"
    tables = {}
    for t in ("staging", "postings", "docs", "docmap", "dictionary"):
        d = idx / t
        if not d.exists():
            continue
        files = [p for p in d.rglob("*") if p.is_file()]
        tables[t] = {
            "files": len(files),
            "gb": round(sum(p.stat().st_size for p in files) / 1e9, 3),
        }
    print(
        json.dumps(
            {
                "rows": rows,
                "cpus": int(cpus),
                "peak_tree_rss_gb": peak["rss"],
                "tables": tables,
                "bench": bench,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
