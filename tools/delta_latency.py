"""Query latency vs uncompacted-delta count (round-3 verdict #5 receipt).

Appends K tiny batches to a COPY of the 250k bench index and measures
warm single-query p50/p95 (the bench.py query set) at checkpoints, so the
auto-compaction threshold (config.compact_after_batches) is evidence-based.

Usage: python tools/delta_latency.py [checkpoints e.g. 0,10,50]
Writes .scratch/delta_latency.json.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERY_IDS = ["C10002", "C10011", "C10041", "C10090", "C10123", "C10113", "C10084"]


def main() -> int:
    checkpoints = sorted(
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "0,10,50").split(",")
    )
    from ds_discovery_opensearch_taxonomy_spark.cli import make_spark
    from ds_discovery_opensearch_taxonomy_spark.engine import TaxonomyEngine
    from ds_discovery_opensearch_taxonomy_spark.sources.corpus import (
        load_categories,
        synthesize_corpus,
        with_doc_ids,
    )

    src = REPO / ".scratch" / "bench_index_32_250000"
    idx = REPO / ".scratch" / "delta_lat_idx"
    if idx.exists():
        shutil.rmtree(idx)
    shutil.copytree(src, idx)
    spark = make_spark("32", shuffle_partitions=32)
    eng = TaxonomyEngine(spark, str(idx))
    cats = {c["category_id"]: c["query_text"] for c in load_categories()}
    pool = with_doc_ids(synthesize_corpus(spark, 260_000))
    fresh = (
        pool.join(eng.reader.docs().select("doc_id"), "doc_id", "left_anti")
        .limit(100 * max(checkpoints))
        .collect()
    )
    report = {"checkpoints": {}, "batch_rows": 100}
    done = 0
    for ck in checkpoints:
        for b in range(done, ck):
            rows = fresh[b * 100:(b + 1) * 100]
            eng.append_docs(spark.createDataFrame(rows), f"lat-{b}")
        done = ck
        # warm once, then time each query twice; report per-query medians
        lat = []
        for cid in QUERY_IDS:
            eng.search(cats[cid], limit=100).collect()
            for _ in range(2):
                t0 = time.time()
                eng.search(cats[cid], limit=100).collect()
                lat.append(time.time() - t0)
        lat.sort()
        report["checkpoints"][str(ck)] = {
            "deltas": len(eng.reader.cat.deltas()),
            "p50": round(statistics.median(lat), 3),
            "p95": round(lat[max(0, int(len(lat) * 0.95) - 1)], 3),
            "max": round(lat[-1], 3),
        }
        print(json.dumps({ck: report["checkpoints"][str(ck)]}))
    (REPO / ".scratch" / "delta_latency.json").write_text(
        json.dumps(report, indent=1)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
