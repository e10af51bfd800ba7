"""Streaming-update cost decomposition (round-3 verdict #3 receipt).

Times the three stages of one daily-update micro-batch against the 250k
bench index, repeated R times each:

* ``categorise``  — the vectorized in-memory categorise kernel alone
  (what bench.py's categorise_stream_50k row measures);
* ``save``        — + bucketed results upsert (engine.save_results);
* ``append``      — + live-index delta append (engine.append_docs).

Usage: python tools/stream_decompose.py [batch_rows] [reps]
Writes .scratch/stream_decompose.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    batch_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from ds_discovery_opensearch_taxonomy_spark.cli import make_spark
    from ds_discovery_opensearch_taxonomy_spark.engine import TaxonomyEngine
    from ds_discovery_opensearch_taxonomy_spark.sources.corpus import (
        synthesize_corpus,
        with_doc_ids,
    )
    from ds_discovery_opensearch_taxonomy_spark.streaming.incremental import (
        categorise_batch,
    )

    spark = make_spark("32", shuffle_partitions=32)
    idx = REPO / ".scratch" / "bench_index_32_250000"
    if not (idx / "manifest.json").exists():
        raise SystemExit("run bench.py at 32 cpus first (builds the index)")
    eng = TaxonomyEngine(spark, str(idx))
    out: dict[str, list[float]] = {"categorise": [], "save": [], "append": []}
    # fresh rows NOT in the index so appends are real inserts
    pool = with_doc_ids(synthesize_corpus(spark, 250_000 + reps * batch_rows))
    fresh = (
        pool.join(eng.reader.docs().select("doc_id"), "doc_id", "left_anti")
        .limit(reps * batch_rows)
        .persist()
    )
    fresh.count()
    for i in range(reps):
        batch = fresh.where(
            (F_row(fresh) % reps) == i
        ).persist()
        n = batch.count()
        t0 = time.time()
        per_doc = categorise_batch(eng, batch)
        per_doc = per_doc.persist()
        per_doc.count()
        t1 = time.time()
        eng.save_results(per_doc)
        t2 = time.time()
        eng.append_docs(batch, f"dec-{i}")
        t3 = time.time()
        out["categorise"].append(round(t1 - t0, 3))
        out["save"].append(round(t2 - t1, 3))
        out["append"].append(round(t3 - t2, 3))
        per_doc.unpersist()
        batch.unpersist()
        print(
            json.dumps(
                {"rep": i, "rows": n, "categorise": t1 - t0,
                 "save": t2 - t1, "append": t3 - t2}
            )
        )
    report = {
        "batch_rows": batch_rows,
        "reps": reps,
        "medians": {k: statistics.median(v) for k, v in out.items()},
        "samples": out,
    }
    (REPO / ".scratch" / "stream_decompose.json").write_text(
        json.dumps(report, indent=1)
    )
    print(json.dumps(report["medians"]))
    return 0


def F_row(df):
    from pyspark.sql import functions as F

    return F.abs(F.xxhash64("doc_id"))


if __name__ == "__main__":
    raise SystemExit(main())
