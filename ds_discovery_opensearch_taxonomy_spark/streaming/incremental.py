"""Daily-update pipeline: Structured-Streaming micro-batch categorisation.

Spark re-plan of the reference's queue-driven daily update (SURVEY.md §3.2:
SQS messages of ``;``-separated IAIDs → per-doc categorise → bulk upsert,
CategoriseDocAmazonSqsConsumer.cs:24-91, UpdateOpenSearchService.cs:111-262).
The reference has no event-time semantics (at-least-once queue consumption),
so the streaming mode needs only ``foreachBatch`` + idempotent merge —
no watermarks.

New/changed corpus rows stream in with the corpus schema; each micro-batch
is tokenized and scored against the broadcast compiled queries using the
GLOBAL index stats (df/avgdl snapshot), so incremental scores equal what a
full rebuild would produce, then merged into the results table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_discovery_opensearch_taxonomy_spark.engine import TaxonomyEngine, _GlobalStatsOracle
from ds_discovery_opensearch_taxonomy_spark.operators import search as search_ops
from ds_discovery_opensearch_taxonomy_spark.operators.oracle import build_oracle_doc
from ds_discovery_opensearch_taxonomy_spark.sources.corpus import with_doc_ids

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("category_ids", T.ArrayType(T.StringType()), False),
    ]
)


def categorise_batch(engine: TaxonomyEngine, batch_df: DataFrame) -> DataFrame:
    """Categorise one micro-batch of corpus rows; returns
    (doc_id, category_ids) incl. empty arrays (every input doc is emitted —
    reference seeds all batch IAIDs).

    Distributed doc-at-a-time evaluation: the compiled queries + GLOBAL
    index stats (df/avgdl/N snapshot) broadcast to executors, each Arrow
    batch evaluated in place — no collect/driver loop, so a micro-batch can
    be millions of rows.  Scores (when computed) equal the batch path's
    because the stats are the same snapshot."""
    pairs = engine._category_pairs()
    compiled, _virtual, df_map, _buckets, _tids = search_ops.compile_queries(
        engine.reader, pairs, engine.config
    )
    payload = engine.spark.sparkContext.broadcast(
        (
            compiled,
            df_map,
            dict(engine.reader.avgdl),
            float(engine.reader.n_docs),
            engine.config,
            [cid for cid, _ in pairs],
        )
    )

    def run(batches):
        compiled_q, dfm, avgdl, n_docs, config, cids = payload.value
        for pdf in batches:
            out_ids, out_cats = [], []
            recs = pdf.to_dict("records")
            for rec in recs:
                doc = build_oracle_doc(rec.get("doc_id"), rec, config)
                shim = _GlobalStatsOracle(doc, config, n_docs, avgdl, dfm)
                cats = sorted(
                    cid for cid in cids if shim.evaluate(compiled_q[cid], doc)[0]
                )
                out_ids.append(doc.doc_id)
                out_cats.append(cats)
            yield pd.DataFrame({"doc_id": out_ids, "category_ids": out_cats})

    return with_doc_ids(batch_df).mapInPandas(run, RESULT_SCHEMA)


def start_incremental(
    engine: TaxonomyEngine,
    stream_df: DataFrame,
    checkpoint_dir: str,
):
    """readStream(corpus rows) → foreachBatch(categorise + merge).

    ``stream_df`` is any streaming DataFrame with the corpus schema (files
    source, Kafka after parsing, etc.)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        per_doc = categorise_batch(engine, batch_df)
        engine.save_results(per_doc)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
