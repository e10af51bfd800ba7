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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_discovery_opensearch_taxonomy_spark.engine import TaxonomyEngine
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
    reference seeds all batch IAIDs)."""
    rows = [r.asDict() for r in with_doc_ids(batch_df).collect()]
    results = engine.categorise_docs(rows, scored=False)
    data = [
        (r["doc_id"], sorted(c["category_id"] for c in r["categories"]))
        for r in results
    ]
    return engine.spark.createDataFrame(data, RESULT_SCHEMA)


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
