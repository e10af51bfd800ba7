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
from ds_discovery_opensearch_taxonomy_spark.sources.corpus import with_doc_ids

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("category_ids", T.ArrayType(T.StringType()), False),
    ]
)


#: reference IAID format (TaxonomyCLI/Categoriser.cs:28): C/D + 2-8 digits,
#: or a 32-char hex-ish identifier
IAID_PATTERN = r"^(C\d{2,8}|D\d{2,8}|\w{32})$"


def parse_iaid_messages(messages: DataFrame, column: str = "body") -> DataFrame:
    """Queue messages → one validated IAID per row.

    Mirrors the reference's SQS consumption contract: each message body is a
    ``;``-separated IAID list (Batch/Utils/MessageQueueExtensions.cs; README
    "semicolon-separated"), and malformed IAIDs are rejected before
    categorisation (TaxonomyCLI/Categoriser.cs:28 regex).  All JVM-side:
    ``split`` + ``explode`` + ``rlike`` — usable on static and streaming
    DataFrames alike.  Returns a single-column ``iaid`` DataFrame."""
    return (
        messages.select(
            F.explode(F.split(F.col(column), ";")).alias("iaid")
        )
        .select(F.trim("iaid").alias("iaid"))
        .where(F.col("iaid").rlike(IAID_PATTERN))
    )


def _batch_payload(engine: TaxonomyEngine):
    """Broadcast of (compiled queries, stats, config) — created ONCE per
    engine and reused by every micro-batch (a fresh broadcast per batch
    accumulates driver/executor state over a long-running stream)."""
    if getattr(engine, "_stream_payload", None) is None:
        pairs = engine._category_pairs()
        compiled, _virtual, df_map, _buckets, _tids = search_ops.compile_queries(
            engine.reader, pairs, engine.config
        )
        engine._stream_payload = engine.spark.sparkContext.broadcast(
            (
                compiled,
                df_map,
                dict(engine.reader.avgdl),
                float(engine.reader.n_docs),
                engine.config,
                [cid for cid, _ in pairs],
            )
        )
    return engine._stream_payload


def categorise_batch(engine: TaxonomyEngine, batch_df: DataFrame) -> DataFrame:
    """Categorise one micro-batch of corpus rows; returns
    (doc_id, category_ids) incl. empty arrays (every input doc is emitted —
    reference seeds all batch IAIDs).

    Distributed evaluation: compiled queries + GLOBAL index stats
    (df/avgdl/N snapshot) broadcast once per engine; each Arrow batch is
    tokenized with the vectorized unique-span tokenizer (the same kernel as
    the index build — cost scales with vocabulary, not rows), then matched
    doc-at-a-time (mirrors the reference's per-IAID daily update,
    CategoriseDocAmazonSqsConsumer.cs:24-91).  Scores (when computed) equal
    the batch path's because the stats are the same snapshot."""
    payload = _batch_payload(engine)

    def run(batches):
        from ds_discovery_opensearch_taxonomy_spark.functions.vtokenize import (
            ChunkTokenizer,
        )
        from ds_discovery_opensearch_taxonomy_spark.operators.oracle import OracleDoc

        compiled_q, dfm, avgdl, n_docs, config, cids = payload.value
        specs = [
            (f.name, f.analyzer, list(f.source_columns)) for f in config.fields
        ]
        tok = ChunkTokenizer(specs)
        src_cols = sorted({c for f in config.fields for c in f.source_columns})
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            import numpy as np

            columns = {c: pdf[c].tolist() for c in src_cols}
            doc_idx = np.arange(n, dtype=np.int64)
            results = tok.tokenize(columns, doc_idx)
            # per-doc field -> term -> positions, reconstructed from the
            # vectorized postings (bounded by batch postings, not regex work)
            fields: list[dict] = [
                {f.name: {} for f in config.fields} for _ in range(n)
            ]
            dls: list[dict] = [{f.name: 0 for f in config.fields} for _ in range(n)]
            for r in results:
                fname = config.fields[r["ford"]].name
                cache = tok.caches[r["ford"]]
                bounds = r["pos_bounds"]
                pos_all = _decode_all_positions(r)
                for j in range(len(r["term_id"])):
                    d = int(r["doc_id"][j])
                    term = cache.tid_term[int(r["term_id"][j])]
                    fields[d][fname][term] = pos_all[j]
                    dls[d][fname] = int(r["dl"][j])
            doc_ids = pdf["doc_id"].tolist() if "doc_id" in pdf else list(range(n))
            int_cols = {
                f: pdf[f].tolist() for f in config.int_fields if f in pdf
            }
            out_ids, out_cats = [], []
            for i in range(n):
                ints = {
                    f: int(v[i]) for f, v in int_cols.items() if v[i] is not None
                }
                doc = OracleDoc(doc_ids[i], str(doc_ids[i]), fields[i], dls[i], ints)
                shim = _GlobalStatsOracle(doc, config, n_docs, avgdl, dfm)
                cats = sorted(
                    cid for cid in cids if shim.evaluate(compiled_q[cid], doc)[0]
                )
                out_ids.append(doc.doc_id)
                out_cats.append(cats)
            yield pd.DataFrame({"doc_id": out_ids, "category_ids": out_cats})

    return with_doc_ids(batch_df).mapInPandas(run, RESULT_SCHEMA)


def _decode_all_positions(r: dict) -> list:
    """Per-posting position lists from one vectorized-tokenizer result."""
    import numpy as np

    from ds_discovery_opensearch_taxonomy_spark.functions import codec

    deltas = codec.varbyte_decode(r["pos_data"]).astype(np.int64)
    tfs = r["tf"].astype(np.int64)
    offs = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=offs[1:])
    flat = np.cumsum(deltas)
    starts = offs[:-1]
    seg_start_vals = flat[starts] - deltas[starts]
    corrections = np.zeros(len(deltas), dtype=np.int64)
    corrections[starts] = np.diff(np.concatenate([[0], seg_start_vals]))
    flat -= np.cumsum(corrections)
    return [flat[offs[j] : offs[j + 1]].tolist() for j in range(len(tfs))]


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
