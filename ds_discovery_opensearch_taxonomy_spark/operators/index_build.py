"""Distributed inverted-index build (the "write path").

Spark re-plan of the reference's per-batch RAMDirectory indexing
(InMemoryCategoriserRepository.cs:461-502) as a persistent global index
(SURVEY.md §3.1):

  corpus ──mapInPandas tokenize (Arrow, memoized analyzers)──▶
  staging (field, term, doc_id, tf, dl, positions) partitioned by
  term-hash bucket ──per-bucket, resumable──▶ df/cf dictionary +
  salt-split sorted posting blocks (docID-gap varbyte + per-block
  max-score metadata) ──manifest commit──▶ global postings table.

Scale levers (north rule):
* ONE wide shuffle total (the staged write, keyed by term bucket); doc
  stats aggregate map-side-combines on (field, doc_id);
* skew: terms with df > ``salt_target_postings`` are salted by the TOP BITS
  of doc_id, so per-salt posting runs are contiguous, bounded, and globally
  mergeable by concatenation (no k-way merge at read time);
* blocks never cross an eval-band boundary (doc_id prefix), so query-time
  per-(category, band) grouping is exact;
* per-bucket manifest commits give kill/resume with lineage + metrics.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig
from ds_discovery_opensearch_taxonomy_spark.functions import analysis, codec, scoring
from ds_discovery_opensearch_taxonomy_spark.sources.catalog import IndexCatalog
from ds_discovery_opensearch_taxonomy_spark.sources.corpus import with_doc_ids

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    ]
)

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("blk_seq", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("min_docid", T.LongType(), False),
        T.StructField("max_docid", T.LongType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("idf", T.DoubleType(), False),
        T.StructField("max_score_ub", T.DoubleType(), False),
        T.StructField("docids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("poslens", T.BinaryType(), False),
        T.StructField("posdata", T.BinaryType(), False),
    ]
)


def tokenize_corpus(corpus: DataFrame, config: EngineConfig) -> DataFrame:
    """corpus (with doc_id) -> (field, term, doc_id, tf, dl, positions).

    Vectorized via mapInPandas (Arrow batches); token analysis is memoized
    per unique raw token (functions/analysis.py), so cost scales with
    vocabulary, not corpus size, inside a batch.  Output is already
    aggregated per (doc, term) — the map-side combine — so the only wide
    shuffle downstream is the term-bucket staging write."""
    specs = [(f.name, f.analyzer, list(f.source_columns)) for f in config.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_field, out_term, out_doc = [], [], []
            out_tf, out_dl, out_pos = [], [], []
            doc_ids = pdf["doc_id"].to_numpy()
            for fname, analyzer, cols in specs:
                col_arrays = [pdf[c].astype(str).to_numpy() for c in cols]
                for i in range(len(pdf)):
                    text = " ".join(a[i] for a in col_arrays)
                    toks = analysis.analyze(analyzer, text)
                    if not toks:
                        continue
                    per_term: dict[str, list[int]] = {}
                    for term, pos in toks:
                        per_term.setdefault(term, []).append(pos)
                    dl = len(toks)
                    did = int(doc_ids[i])
                    for term, poss in per_term.items():
                        out_field.append(fname)
                        out_term.append(term)
                        out_doc.append(did)
                        out_tf.append(len(poss))
                        out_dl.append(dl)
                        out_pos.append(poss)
            yield pd.DataFrame(
                {
                    "field": out_field,
                    "term": out_term,
                    "doc_id": out_doc,
                    "tf": out_tf,
                    "dl": out_dl,
                    "positions": out_pos,
                }
            )

    cols = {c for f in config.fields for c in f.source_columns}
    return corpus.select("doc_id", *sorted(cols)).mapInPandas(run, TOKENS_SCHEMA)


def _band_of(doc_ids: np.ndarray, band_bits: int) -> np.ndarray:
    """doc_id -> band, MONOTONE over signed doc_id order (top bit flipped so
    negative ids land in the low bands)."""
    if band_bits <= 0:
        return np.zeros(len(doc_ids), dtype=np.int64)
    u = doc_ids.astype(np.uint64) >> np.uint64(64 - band_bits)
    return (u ^ np.uint64(1 << (band_bits - 1))).astype(np.int64)


def make_block_builder(
    n_docs: float,
    avgdl: dict[str, float],
    k1: float,
    b: float,
    block_size: int,
    band_bits: int,
):
    """Returns the applyInPandas function building sorted varbyte blocks for
    one (field, term, salt) group."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fname = pdf["field"].iloc[0]
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        df_val = int(pdf["df"].iloc[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["dl"].to_numpy()[order].astype(np.int64)
        positions = pdf["positions"].to_numpy(dtype=object)[order]
        idf_val = float(scoring.idf(float(df_val), n_docs))
        av = avgdl[fname]
        bands = _band_of(doc_ids, band_bits)

        rows = []
        start = 0
        blk_seq = 0
        n = len(doc_ids)
        while start < n:
            end = min(start + block_size, n)
            # never cross an eval-band boundary
            first_band = bands[start]
            cut = np.searchsorted(bands[start:end], first_band, side="right")
            end = start + int(cut)
            ids = doc_ids[start:end]
            btf = tfs[start:end]
            bdl = dls[start:end]
            bpos = [np.asarray(p, dtype=np.int64) for p in positions[start:end]]
            poslens, posdata = codec.encode_positions(bpos)
            ub = float(
                np.max(idf_val * scoring.tf_norm(btf.astype(float), bdl.astype(float), av, k1, b))
            )
            rows.append(
                (
                    fname,
                    term,
                    salt,
                    int(first_band),
                    blk_seq,
                    int(end - start),
                    int(ids[0]),
                    int(ids[-1]),
                    df_val,
                    idf_val,
                    ub,
                    codec.encode_docids(ids, base=None),
                    codec.varbyte_encode(btf.astype(np.uint64)),
                    codec.varbyte_encode(bdl.astype(np.uint64)),
                    poslens,
                    posdata,
                )
            )
            blk_seq += 1
            start = end
        return pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    return build


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    config: EngineConfig | None = None,
    resume: bool = True,
) -> IndexCatalog:
    """Full index build with per-bucket checkpoint/resume."""
    config = config or EngineConfig()
    cat = IndexCatalog(out_dir)
    if not resume:
        import shutil

        shutil.rmtree(cat.root, ignore_errors=True)
        cat = IndexCatalog(out_dir)

    corpus_with_ids = with_doc_ids(corpus) if "doc_id" not in corpus.columns else corpus

    # -- stage 1: docs table (metadata + per-row sha256 invariant) ----------
    if not cat.stage_done("docs"):
        meta_cols = ["doc_id", "repo", "path", "commit", "lang", "content_sha"] + [
            f for f in config.int_fields if f in corpus_with_ids.columns
        ]
        docs = corpus_with_ids.select(*[c for c in meta_cols if c in corpus_with_ids.columns])
        cat.write(docs, IndexCatalog.DOCS)
        n_docs = spark.read.parquet(cat.path(IndexCatalog.DOCS)).count()
        cat.commit_stage("docs", {"n_docs": n_docs})

    n_docs = int(cat.manifest()["stages"]["docs"]["metrics"]["n_docs"])

    # -- stage 2: staged tokens, partitioned by term-hash bucket ------------
    if not cat.stage_done("staging"):
        tokens = tokenize_corpus(corpus_with_ids, config)
        staged = tokens.withColumn(
            "bucket", F.pmod(F.xxhash64("field", "term"), F.lit(config.n_term_buckets))
        )
        cat.write(staged, IndexCatalog.STAGING, partition_by=["bucket"])
        cat.commit_stage("staging", {"bytes": cat.table_bytes(IndexCatalog.STAGING)})

    # -- stage 3: per-field doc stats (N, avgdl) -----------------------------
    if not cat.stage_done("doc_stats"):
        staged = spark.read.parquet(cat.path(IndexCatalog.STAGING))
        stats = (
            staged.groupBy("field", "doc_id")
            .agg(F.first("dl").alias("dl"))
            .groupBy("field")
            .agg(
                F.count("*").alias("n_docs_with_field"),
                F.sum("dl").alias("sum_dl"),
            )
            .withColumn("n_docs", F.lit(n_docs))
            .withColumn("avgdl", F.col("sum_dl") / F.lit(n_docs))
        )
        cat.write(stats, IndexCatalog.DOC_STATS)
        cat.commit_stage("doc_stats")

    stats_rows = spark.read.parquet(cat.path(IndexCatalog.DOC_STATS)).collect()
    avgdl = {r["field"]: float(r["avgdl"]) for r in stats_rows}
    band_bits = max(config.n_eval_bands - 1, 0).bit_length()

    # -- stage 4: per-bucket postings build (resumable loop) ----------------
    builder = make_block_builder(
        float(n_docs), avgdl, config.k1, config.b, config.block_size, band_bits
    )
    done = cat.committed_buckets()
    for bucket in range(config.n_term_buckets):
        if bucket in done:
            continue
        staged_b = spark.read.parquet(cat.path(IndexCatalog.STAGING)).where(
            F.col("bucket") == bucket
        )
        dictionary = (
            staged_b.groupBy("field", "term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        )
        cat.write(dictionary, f"{IndexCatalog.DICTIONARY}/bucket={bucket}")
        # salt heavy terms by doc_id top bits — contiguous, signed-order-
        # monotone ranges (top bit flipped), so per-salt posting runs are
        # bounded AND globally mergeable by concatenation
        with_df = staged_b.join(dictionary.select("field", "term", "df"), ["field", "term"])
        max_bits = int(math.log2(config.max_salts))
        salted = with_df.withColumn(
            "salt_bits",
            F.least(
                F.greatest(
                    F.ceil(F.log2(F.col("df") / F.lit(config.salt_target_postings))).cast("int"),
                    F.lit(0),
                ),
                F.lit(max_bits),
            ),
        ).withColumn(
            "salt",
            F.expr(
                "cast(case when salt_bits <= 0 then 0 else "
                "shiftrightunsigned(doc_id, 64 - salt_bits) ^ shiftleft(1L, salt_bits - 1) "
                "end as int)"
            ),
        )
        blocks = salted.groupBy("field", "term", "salt").applyInPandas(
            builder, BLOCKS_SCHEMA
        )
        cat.write(blocks, IndexCatalog.POSTINGS, bucket=bucket)
        bdf = spark.read.parquet(cat.path(IndexCatalog.POSTINGS, bucket=bucket))
        agg = bdf.agg(
            F.count("*").alias("blocks"),
            F.sum("n").alias("postings"),
            F.countDistinct("field", "term").alias("terms"),
        ).collect()[0]
        cat.commit_bucket(
            bucket,
            {
                "blocks": int(agg["blocks"]),
                "postings": int(agg["postings"]),
                "terms": int(agg["terms"]),
                "bytes": cat.table_bytes(f"{IndexCatalog.POSTINGS}/bucket={bucket}"),
            },
        )
    cat.commit_stage("complete")
    return cat
