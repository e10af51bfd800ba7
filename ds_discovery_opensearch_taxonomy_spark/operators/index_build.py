"""Distributed inverted-index build (the "write path").

Spark re-plan of the reference's per-batch RAMDirectory indexing
(InMemoryCategoriserRepository.cs:461-502) as a persistent global index
(SURVEY.md §3.1):

  corpus ──mapInPandas tokenize (Arrow, memoized analyzers)──▶
  staging (field, term, doc_id, tf, dl, pos_bytes) partitioned by
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
from pyspark.sql import DataFrame, Observation, SparkSession
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
        # per-posting positions, ALREADY delta+varbyte encoded (first value
        # absolute, so byte-runs concatenate across rows/blocks).  Binary
        # beats list<int32> ~2.5x on the partitioned staging write (parquet
        # repetition levels + dynamic-partition sort dominate otherwise).
        T.StructField("pos_bytes", T.BinaryType(), False),
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
        T.StructField("posdata", T.BinaryType(), False),
    ]
)


def tokenize_corpus(corpus: DataFrame, config: EngineConfig) -> DataFrame:
    """corpus (with doc_id) -> (field, term, doc_id, tf, dl, pos_bytes).

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
                    # one vectorized codec pass for the whole Arrow batch
                    "pos_bytes": codec.encode_position_lists(out_pos),
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


def _build_blocks_batch(
    pdf: pd.DataFrame,
    n_docs: float,
    avgdl: dict[str, float],
    k1: float,
    b: float,
    block_size: int,
    band_bits: int,
) -> pd.DataFrame:
    """Vectorized block construction for a batch of COMPLETE
    (field, term, salt) groups, already sorted by (field, term, salt,
    doc_id).  Every codec pass runs ONCE over the whole batch; per-block
    blobs are byte-slices of the batch-level varbyte streams (boundaries
    from per-value end offsets).  Cost: O(postings) numpy + O(blocks)
    python tuple assembly."""
    n = len(pdf)
    fld = pdf["field"].to_numpy()
    trm = pdf["term"].to_numpy()
    slt = pdf["salt"].to_numpy().astype(np.int64)
    doc_ids = pdf["doc_id"].to_numpy()
    tfs = pdf["tf"].to_numpy().astype(np.int64)
    dls = pdf["dl"].to_numpy().astype(np.int64)
    dfs = pdf["df"].to_numpy().astype(np.int64)
    pos_bytes = pdf["pos_bytes"].to_numpy(dtype=object)
    bands = _band_of(doc_ids, band_bits)

    idx = np.arange(n, dtype=np.int64)
    group_change = np.empty(n, dtype=bool)
    group_change[0] = True
    group_change[1:] = (
        (fld[1:] != fld[:-1]) | (trm[1:] != trm[:-1]) | (slt[1:] != slt[:-1])
    )
    gb_change = group_change.copy()
    gb_change[1:] |= bands[1:] != bands[:-1]
    anchor = np.maximum.accumulate(np.where(gb_change, idx, 0))
    is_start = gb_change | ((idx - anchor) % block_size == 0)
    starts = np.flatnonzero(is_start)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = n

    # blk_seq: block ordinal within its (field, term, salt) group
    g_id = np.cumsum(group_change) - 1
    block_group = g_id[starts]
    bidx = np.arange(len(starts), dtype=np.int64)
    first_blk = np.empty(len(starts), dtype=bool)
    first_blk[0] = True
    first_blk[1:] = block_group[1:] != block_group[:-1]
    blk_anchor = np.maximum.accumulate(np.where(first_blk, bidx, 0))
    blk_seq = bidx - blk_anchor

    # docids: gaps within a block, absolute (shifted) value at block start
    u = doc_ids.astype(np.uint64) + np.uint64(1 << 63)
    gaps = np.empty_like(u)
    gaps[0] = u[0]
    gaps[1:] = u[1:] - u[:-1]
    gaps[starts] = u[starts]
    doc_bytes, doc_ends = codec.varbyte_encode_offsets(gaps)
    tf_bytes, tf_ends = codec.varbyte_encode_offsets(tfs.astype(np.uint64))
    dl_bytes, dl_ends = codec.varbyte_encode_offsets(dls.astype(np.uint64))

    # positions arrive pre-encoded per posting (delta varbyte, absolute
    # first value) — block posdata is a byte-slice of the concatenation
    pos_blob = b"".join(pos_bytes)
    pos_lens = np.fromiter((len(b) for b in pos_bytes), dtype=np.int64, count=n)
    pos_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(pos_lens, out=pos_off[1:])

    av = np.array([avgdl[f] for f in fld], dtype=np.float64)
    idfs = scoring.idf(dfs.astype(np.float64), n_docs)
    scores = idfs * scoring.tf_norm(tfs.astype(float), dls.astype(float), av, k1, b)
    ubs = np.maximum.reduceat(scores, starts)

    de = np.concatenate([[0], doc_ends])
    te = np.concatenate([[0], tf_ends])
    le = np.concatenate([[0], dl_ends])
    rows = [
        (
            fld[s],
            trm[s],
            int(slt[s]),
            int(bands[s]),
            int(blk_seq[bi]),
            int(e - s),
            int(doc_ids[s]),
            int(doc_ids[e - 1]),
            int(dfs[s]),
            float(idfs[s]),
            float(ubs[bi]),
            doc_bytes[de[s]:de[e]],
            tf_bytes[te[s]:te[e]],
            dl_bytes[le[s]:le[e]],
            pos_blob[pos_off[s]:pos_off[e]],
        )
        for bi, (s, e) in enumerate(zip(starts, ends))
    ]
    return pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])


def make_block_builder(
    n_docs: float,
    avgdl: dict[str, float],
    k1: float,
    b: float,
    block_size: int,
    band_bits: int,
):
    """Returns a mapInPandas function that streams sorted (field, term,
    salt, doc_id) rows and emits posting blocks.  Groups split across Arrow
    batches are carried to the next batch, so each group is built whole;
    per-batch work is vectorized (no per-group UDF dispatch — this replaced
    an applyInPandas that spent ~2.5 ms/group on Arrow plumbing alone)."""

    def run(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            fld = pdf["field"].to_numpy()
            trm = pdf["term"].to_numpy()
            slt = pdf["salt"].to_numpy()
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (
                (fld[1:] != fld[:-1]) | (trm[1:] != trm[:-1]) | (slt[1:] != slt[:-1])
            )
            last_start = int(np.flatnonzero(change)[-1])
            if last_start == 0:
                carry = pdf  # single (possibly continuing) group — hold it
                continue
            carry = pdf.iloc[last_start:]
            done = pdf.iloc[:last_start]
            yield _build_blocks_batch(done, n_docs, avgdl, k1, b, block_size, band_bits)
        if carry is not None and len(carry):
            yield _build_blocks_batch(carry, n_docs, avgdl, k1, b, block_size, band_bits)

    return run


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
        docs_obs = Observation("docs")
        cat.write(docs.observe(docs_obs, F.count(F.lit(1)).alias("n")), IndexCatalog.DOCS)
        cat.commit_stage("docs", {"n_docs": int(docs_obs.get["n"])})

    n_docs = int(cat.manifest()["stages"]["docs"]["metrics"]["n_docs"])

    # -- stage 2: staged tokens, partitioned by term-hash bucket ------------
    # per-field sum(tf) rides the write as conditional-sum observations:
    # sum(tf) over staged rows of a field == sum of per-doc field lengths
    # (each doc-field's tfs sum to its token count), so avgdl needs no
    # second pass over staging at all.
    field_names = [f.name for f in config.fields]
    if not cat.stage_done("staging"):
        tokens = tokenize_corpus(corpus_with_ids, config)
        staged = tokens.withColumn(
            "bucket", F.pmod(F.xxhash64("field", "term"), F.lit(config.n_term_buckets))
        )
        stg_obs = Observation("staging")
        staged = staged.observe(
            stg_obs,
            *[
                F.sum(F.when(F.col("field") == fn, F.col("tf")).otherwise(0)).alias(fn)
                for fn in field_names
            ],
        )
        cat.write(staged, IndexCatalog.STAGING, partition_by=["bucket"])
        sum_dl = {fn: int(stg_obs.get[fn] or 0) for fn in field_names}
        cat.commit_stage(
            "staging",
            {"bytes": cat.table_bytes(IndexCatalog.STAGING), "sum_dl": sum_dl},
        )

    # -- stage 3: per-field doc stats (N, avgdl) — tiny driver-built table --
    if not cat.stage_done("doc_stats"):
        sum_dl = cat.manifest()["stages"]["staging"]["metrics"].get("sum_dl")
        if sum_dl is None:  # resumed from an older staging commit
            staged = spark.read.parquet(cat.path(IndexCatalog.STAGING))
            sum_dl = {
                r["field"]: int(r["s"])
                for r in staged.groupBy("field").agg(F.sum("tf").alias("s")).collect()
            }
        stats = spark.createDataFrame(
            [
                (fn, int(sum_dl.get(fn, 0)), n_docs, sum_dl.get(fn, 0) / n_docs if n_docs else 1.0)
                for fn in field_names
            ],
            "field string, sum_dl long, n_docs long, avgdl double",
        ).coalesce(1)
        cat.write(stats, IndexCatalog.DOC_STATS)
        cat.commit_stage("doc_stats")

    stats_rows = spark.read.parquet(cat.path(IndexCatalog.DOC_STATS)).collect()
    avgdl = {r["field"]: float(r["avgdl"]) for r in stats_rows}
    band_bits = max(config.n_eval_bands - 1, 0).bit_length()

    # -- stage 4: per-bucket dictionary + postings build (resumable loop) ---
    # one Spark job chain per bucket; the bucket's df/cf dictionary is
    # aggregated from its own staging slice and committed atomically with
    # its postings (the global dictionary is the union of bucket partitions);
    # metrics come from Observation (no read-back pass)
    builder = make_block_builder(
        float(n_docs), avgdl, config.k1, config.b, config.block_size, band_bits
    )
    done = cat.committed_buckets()
    todo = [b for b in range(config.n_term_buckets) if b not in done]
    if todo:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        staged_all = spark.read.parquet(cat.path(IndexCatalog.STAGING))
        max_bits = int(math.log2(config.max_salts))
        manifest_lock = threading.Lock()

        def do_bucket(bucket: int) -> None:
            staged_b = staged_all.where(F.col("bucket") == bucket)
            dict_df = staged_b.groupBy("field", "term").agg(
                F.count("*").alias("df"), F.sum("tf").alias("cf")
            )
            dict_obs = Observation(f"dict_{bucket}")
            cat.write(
                dict_df.observe(dict_obs, F.count(F.lit(1)).alias("terms")),
                IndexCatalog.DICTIONARY,
                bucket=bucket,
            )
            n_terms = int(dict_obs.get["terms"])
            dict_b = spark.read.parquet(
                cat.path(IndexCatalog.DICTIONARY, bucket=bucket)
            ).select("field", "term", "df")
            # salt heavy terms by doc_id top bits — contiguous, signed-order-
            # monotone ranges (top bit flipped), so per-salt posting runs are
            # bounded AND globally mergeable by concatenation
            salted = (
                staged_b.join(dict_b, ["field", "term"])
                .withColumn(
                    "salt_bits",
                    F.least(
                        F.greatest(
                            F.ceil(
                                F.log2(F.col("df") / F.lit(config.salt_target_postings))
                            ).cast("int"),
                            F.lit(0),
                        ),
                        F.lit(max_bits),
                    ),
                )
                .withColumn(
                    "salt",
                    F.expr(
                        "cast(case when salt_bits <= 0 then 0 else "
                        "shiftrightunsigned(doc_id, 64 - salt_bits) ^ shiftleft(1L, salt_bits - 1) "
                        "end as int)"
                    ),
                )
            )
            n_parts = max(spark.sparkContext.defaultParallelism, 8)
            blocks = (
                salted.repartition(n_parts, "field", "term", "salt")
                .sortWithinPartitions("field", "term", "salt", "doc_id")
                .mapInPandas(builder, BLOCKS_SCHEMA)
            )
            obs = Observation(f"bucket_{bucket}")
            blocks = blocks.observe(
                obs, F.count(F.lit(1)).alias("blocks"), F.sum("n").alias("postings")
            )
            cat.write(blocks, IndexCatalog.POSTINGS, bucket=bucket)
            m = obs.get
            with manifest_lock:
                cat.commit_bucket(
                    bucket,
                    {
                        "blocks": int(m["blocks"]),
                        "postings": int(m["postings"]),
                        "terms": int(n_terms),
                        "bytes": cat.table_bytes(
                            f"{IndexCatalog.POSTINGS}/bucket={bucket}"
                        ),
                    },
                )

        # concurrent bucket jobs (the reference runs 5 categorisation
        # batches concurrently, FullReindexCategoriser.cs:87-213) — Spark's
        # scheduler interleaves them, hiding each job's serial phases;
        # commits stay per-bucket, so kill/resume granularity is unchanged
        workers = min(config.build_parallelism, len(todo))
        if workers <= 1:
            for bkt in todo:
                do_bucket(bkt)
        else:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                futures = [ex.submit(do_bucket, bkt) for bkt in todo]
                for f in futures:
                    f.result()
    cat.commit_stage("complete")
    return cat
