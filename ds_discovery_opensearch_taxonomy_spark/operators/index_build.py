"""Distributed inverted-index build (the "write path").

Spark re-plan of the reference's per-batch RAMDirectory indexing
(InMemoryCategoriserRepository.cs:461-502) as a persistent global index
(SURVEY.md §3.1):

  corpus ──narrow per-partition count──▶ dense ord layout (manifest) ──▶
  docs table (ord + metadata) + per-band DOCMAP (packed ord→doc_id) ──▶
  mapInArrow tokenize (Arrow, memoized analyzers) ──▶ staging
  (term_id, term?, ford, ord, tf, dl, pos_bytes) partitioned by term-hash
  bucket ──▶ df/cf dictionary (one codegen'd agg) ──▶ one-job mapInArrow
  block build: salt-split sorted posting blocks (ord-gap varbyte +
  per-block max-score metadata) ──manifest commit──▶ global postings.

Scale levers (north rule):
* ONE wide shuffle total (the staged write, keyed by term bucket);
* posting lists key on DENSE ords, so gaps varbyte to 1-2 bytes (vs 8-9
  for hashed 64-bit ids) — the external doc_id is recovered per eval band
  from DOCMAP (Lucene segment-docID + stored-field key, distributed);
* skew: terms with df > ``salt_target_postings`` are salted by the TOP
  BITS of ord, so per-salt posting runs are contiguous, bounded, and
  globally mergeable by concatenation (no k-way merge at read time);
* blocks never cross an eval-band boundary (ord prefix), so query-time
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

#: Staged postings are NUMERIC per row — measured on this box the per-token
#: string objects (field/term per posting) made the whole stage memory-
#: bandwidth-bound: 8 and 32 cores ran it in the same wall time.  The term
#: STRING is emitted only on its first occurrence per chunk (mostly-null
#: column, RLE'd to ~vocabulary size); ``term_id`` is a memoized 64-bit
#: blake2b of (field, term) computed in the tokenizer, and ``ford`` is the
#: field's ordinal in config.fields.  The dictionary stage recovers the
#: strings with max() aggs (declarative -> whole-stage codegen).
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("term", T.StringType(), True),
        T.StructField("ford", T.IntegerType(), False),
        # dense doc ORDINAL in [0, n_docs) — NOT the 64-bit external doc_id.
        # Posting lists gap-encode ords: dense keys make gaps ~n_docs/df
        # (1-2 varbyte bytes) instead of ~2^64/df for hashed ids (8-9 bytes)
        # — the docids stream was ~60% of index bytes before this.  The
        # external doc_id is recovered per eval band via the DOCMAP table
        # (Lucene's segment-local docID + stored-field key, distributed).
        T.StructField("ord", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        # per-posting positions, ALREADY delta+varbyte encoded (first value
        # absolute, so byte-runs concatenate across rows/blocks).  Binary
        # beats list<int32> ~2.5x on the partitioned staging write (parquet
        # repetition levels + dynamic-partition sort dominate otherwise).
        T.StructField("pos_bytes", T.BinaryType(), False),
    ]
)


# re-exported for compatibility; lives with the vectorized tokenizer now
from ds_discovery_opensearch_taxonomy_spark.functions.vtokenize import (  # noqa: E402
    term_id_of,
)

#: bump when the on-disk table layout changes incompatibly (3 = dense-ord
#: postings + DOCMAP with dl sidecars); build_index refuses to resume across versions
INDEX_FORMAT_VERSION = 3

#: posting blocks are keyed by the numeric ``term_id`` (see term_id_of) — the
#: heavy build/query paths stay ALL-NUMERIC (term strings live only in the
#: dictionary table, which wildcard/range scans read).  String columns in
#: Arrow/pandas hops cost ~1-2 µs/value and saturate memory bandwidth at
#: tens of millions of postings; numeric keys also shrink the postings
#: table and push down as long filters.  64-bit id collision risk is
#: ~n²/2⁶⁵ over the vocabulary (not the corpus) — swap to a 128-bit pair
#: at >10⁸ distinct terms.
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("blk_seq", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        # min/max of the block's dense ords (the posting id space); the
        # names keep the Lucene skip-entry vocabulary
        T.StructField("min_docid", T.LongType(), False),
        T.StructField("max_docid", T.LongType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("idf", T.DoubleType(), False),
        T.StructField("max_score_ub", T.DoubleType(), False),
        T.StructField("docids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        # NO per-posting dls stream: document lengths live in the per-band
        # DOCMAP sidecar (one int32 per doc-field, not one varbyte per
        # POSTING) - the Lucene norms-file analogue, distributed
        T.StructField("posdata", T.BinaryType(), False),
    ]
)


def ord_bits_of(n_docs: int) -> int:
    """Bit width of the dense ordinal space (>=1 so shifts stay valid)."""
    return max(int(max(n_docs, 1) - 1).bit_length(), 1)


def ord_shift_of(n_docs: int, band_bits: int) -> int:
    """Right-shift taking an ord to its eval band: band = ord >> shift.
    Bands are CONTIGUOUS ord ranges, so each band's ord -> doc_id
    translation is one packed array slice (see DOCMAP)."""
    return max(ord_bits_of(n_docs) - band_bits, 0)


def partition_offsets(corpus: DataFrame) -> tuple[list[int], int]:
    """Per-input-partition starting ordinals: ord = offsets[pid] + row
    index within the partition.

    ONE narrow job (zero-column scan + map-side count); no shuffle of the
    corpus and no driver-side rows beyond one int per partition.  Both the
    docs pass and the tokenize pass attach ords from these offsets — file
    scans plan partitions from the file listing + size config only, so two
    scans of the same immutable input see identical (partition -> rows)
    maps (the zipWithIndex determinism contract, without the RDD hop)."""
    counts = {
        int(r["pid"]): int(r["n"])
        for r in corpus.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_parts = (max(counts) + 1) if counts else 0
    offsets, acc = [], 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    return offsets, acc


def attach_ords(df: DataFrame, offsets: list[int]) -> DataFrame:
    """Append the dense ``ord`` column from partition offsets (no shuffle)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("ord", T.LongType(), False)]
    )

    def run(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        nxt = offsets[TaskContext.get().partitionId()]
        for rb in batches:
            ords = pa.array(
                np.arange(nxt, nxt + rb.num_rows, dtype=np.int64), pa.int64()
            )
            nxt += rb.num_rows
            yield rb.append_column("ord", ords)

    return df.mapInArrow(run, out_schema)


def tokenize_corpus(
    corpus: DataFrame, config: EngineConfig, offsets: list[int]
) -> DataFrame:
    """corpus -> TOKENS_SCHEMA rows (numeric postings; term strings shipped
    once per chunk for the dictionary).  Postings are keyed by the dense
    ``ord`` assigned from ``offsets`` (see partition_offsets) — the 64-bit
    doc_id never enters the postings path.

    Vectorized via mapInArrow + the unique-span tokenizer
    (functions/vtokenize.py): the analyzer chain runs once per *unique*
    span (process-lifetime cache), posting aggregation is NumPy
    lexsort/reduce, and the output batch's binary column is built zero-copy
    — no per-row or per-posting Python anywhere (input_hint mandate).
    Output is already aggregated per (doc, term) — the map-side combine —
    so the only wide shuffle downstream is the term-bucket staging write."""
    from ds_discovery_opensearch_taxonomy_spark.functions.vtokenize import (
        ChunkTokenizer,
    )

    specs = [(f.name, f.analyzer, list(f.source_columns)) for f in config.fields]
    src_cols = sorted({c for f in config.fields for c in f.source_columns})
    chunk = 2048  # docs per emitted batch — bounds per-worker memory

    def run(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        tok = ChunkTokenizer(specs)
        schema = pa.schema(
            [
                ("term_id", pa.int64()),
                ("term", pa.string()),
                ("ford", pa.int32()),
                ("ord", pa.int64()),
                ("tf", pa.int32()),
                ("dl", pa.int32()),
                ("pos_bytes", pa.binary()),
            ]
        )
        next_ord = offsets[TaskContext.get().partitionId()]
        for rb in batches:
            names = rb.schema.names
            for lo in range(0, rb.num_rows, chunk):
                sub = rb.slice(lo, chunk)
                doc_ids = np.arange(
                    next_ord, next_ord + sub.num_rows, dtype=np.int64
                )
                next_ord += sub.num_rows
                columns = {
                    c: sub.column(names.index(c)).to_pylist() for c in src_cols
                }
                results = tok.tokenize(columns, doc_ids)
                if not results:
                    continue
                term_col = tok.term_strings(results)
                tid = np.concatenate([r["term_id"] for r in results])
                ford = np.concatenate(
                    [
                        np.full(len(r["term_id"]), r["ford"], dtype=np.int32)
                        for r in results
                    ]
                )
                doc = np.concatenate([r["doc_id"] for r in results])
                tf = np.concatenate([r["tf"] for r in results])
                dl = np.concatenate([r["dl"] for r in results])
                # per-field position streams tile into one chunk stream
                pos_data = b"".join(r["pos_data"] for r in results)
                shifts, off = [], 0
                for r in results:
                    shifts.append(r["pos_bounds"][:-1] + off)
                    off += len(r["pos_data"])
                bounds = np.append(np.concatenate(shifts), off)
                if bounds[-1] >= 2**31:  # int32 Arrow offsets guard
                    raise ValueError(
                        "chunk position stream exceeds 2 GiB; lower chunk size"
                    )
                pos_col = pa.Array.from_buffers(
                    pa.binary(),
                    len(bounds) - 1,
                    [
                        None,
                        pa.py_buffer(bounds.astype(np.int32).tobytes()),
                        pa.py_buffer(pos_data),
                    ],
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(tid, pa.int64()),
                        pa.array(term_col, pa.string()),
                        pa.array(ford, pa.int32()),
                        pa.array(doc, pa.int64()),
                        pa.array(tf, pa.int32()),
                        pa.array(dl, pa.int32()),
                        pos_col,
                    ],
                    schema=schema,
                )

    return corpus.select(*src_cols).mapInArrow(run, TOKENS_SCHEMA)


def _band_of(ords: np.ndarray, ord_shift: int) -> np.ndarray:
    """ord -> eval band (top bits of the dense ordinal: bands are
    contiguous, near-equal ord ranges)."""
    return (ords.astype(np.int64) >> np.int64(ord_shift)).astype(np.int64)


def _extract_columns(rb) -> dict:
    """pa.RecordBatch -> dict of numpy columns; pos_bytes stays ONE
    contiguous byte stream + an int64 offsets array (zero per-row python
    objects — sliced straight out of the Arrow binary buffers)."""
    idx = {f: i for i, f in enumerate(rb.schema.names)}
    out = {
        name: rb.column(idx[name]).to_numpy(zero_copy_only=False)
        for name in ("term_id", "ord", "tf", "dl", "df", "salt", "ford")
    }
    arr = rb.column(idx["pos_bytes"])
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = memoryview(bufs[2])[int(off[0]) : int(off[-1])] if len(off) else b""
    out["pos_off"] = off - (off[0] if len(off) else 0)
    out["pos_data"] = bytes(data)
    return out


def _concat_columns(a: dict, b: dict) -> dict:
    out = {k: np.concatenate([a[k], b[k]]) for k in a if k not in ("pos_off", "pos_data")}
    out["pos_data"] = a["pos_data"] + b["pos_data"]
    out["pos_off"] = np.concatenate([a["pos_off"][:-1], b["pos_off"] + len(a["pos_data"])])
    return out


def _slice_columns(c: dict, lo: int, hi: int) -> dict:
    out = {k: c[k][lo:hi] for k in c if k not in ("pos_off", "pos_data")}
    po = c["pos_off"]
    out["pos_data"] = c["pos_data"][int(po[lo]) : int(po[hi])]
    out["pos_off"] = po[lo : hi + 1] - po[lo]
    return out


def _arrow_blocks_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("term_id", pa.int64()),
            ("salt", pa.int32()),
            ("band", pa.int32()),
            ("blk_seq", pa.int32()),
            ("n", pa.int32()),
            ("min_docid", pa.int64()),
            ("max_docid", pa.int64()),
            ("df", pa.int64()),
            ("idf", pa.float64()),
            ("max_score_ub", pa.float64()),
            ("docids", pa.binary()),
            ("tfs", pa.binary()),
            ("posdata", pa.binary()),
        ]
    )


def _binary_from_stream(stream: bytes, boundaries: np.ndarray):
    """Blocks tile the stream consecutively, so the output BinaryArray is
    just (int32 offsets, the stream itself) — no per-block slicing."""
    import pyarrow as pa

    if len(boundaries) and int(boundaries[-1]) >= 2**31:
        # int32 Arrow offsets would silently wrap -> corrupt postings table
        raise ValueError(
            f"builder batch stream is {int(boundaries[-1])} bytes (>= 2 GiB); "
            "lower the Arrow batch size (spark.sql.execution.arrow."
            "maxRecordsPerBatch) or raise n_term_buckets"
        )
    return pa.Array.from_buffers(
        pa.binary(),
        len(boundaries) - 1,
        [None, pa.py_buffer(boundaries.astype(np.int32).tobytes()), pa.py_buffer(stream)],
    )


def _build_blocks_batch(
    c: dict,
    n_docs: float,
    avgdl: np.ndarray,
    k1: float,
    b: float,
    block_size: int,
    ord_shift: int,
):
    """Fully-vectorized block construction for a batch of COMPLETE
    (term_id, salt) groups, already sorted by (term_id, salt, ord).
    Every codec pass runs ONCE over the whole batch; the four output
    binary columns are offset arrays over the batch-level varbyte streams
    (consecutive blocks tile each stream) — zero per-block python."""
    import pyarrow as pa

    n = len(c["term_id"])
    tid = c["term_id"].astype(np.int64)
    slt = c["salt"].astype(np.int64)
    doc_ids = c["ord"].astype(np.int64)  # dense ords (block id space)
    tfs = c["tf"].astype(np.int64)
    dls = c["dl"].astype(np.int64)
    dfs = c["df"].astype(np.int64)
    ford = c["ford"].astype(np.int64)
    bands = _band_of(doc_ids, ord_shift)

    idx = np.arange(n, dtype=np.int64)
    group_change = np.empty(n, dtype=bool)
    group_change[0] = True
    group_change[1:] = (tid[1:] != tid[:-1]) | (slt[1:] != slt[:-1])
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

    # positions arrive pre-encoded per posting (delta varbyte, absolute
    # first value) as ONE stream + offsets — block posdata boundaries are
    # just offset lookups
    pos_off = c["pos_off"]
    pos_data = c["pos_data"]

    av = avgdl[ford]
    idfs = scoring.idf(dfs.astype(np.float64), n_docs)
    scores = idfs * scoring.tf_norm(tfs.astype(float), dls.astype(float), av, k1, b)
    ubs = np.maximum.reduceat(scores, starts)

    de = np.concatenate([[0], doc_ends])
    te = np.concatenate([[0], tf_ends])
    bounds = np.append(starts, n)
    arrays = [
        pa.array(tid[starts], pa.int64()),
        pa.array(slt[starts].astype(np.int32), pa.int32()),
        pa.array(bands[starts].astype(np.int32), pa.int32()),
        pa.array(blk_seq.astype(np.int32), pa.int32()),
        pa.array((ends - starts).astype(np.int32), pa.int32()),
        pa.array(doc_ids[starts], pa.int64()),
        pa.array(doc_ids[ends - 1], pa.int64()),
        pa.array(dfs[starts], pa.int64()),
        pa.array(idfs[starts], pa.float64()),
        pa.array(ubs, pa.float64()),
        _binary_from_stream(doc_bytes, de[bounds]),
        _binary_from_stream(tf_bytes, te[bounds]),
        _binary_from_stream(pos_data, pos_off[bounds]),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=_arrow_blocks_schema())


def make_block_builder(
    n_docs: float,
    avgdl: np.ndarray,
    k1: float,
    b: float,
    block_size: int,
    ord_shift: int,
):
    """Returns a mapInArrow function that streams sorted (term_id, salt,
    ord) rows and emits posting blocks.  ``avgdl`` is indexed by field
    ordinal (the ``ford`` column).  Groups split across Arrow batches are
    carried to the next batch, so each group is built whole; per-batch
    work is pure numpy + Arrow buffer construction (no pandas hop, no
    per-row or per-block python objects)."""

    def run(batches):
        carry: dict | None = None
        for rb in batches:
            if len(rb) == 0:
                continue
            cols = _extract_columns(rb)
            if carry is not None:
                cols = _concat_columns(carry, cols)
                carry = None
            tid = cols["term_id"]
            slt = cols["salt"]
            change = np.empty(len(tid), dtype=bool)
            change[0] = True
            change[1:] = (tid[1:] != tid[:-1]) | (slt[1:] != slt[:-1])
            last_start = int(np.flatnonzero(change)[-1])
            if last_start == 0:
                carry = cols  # single (possibly continuing) group — hold it
                continue
            carry = _slice_columns(cols, last_start, len(tid))
            done = _slice_columns(cols, 0, last_start)
            yield _build_blocks_batch(done, n_docs, avgdl, k1, b, block_size, ord_shift)
        if carry is not None and len(carry["term_id"]):
            yield _build_blocks_batch(carry, n_docs, avgdl, k1, b, block_size, ord_shift)

    return run


def _salt_postings(
    staged: DataFrame, dict_df: DataFrame, config: EngineConfig, ord_bits: int
) -> DataFrame:
    """Join staged postings with per-term (df, ford) and compute the
    ord-top-bits salt for heavy terms: per-salt posting runs are contiguous
    ord ranges, bounded, and globally mergeable by concatenation."""
    max_bits = int(math.log2(config.max_salts))
    if config.broadcast_dictionary:
        dict_df = F.broadcast(dict_df)
    return (
        staged.join(dict_df, ["term_id"])
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
                f"shiftright(ord, greatest({ord_bits} - salt_bits, 0)) "
                "end as int)"
            ),
        )
    )


def _build_postings_single_job(
    spark: SparkSession, cat: IndexCatalog, config: EngineConfig, builder,
    ord_bits: int,
) -> None:
    """All buckets in ONE Spark job: staging scan -> dictionary join ->
    one wide (term_id, salt) shuffle -> sorted block build -> bucket-
    partitioned write.  Full cluster parallelism throughout — no per-bucket
    job tails (the round-1 loop's bucket stage scaled 1.6x/4 because each
    of 8 jobs serialized its own shuffle+sort+write phases)."""
    staged_all = spark.read.parquet(cat.path(IndexCatalog.STAGING)).select(
        "term_id", "ord", "tf", "dl", "pos_bytes"
    )
    dict_all = cat.read(spark, IndexCatalog.DICTIONARY).select(
        "term_id", "df", "ford"
    )
    salted = _salt_postings(staged_all, dict_all, config, ord_bits)
    n_parts = max(2 * spark.sparkContext.defaultParallelism, 16)
    blocks = (
        salted.repartition(n_parts, "term_id", "salt")
        .sortWithinPartitions("term_id", "salt", "ord")
        .mapInArrow(builder, BLOCKS_SCHEMA)
        .withColumn(
            "bucket", F.pmod(F.col("term_id"), F.lit(config.n_term_buckets))
        )
    )
    # per-bucket lineage metrics ride the write itself as conditional-sum
    # observations — no read-back jobs on the build critical path (two
    # extra Spark jobs were ~10% of the whole postings stage at 16 cores);
    # is_complete()/committed_buckets() see the same manifest shape as the
    # resumable loop
    nb = config.n_term_buckets
    obs = Observation("postings")
    blocks = blocks.observe(
        obs,
        *[
            F.sum(F.when(F.col("bucket") == b, 1).otherwise(0)).alias(f"b{b}")
            for b in range(nb)
        ],
        *[
            F.sum(F.when(F.col("bucket") == b, F.col("n")).otherwise(0)).alias(
                f"p{b}"
            )
            for b in range(nb)
        ],
    )
    cat.write(blocks, IndexCatalog.POSTINGS, partition_by=["bucket"])
    m = obs.get
    terms_per_bucket = (
        cat.manifest()["stages"]
        .get("dictionary", {})
        .get("metrics", {})
        .get("terms_per_bucket", {})
    )
    for bucket in range(nb):
        cat.commit_bucket(
            bucket,
            {
                "blocks": int(m[f"b{bucket}"] or 0),
                "postings": int(m[f"p{bucket}"] or 0),
                "terms": int(terms_per_bucket.get(str(bucket), 0)),
                "bytes": cat.table_bytes(
                    f"{IndexCatalog.POSTINGS}/bucket={bucket}"
                ),
            },
        )


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
    # resuming across an on-disk format change would mix ord- and
    # hash-keyed stages — wipe and rebuild instead
    stale = (
        cat.manifest().get("stages")
        and cat.get_meta("format") != INDEX_FORMAT_VERSION
    )
    if not resume or stale:
        import shutil

        shutil.rmtree(cat.root, ignore_errors=True)
        cat = IndexCatalog(out_dir)
    cat.set_meta("format", INDEX_FORMAT_VERSION)

    corpus_with_ids = with_doc_ids(corpus) if "doc_id" not in corpus.columns else corpus

    # -- stage 0: dense-ordinal layout (one narrow count job) ---------------
    # offsets are committed to the manifest so a killed/resumed build
    # re-attaches IDENTICAL ords (and a changed input partitioning between
    # runs is detected by the docs-stage count assertion below)
    if not cat.stage_done("ords"):
        offsets, n_total = partition_offsets(corpus_with_ids)
        cat.commit_stage("ords", {"offsets": offsets, "n_docs": n_total})
    ords_m = cat.manifest()["stages"]["ords"]["metrics"]
    offsets = [int(x) for x in ords_m["offsets"]]
    n_docs = int(ords_m["n_docs"])
    band_bits = max(config.n_eval_bands - 1, 0).bit_length()
    ord_shift = ord_shift_of(n_docs, band_bits)
    # band layout + ordinal width are INDEX properties (blocks never cross
    # band boundaries; bands are ord ranges) — readers must use these, not
    # their own config's derivation
    cat.set_meta("band_bits", band_bits)
    cat.set_meta("ord_bits", ord_bits_of(n_docs))

    # -- stage 1: docs table (ord + metadata + per-row sha256 invariant) ----
    if not cat.stage_done("docs"):
        meta_cols = ["doc_id", "repo", "path", "commit", "lang", "content_sha"] + [
            f for f in config.int_fields if f in corpus_with_ids.columns
        ]
        docs = attach_ords(
            corpus_with_ids.select(
                *[c for c in meta_cols if c in corpus_with_ids.columns]
            ),
            offsets,
        )
        docs_obs = Observation("docs")
        cat.write(docs.observe(docs_obs, F.count(F.lit(1)).alias("n")), IndexCatalog.DOCS)
        n_written = int(docs_obs.get["n"])
        if n_written != n_docs:
            raise RuntimeError(
                f"docs pass saw {n_written} rows but the offsets pass saw "
                f"{n_docs} — the input's partitioning is not stable across "
                "scans; materialize the corpus (e.g. write it to parquet) "
                "before building"
            )
        cat.commit_stage("docs", {"n_docs": n_docs})

    # -- stage 2: staged tokens, partitioned by term-hash bucket ------------
    # per-field sum(tf) rides the write as conditional-sum observations:
    # sum(tf) over staged rows of a field == sum of per-doc field lengths
    # (each doc-field's tfs sum to its token count), so avgdl needs no
    # second pass over staging at all.
    field_names = [f.name for f in config.fields]
    if not cat.stage_done("staging"):
        tokens = tokenize_corpus(corpus_with_ids, config, offsets)
        staged = tokens.withColumn(
            "bucket", F.pmod(F.col("term_id"), F.lit(config.n_term_buckets))
        )
        stg_obs = Observation("staging")
        staged = staged.observe(
            stg_obs,
            *[
                F.sum(F.when(F.col("ford") == i, F.col("tf")).otherwise(0)).alias(fn)
                for i, fn in enumerate(field_names)
            ],
        )
        # UNPARTITIONED write with ``bucket`` as an ordinary column: every
        # hot-path consumer (dictionary agg, docmap agg, single-job postings
        # build) full-scans staging, so hive-partitioning by bucket bought
        # nothing there while costing a sort-based dynamic-partition write
        # (measured 45.6 s vs 6.2 s plain at 25k docs — the sorter has to
        # buffer/spill every pos_bytes payload).  The rare ``bucket_resume``
        # path filters on the bucket COLUMN instead (row-group stats).
        cat.write(staged, IndexCatalog.STAGING)
        sum_dl = {fn: int(stg_obs.get[fn] or 0) for fn in field_names}
        cat.commit_stage(
            "staging",
            {"bytes": cat.table_bytes(IndexCatalog.STAGING), "sum_dl": sum_dl},
        )

    # -- stage 3: per-field doc stats (N, avgdl) — tiny driver-built table --
    # 4 rows: written directly with pyarrow (a Spark job for this pays the
    # python-RDD createDataFrame warmup for nothing; Spark reads it fine)
    if not cat.stage_done("doc_stats"):
        sum_dl = cat.manifest()["stages"]["staging"]["metrics"].get("sum_dl")
        if sum_dl is None:  # resumed from an older staging commit
            staged = spark.read.parquet(cat.path(IndexCatalog.STAGING))
            sum_dl = {
                r["field"]: int(r["s"])
                for r in staged.groupBy("field").agg(F.sum("tf").alias("s")).collect()
            }
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pathlib import Path as _Path

        tbl = pa.table(
            {
                "field": pa.array(field_names, pa.string()),
                "sum_dl": pa.array([int(sum_dl.get(fn, 0)) for fn in field_names], pa.int64()),
                "n_docs": pa.array([n_docs] * len(field_names), pa.int64()),
                "avgdl": pa.array(
                    [sum_dl.get(fn, 0) / n_docs if n_docs else 1.0 for fn in field_names],
                    pa.float64(),
                ),
            }
        )
        stats_dir = _Path(cat.path(IndexCatalog.DOC_STATS))
        stats_dir.mkdir(parents=True, exist_ok=True)
        pq.write_table(tbl, stats_dir / "part-00000.parquet")
        cat.commit_stage("doc_stats")

    stats_rows = spark.read.parquet(cat.path(IndexCatalog.DOC_STATS)).collect()
    avgdl = {r["field"]: float(r["avgdl"]) for r in stats_rows}

    # -- stage 3b: DOCMAP — per-band ord -> doc_id arrays + dl sidecars ----
    # ford = -1 rows carry the band's packed int64 doc_ids (ord order);
    # ford = k rows carry the band's packed int32 per-doc lengths of field
    # k (dense by ord, 0 where the doc has no tokens in the field) — the
    # Lucene norms-file analogue, ONE int per doc-field instead of one
    # varbyte per POSTING in the blocks.  Rows are chunked so no parquet
    # cell or eval allocation exceeds ~2 MB even for giant bands.
    if not cat.stage_done("docmap"):
        docs_df = spark.read.parquet(cat.path(IndexCatalog.DOCS)).select(
            "ord", "doc_id"
        )
        ids_part = docs_df.select(
            F.lit(-1).alias("ford"), "ord", F.col("doc_id").alias("value")
        )
        staged = spark.read.parquet(cat.path(IndexCatalog.STAGING))
        # dl is constant over a (doc, field)'s staged rows; the groupBy
        # map-side-combines down to ~n_fields rows per doc before shuffling
        dls_part = staged.groupBy("ord", "ford").agg(
            F.max("dl").cast("long").alias("value")
        ).select("ford", "ord", "value")
        dm = ids_part.unionByName(dls_part).withColumn(
            "band", F.shiftright("ord", ord_shift).cast("int")
        )
        docmap_chunk = 262_144
        _n_docs, _shift = int(n_docs), int(ord_shift)

        def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            band, ford = int(key[0]), int(key[1])
            band_start = band << _shift
            band_n = min(_n_docs - band_start, 1 << _shift)
            o = pdf["ord"].to_numpy(np.int64)
            vals = pdf["value"].to_numpy(np.int64)
            if ford < 0:  # dense & complete: sort into ord order
                arr = vals[np.argsort(o)].astype("<i8")
            else:  # sparse per field: scatter into a dense int32 array
                arr = np.zeros(band_n, dtype="<i4")
                arr[o - band_start] = vals
            rows = []
            for seq, lo in enumerate(range(0, len(arr), docmap_chunk)):
                blk = arr[lo : lo + docmap_chunk]
                rows.append((band, ford, seq, len(blk), blk.tobytes()))
            return pd.DataFrame(
                rows, columns=["band", "ford", "blk_seq", "n", "payload"]
            )

        dm_schema = T.StructType(
            [
                T.StructField("band", T.IntegerType(), False),
                T.StructField("ford", T.IntegerType(), False),
                T.StructField("blk_seq", T.IntegerType(), False),
                T.StructField("n", T.IntegerType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        )
        cat.write(
            dm.groupBy("band", "ford").applyInPandas(pack, dm_schema),
            IndexCatalog.DOCMAP,
        )
        cat.commit_stage("docmap")

    # -- stage 4: dictionary (df/cf), ONE job for every bucket --------------
    # numeric groupBy; the term string (shipped once per tokenizer chunk,
    # null elsewhere) is recovered with max() — a declarative agg, so the
    # whole stage codegens (first() would force ObjectHashAggregate)
    if not cat.stage_done("dictionary"):
        staged = spark.read.parquet(cat.path(IndexCatalog.STAGING))
        dictionary = (
            staged.groupBy("bucket", "term_id")
            .agg(
                F.count("*").alias("df"),
                F.sum("tf").alias("cf"),
                F.max("term").alias("term"),
                F.min("term").alias("term_lo"),
                F.max("ford").alias("ford"),
            )
            .withColumn(
                "field",
                F.element_at(
                    F.array(*[F.lit(fn) for fn in field_names]), F.col("ford") + 1
                ),
            )
        )
        # align writers to buckets: without this every reducer task opens a
        # file per bucket (tasks × buckets small files — measurably slower
        # than the extra narrow exchange)
        dictionary = dictionary.repartition(2 * config.n_term_buckets, "bucket")
        # 64-bit term_id collision detection, ~free: min/max over the
        # (mostly-null, once-per-chunk) term strings disagree only when two
        # DISTINCT terms share a term_id — which would silently merge their
        # postings (wrong df/idf, cross-matched docs).  Declarative aggs
        # keep the stage in whole-stage codegen.
        coll_obs = Observation("tid_collisions")
        # per-bucket term counts ride the same observation (conditional
        # sums) — the postings stage's lineage metrics read them from the
        # manifest instead of a separate dictionary groupBy job
        dictionary = dictionary.observe(
            coll_obs,
            F.sum(
                F.when(F.col("term_lo") != F.col("term"), 1).otherwise(0)
            ).alias("n"),
            *[
                F.sum(F.when(F.col("bucket") == b, 1).otherwise(0)).alias(
                    f"t{b}"
                )
                for b in range(config.n_term_buckets)
            ],
        )
        cat.write(
            dictionary.drop("term_lo"), IndexCatalog.DICTIONARY,
            partition_by=["bucket"],
        )
        m = coll_obs.get
        n_coll = int(m["n"] or 0)
        if n_coll:
            raise RuntimeError(
                f"{n_coll} term_id collision(s) detected in the dictionary — "
                "two distinct terms hash to one 64-bit id; rebuild with a "
                "128-bit term id (see term_id_of)"
            )
        cat.commit_stage(
            "dictionary",
            {
                "term_id_collisions": 0,
                "terms_per_bucket": {
                    str(b): int(m[f"t{b}"] or 0)
                    for b in range(config.n_term_buckets)
                },
            },
        )

    # -- stage 5: per-bucket postings build (resumable loop) ----------------
    # one Spark job per bucket; metrics come from Observation (no read-back)
    avgdl_ord = np.array([avgdl.get(fn, 1.0) for fn in field_names], dtype=np.float64)
    builder = make_block_builder(
        float(n_docs), avgdl_ord, config.k1, config.b, config.block_size, ord_shift
    )
    ord_bits = ord_bits_of(n_docs)
    done = cat.committed_buckets()
    todo = [b for b in range(config.n_term_buckets) if b not in done]
    if todo and not config.bucket_resume:
        _build_postings_single_job(spark, cat, config, builder, ord_bits)
        todo = []
    if todo:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        staged_all = spark.read.parquet(cat.path(IndexCatalog.STAGING))
        dict_all = cat.read(spark, IndexCatalog.DICTIONARY)
        terms_per_bucket = {
            int(r["bucket"]): int(r["n"])
            for r in dict_all.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        manifest_lock = threading.Lock()

        def do_bucket(bucket: int) -> None:
            # ALL-NUMERIC from here on: parquet column pruning drops the
            # field/term string columns of staging; df + field ordinal come
            # from the (term_id-keyed) dictionary join
            staged_b = staged_all.where(F.col("bucket") == bucket).select(
                "term_id", "ord", "tf", "dl", "pos_bytes"
            )
            n_terms = terms_per_bucket.get(bucket, 0)
            dict_b = dict_all.where(F.col("bucket") == bucket).select(
                "term_id", "df", "ford"
            )
            salted = _salt_postings(staged_b, dict_b, config, ord_bits)
            # enough tasks per job that concurrent bucket jobs can fill
            # freed slots (finer granularity costs little; too-coarse tasks
            # leave cores idle during each job's tail)
            n_parts = max(spark.sparkContext.defaultParallelism, 8)
            blocks = (
                salted.repartition(n_parts, "term_id", "salt")
                .sortWithinPartitions("term_id", "salt", "ord")
                .mapInArrow(builder, BLOCKS_SCHEMA)
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
