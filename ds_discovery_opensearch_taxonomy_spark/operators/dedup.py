"""Deduplication operators for large-scale training-data pipelines.

All operators are Spark-native (JVM expressions / single-pass aggregations)
except where noted; each is designed so the shuffle is keyed by something
bounded (hash group, band bucket) rather than by document pairs.

* exact duplicates   — sha256 hash-groupBy (one shuffle on the digest);
* MinHash + LSH      — shingle→minhash signature in ONE pass (H min-aggs
  with map-side combine), band→bucket join for candidate pairs (only
  bucket-colliding pairs are materialised — never the n^2 cross join);
* SimHash            — 64-bit signature from token hashes, near-dup pairs
  via 16-bit chunk banding + hamming verify;
* n-gram Jaccard     — exact pairwise similarity via shared-shingle
  self-join (SQL-expressible; the verify stage for LSH candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (doc_id, grp, group_size), only for
    groups with >1 member."""
    h = df.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("grp"))
    sizes = h.groupBy("grp").agg(F.count("*").alias("group_size")).where("group_size > 1")
    return h.join(sizes, "grp").select("doc_id", "grp", "group_size")


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct token k-gram shingles per doc: (doc_id, shingle)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - k, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, k)),
            )
        ).alias("shingle"),
    )
    return grams.distinct()


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
) -> DataFrame:
    """(doc_id, sig array<long>) — one shingle explosion, ``num_hashes``
    min-aggregations (all map-side combinable, no per-doc state)."""
    sh = shingles(df, text_col, id_col, k)
    aggs = [
        F.min(F.xxhash64(F.lit(SEED + i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    min_est_jaccard: float = 0.5,
    max_bucket: int | None = 2048,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH, with the
    signature-estimated Jaccard: (a, b, est_jaccard), a < b.

    Scale shape: bucket join on (band, band_hash) — only colliding docs
    shuffle together; the estimated-Jaccard verify runs on candidates only.
    ``max_bucket`` bounds docs per bucket: a bucket of B identical docs
    otherwise emits B²/2 candidate rows (quadratic blowup on boilerplate /
    cloned files).  Members kept deterministically (lowest doc_id); run
    :func:`exact_duplicates` first and LSH the group representatives to
    keep full recall on byte-identical clones."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k).cache()
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", bi * rows_per_band + j + 1) for j in range(rows_per_band)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    banded = _cap_buckets(banded, ["band", "bh"], "doc_id", max_bucket)
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
    )
    return est.where(F.col("est_jaccard") >= min_est_jaccard)


def _cap_buckets(
    df: DataFrame, keys: list[str], order_col: str, max_bucket: int | None
) -> DataFrame:
    """Keep at most ``max_bucket`` rows per bucket (deterministic: lowest
    ``order_col`` first).  Bounds candidate-pair fan-out to max_bucket²/2
    per bucket; the window shuffle reuses the same partitioning the
    candidate self-join needs anyway."""
    if max_bucket is None:
        return df
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_bucket)
        .drop("_rk")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via shared-shingle self-join:
    (a, b, jaccard), a < b.  |a ∩ b| from the join, sizes from per-doc
    distinct counts.  This is the verify stage for LSH candidates and the
    DuckDB-checkable oracle twin."""
    sh = shingles(df, text_col, id_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


# -- SimHash ------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc (token tf-weighted, xxhash64 token hashes) —
    pure JVM: explode tokens, one groupBy(doc) with 64 conditional-sum
    bit-vote aggregations (map-side combinable, whole-stage codegen), then
    the signature is assembled from the vote signs.  Zero Python in the
    path; occurrence-weighted votes == tf-weighted votes."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.xxhash64(F.lit(SEED), F.col("tok"))
    bit = lambda i: F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1  # noqa: E731
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(i), 1).otherwise(-1)).alias(f"v{i}")
            for i in range(64)
        ]
    )
    # sum of distinct powers of two == the bit pattern; bit 63 is added as
    # the int64 sign value so nothing overflows under ANSI arithmetic
    sig = F.lit(0).cast("long")
    for i in range(63):
        sig = sig + F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(0).cast("long")
    sig = sig + F.when(F.col("v63") > 0, F.lit(-(2**63))).otherwise(0).cast("long")
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 2048,
) -> DataFrame:
    """Near-dup pairs by SimHash: band each signature into 4 x 16-bit chunks
    (pigeonhole: hamming<=3 implies >=1 identical chunk), join on chunks,
    verify exact hamming distance JVM-side (bit_count(xor)).
    ``max_bucket`` bounds docs per chunk bucket (see minhash_lsh_pairs)."""
    sigs = simhash(df, text_col, id_col).cache()
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.cv")
    chunks = _cap_buckets(chunks, ["chunk", "cv"], "doc_id", max_bucket)
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
