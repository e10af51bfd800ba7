"""Similarity search over an embedding column (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k: JVM-side dot product via
  ``F.zip_with`` + ``F.aggregate`` (no Python in the scan), window top-k.
  The correctness baseline and the small-query-set path.
* ``lsh_topk``        — random-hyperplane LSH bucketing: deterministic
  hyperplanes (seeded, driver-generated), sign-bit signature, candidates
  share >= 1 band; exact re-rank inside buckets.  The scale path: the scan
  shuffles by (band, bucket) instead of crossing every (query, doc) pair.
* ``ivf_topk``        — inverted-file ANN: deterministic k-means(ish)
  coarse centroids trained on a sample (driver-side NumPy Lloyd
  iterations), corpus partitioned by nearest centroid (Arrow-vectorized
  assignment), queries probe the ``nprobe`` nearest cells; exact re-rank
  inside probed cells.  With ``nprobe == n_cells`` it is exact (equals
  brute force) — the oracle-checkable configuration.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of every query vector against the corpus:
    (query_id, vec_id, cosine, rank).  Queries broadcast (small side)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec"))
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("qvec"), F.col("evec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = SEED) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: hash-derived gaussians via
    Box-Muller over a counter keyed by the seed (no RNG state)."""
    import hashlib

    n = dim * n_planes
    out = np.empty(n, dtype=np.float64)
    i = 0
    ctr = 0
    while i < n:
        h = hashlib.blake2b(f"{seed}:{ctr}".encode(), digest_size=16).digest()
        u1 = (int.from_bytes(h[:8], "big") + 1) / (2**64 + 2)
        u2 = int.from_bytes(h[8:], "big") / 2**64
        z0 = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
        z1 = np.sqrt(-2 * np.log(u1)) * np.sin(2 * np.pi * u2)
        out[i] = z0
        if i + 1 < n:
            out[i + 1] = z1
        i += 2
        ctr += 1
    return out.reshape(n_planes, dim)


def lsh_signatures(
    embeddings: DataFrame,
    planes: np.ndarray,
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, band, bucket): sign-bit signature of each vector against the
    hyperplanes, chunked into bands.

    One Arrow-vectorized matmul per batch (``X @ planes.T``): at real
    embedding dims an unrolled per-plane literal expression tree
    (dim x n_planes literals) blows up Catalyst; the planes ship in the
    task closure instead and the whole signature is two NumPy ops."""
    import pandas as pd
    from pyspark.sql import types as T

    n_planes, _dim = planes.shape
    rows_per_band = n_planes // bands
    weights = (1 << np.arange(rows_per_band)[::-1]).astype(np.int64)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (x @ planes.T) > 0  # (n, n_planes)
            buckets = bits.reshape(n, bands, rows_per_band).astype(np.int64) @ weights
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), n),
                    "bucket": buckets.ravel(),
                }
            )

    return embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(run, schema)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_bucket: int | None = 65536,
) -> DataFrame:
    """Approximate cosine top-k: candidates = corpus vectors sharing >= 1
    LSH band bucket with the query; exact cosine re-rank on candidates.
    Returns (query_id, vec_id, cosine, rank).

    ``max_bucket`` bounds corpus members per (band, bucket) — a degenerate
    bucket (e.g. many identical vectors) would otherwise fan out
    |bucket| x |queries| candidate rows; members are kept deterministically
    (lowest vec_id) and the bound is a recall trade documented to callers."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    e_sig = lsh_signatures(embeddings, planes, bands, id_col, vec_col)
    if max_bucket is not None:
        wb = Window.partitionBy("band", "bucket").orderBy("vec_id")
        e_sig = (
            e_sig.withColumn("_rk", F.row_number().over(wb))
            .where(F.col("_rk") <= max_bucket)
            .drop("_rk")
        )
    q_sig = lsh_signatures(queries, planes, bands, query_id_col, vec_col).withColumnRenamed(
        "vec_id", "query_id"
    )
    cand = (
        e_sig.join(F.broadcast(q_sig), ["band", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(e, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qvec"), F.col("evec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# -- IVF ----------------------------------------------------------------------


def train_centroids(
    embeddings: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 10,
    seed: int = SEED,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (L2-normalized, so
    nearest-centroid by dot product == by cosine); centroids are (C, dim).

    Sampling is a HASH-THRESHOLD filter on the id column (seeded,
    content-deterministic): survivors ~ 2x the requested sample, then a
    tiny sort of just the survivors pins the exact subset.  No full-corpus
    sort and no per-row string cast of the embeddings (the round-1 version
    ordered the whole corpus by xxhash64(vec::string))."""
    n_total = embeddings.count()  # parquet metadata count — no data scan
    domain = 1 << 20
    thresh = domain if n_total <= sample else max(
        1, int(domain * min(1.0, 2.0 * sample / n_total))
    )
    h64 = F.xxhash64(F.lit(seed), F.col(id_col))
    rows = (
        embeddings.select(F.col(vec_col).alias("v"), h64.alias("h"))
        .where(F.pmod(F.col("h"), F.lit(domain)) < thresh)
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # k-means++-lite seeding: spread picks by hash order, then Lloyd
    cents = x[:: max(1, len(x) // n_cells)][:n_cells].copy()
    for _ in range(iters):
        sims = x @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _assign_cells(df: DataFrame, cents: np.ndarray, id_col: str, vec_col: str, n: int) -> DataFrame:
    """(id, cell...) — top-n nearest centroids per vector, Arrow-vectorized."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("cell", T.IntegerType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if len(x) == 0:
                continue
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cents.T
            if n == 1:
                cells = np.argmax(sims, axis=1)[:, None]
            else:
                cells = np.argsort(-sims, axis=1)[:, :n]
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, cells.shape[1]),
                    "cell": cells.ravel().astype(np.int32),
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(run, schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: corpus bucketed by nearest centroid,
    each query probes its ``nprobe`` nearest cells, exact cosine re-rank on
    the probed candidates.  Returns (query_id, vec_id, cosine, rank).

    Scale shape: the (cell) join replaces the query x corpus cross join —
    per-query work is the probed cells' postings only, mirroring the
    inverted-index text path (cells ~ posting lists)."""
    cents = (
        centroids
        if centroids is not None
        else train_centroids(embeddings, n_cells, vec_col, id_col=id_col)
    )
    e_cells = _assign_cells(embeddings, cents, id_col, vec_col, 1).withColumnRenamed(
        "id", "vec_id"
    )
    q_cells = _assign_cells(queries, cents, query_id_col, vec_col, min(nprobe, len(cents))).withColumnRenamed(
        "id", "query_id"
    )
    cand = (
        e_cells.join(F.broadcast(q_cells), "cell").select("query_id", "vec_id").distinct()
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(e, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qvec"), F.col("evec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 4096,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: (id_a, id_b, cosine) with
    ``id_a < id_b`` and cosine >= ``threshold``.  Pass ``dim`` explicitly
    to skip the one-row dimension probe job (and to make the empty-input
    result well-defined without it).

    Scale shape mirrors minhash_lsh_pairs (operators/dedup.py): candidates
    come from a self-join keyed by (band, bucket) — vectors whose
    random-hyperplane sign signatures agree on >= 1 band — never an
    all-pairs cross join, and the exact cosine verify runs only on
    candidates.  ``max_bucket`` bounds members per (band, bucket) so a
    degenerate bucket (many identical vectors) cannot emit |bucket|^2/2
    rows (deterministic keep: lowest id; a recall trade documented to
    callers).  Recall is tunable via bands/n_planes: P(candidate) =
    1 - (1 - s^r)^bands for signature agreement s, r = n_planes/bands.
    """
    if dim is None:
        probe = embeddings.select(vec_col).first()
        if probe is None:  # empty input: no pairs (first() would be None)
            return embeddings.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = len(probe[0])
    planes = hyperplanes(dim, n_planes)
    sig = lsh_signatures(embeddings, planes, bands, id_col, vec_col)
    if max_bucket is not None:
        wb = Window.partitionBy("band", "bucket").orderBy("vec_id")
        sig = (
            sig.withColumn("_rk", F.row_number().over(wb))
            .where(F.col("_rk") <= max_bucket)
            .drop("_rk")
        )
    a = sig.select("band", "bucket", F.col("vec_id").alias("id_a"))
    b = sig.select("band", "bucket", F.col("vec_id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    e = embeddings.select(F.col(id_col), F.col(vec_col))
    scored = (
        cand.join(e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "id_a")
        .join(e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
    )
    return scored.where(F.col("cosine") >= threshold)
