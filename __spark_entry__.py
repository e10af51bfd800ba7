"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: build the inverted index over the sf0.001
                     documents table, answer a multi-clause taxonomy query
                     (phrases, boolean, wildcard, NOT) as scored BM25 top-k.
``queries()``      — one entry per implemented operator (SURVEY.md §2 +
                     training-data ops); each runs the REAL engine/operator.
``oracle_sql()``   — DuckDB twins.  The documents testdata is plain
                     space-separated lowercase words, for which the full
                     analyzer chain degenerates to whitespace splitting, so
                     the engine's match sets/scores are SQL-reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig, FieldSpec
from ds_discovery_opensearch_taxonomy_spark.engine import TaxonomyEngine
from ds_discovery_opensearch_taxonomy_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textstats,
)
from ds_discovery_opensearch_taxonomy_spark.operators.index_build import build_index
from ds_discovery_opensearch_taxonomy_spark.operators.search import run_categories

#: engine config for the driver `documents` table (single analyzed field over
#: `text`; n_chars queryable as a numeric range field)
DOCS_CONFIG = EngineConfig(
    fields=(
        FieldSpec("textnocasnopunc", "textnocasnopunc", ("text",)),
        # second analyzed field over `lang` — exercises field-scoped query
        # routing (Q8: CATDOCREF:"..."-style per-field index spaces)
        FieldSpec("LANGREF", "textnocasnopunc", ("lang",)),
    ),
    int_fields=("n_chars", "NUM_START_DATE"),
    n_term_buckets=2,
    salt_target_postings=100_000,
    n_eval_bands=1,
)

_ENGINES: dict[str, TaxonomyEngine] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def _engine(spark: SparkSession, sf_dir: str) -> TaxonomyEngine:
    if sf_dir not in _ENGINES:
        key = hashlib.sha1((sf_dir + ":v3").encode()).hexdigest()[:10]
        idx = Path("/root/repo/.scratch") / f"entry_index_{key}"
        # NUM_START_DATE: deterministic yyyymmdd derived from doc_id so the
        # reference's date-rewrite query path (Q7) is exercisable + SQL-oracled
        corpus = _docs(spark, sf_dir).withColumn(
            "NUM_START_DATE",
            (F.lit(19000101) + (F.col("doc_id") % 120) * 10000).cast("int"),
        )
        build_index(spark, corpus, str(idx), DOCS_CONFIG, resume=True)
        _ENGINES[sf_dir] = TaxonomyEngine(spark, str(idx), DOCS_CONFIG)
    return _ENGINES[sf_dir]


def _run(spark, sf_dir, query, scored=False, top_k=None) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return run_categories(spark, eng.reader, [("q", query)], scored=scored, top_k=top_k)


_INCR_ENGINES: dict[str, TaxonomyEngine] = {}


def _incr_engine(spark: SparkSession, sf_dir: str) -> TaxonomyEngine:
    """Engine whose index was built on 80% of the documents table and then
    APPENDED with the remaining 20% via the daily-update maintenance path
    (operators/index_append.py) — queries read the live main∪delta view."""
    if sf_dir not in _INCR_ENGINES:
        key = hashlib.sha1((sf_dir + ":incr:v1").encode()).hexdigest()[:10]
        idx = Path("/root/repo/.scratch") / f"entry_index_{key}"
        corpus = _docs(spark, sf_dir).withColumn(
            "NUM_START_DATE",
            (F.lit(19000101) + (F.col("doc_id") % 120) * 10000).cast("int"),
        )
        base = corpus.where(F.col("doc_id") % 5 != 0)
        extra = corpus.where(F.col("doc_id") % 5 == 0)
        build_index(spark, base, str(idx), DOCS_CONFIG, resume=True)
        eng = TaxonomyEngine(spark, str(idx), DOCS_CONFIG)
        eng.append_docs(extra, batch_key="incr-0", auto_compact=False)  # no-op on replay
        _INCR_ENGINES[sf_dir] = eng
    return _INCR_ENGINES[sf_dir]


_COMPACT_ENGINES: dict[str, TaxonomyEngine] = {}


def _cmp_engine(spark: SparkSession, sf_dir: str) -> TaxonomyEngine:
    """Engine exercising the FULL maintenance cycle: build on 60% of the
    documents table, append 20%, COMPACT (folds the delta into
    generation-versioned main tables, renumbers its salt into the dense
    compacted range and resets the batch-seq counter —
    operators/index_append.compact_index), then append the last 20% with
    a post-reset seq.  Queries read main∪delta across a compaction
    boundary.  Replays are no-ops (compacted batch keys stay in the
    manifest's replay ledger), so re-running converges to the same live
    view."""
    if sf_dir not in _COMPACT_ENGINES:
        key = hashlib.sha1((sf_dir + ":cmp:v1").encode()).hexdigest()[:10]
        idx = Path("/root/repo/.scratch") / f"entry_index_{key}"
        corpus = _docs(spark, sf_dir).withColumn(
            "NUM_START_DATE",
            (F.lit(19000101) + (F.col("doc_id") % 120) * 10000).cast("int"),
        )
        part = F.pmod(F.col("doc_id"), F.lit(5))
        base = corpus.where(part >= 2)
        build_index(spark, base, str(idx), DOCS_CONFIG, resume=True)
        eng = TaxonomyEngine(spark, str(idx), DOCS_CONFIG)
        eng.append_docs(
            corpus.where(part == 0), batch_key="cmp-0", auto_compact=False
        )
        eng.compact()
        eng.append_docs(
            corpus.where(part == 1), batch_key="cmp-1", auto_compact=False
        )
        _COMPACT_ENGINES[sf_dir] = eng
    return _COMPACT_ENGINES[sf_dir]


# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: boolean+phrase+wildcard+NOT scored retrieval."""
    q = '("table window" OR "sort table" OR quer*) AND (key OR value) NOT "vector table"'
    return (
        _run(spark, "/root/testdata/sf0.001", q, scored=True, top_k=25)
        .select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


# --------------------------------------------------------------------------
# queries / oracles
# --------------------------------------------------------------------------

_TRIGRAM_SQL = (
    "list_transform(generate_series(1, greatest(len(t) - 2, 1)), "
    "i -> array_to_string(t[i:i+2], ' '))"
)

_BM25_PRELUDE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_match_bool(spark, sf):  # R1/R3/Q1/Q3: boolean term algebra
        return _run(spark, sf, '"table" AND "window" NOT "vector"').select("doc_id")

    def q_match_or(spark, sf):  # Q3 OR semantics
        return _run(spark, sf, '"vector" OR "stream"').select("doc_id")

    def q_match_phrase(spark, sf):  # Q2 positional phrase
        return _run(spark, sf, '"table window"').select("doc_id")

    def q_match_phrase_slop(spark, sf):  # Q2 slop (window<=2, transpositions)
        return _run(spark, sf, '"window table"~2').select("doc_id")

    def q_wildcard(spark, sf):  # Q4 dictionary expansion
        return _run(spark, sf, "quer* OR *ndow").select("doc_id")

    def q_numeric_range(spark, sf):  # Q6/I4 int-range over doc metadata
        return _run(spark, sf, '"table" AND n_chars:[200 TO 400]').select("doc_id")

    def q_term_range(spark, sf):  # Q5 string term range via dictionary
        return _run(spark, sf, "[win TO wing]").select("doc_id")

    def q_date_rewrite(spark, sf):  # Q7 START_DATE:{...} pre-parse rewrite
        return _run(spark, sf, '"table" AND START_DATE:{1980-01-01 TO *}').select(
            "doc_id"
        )

    def q_id_conjunction(spark, sf):  # Q9 id AND query (candidate set = ids)
        return (
            _run(spark, sf, '"table"', scored=True)
            .where(F.col("doc_id").isin([5, 6, 7, 8, 9]))
            .select("doc_id", F.round("score", 4).alias("score"))
        )

    def q_search_filtered(spark, sf):  # Q13/R6 non-scoring filter context
        eng = _engine(spark, sf)
        return eng.search('"spark"', min_score=0.3, limit=12, filters={"lang": ["en"]}).select(
            "doc_id", F.round("score", 4).alias("score")
        )

    def q_search_filtered_selective(spark, sf):  # r3: filter BEFORE scoring
        """Highly-selective filter context (rarest lang, ~14% of docs):
        compiled as a FILTER-occur virtual clause that prunes candidates
        INSIDE the evaluator (before scoring and the per-band top-k cut),
        not as a post-join — reference Must/Filter split,
        OpenSearchConnection.cs:393-402.  BM25 stats stay GLOBAL (filters
        restrict candidates, not df/avgdl), which the oracle mirrors by
        scoring first and filtering after."""
        eng = _engine(spark, sf)
        return eng.search(
            '"table" OR "window"', limit=15, filters={"lang": ["de"]}
        ).select("doc_id", F.round("score", 4).alias("score"))

    def q_facets_scoped(spark, sf):  # R10: query-scoped terms aggregation
        """Facets over the QUERY's match set (reference attaches terms
        aggs to the search request, OpenSearchConnection.SetupFacets:322-336)
        — not whole-corpus counts."""
        eng = _engine(spark, sf)
        return eng.facets("lang", query_text='"table" AND "window"')

    def q_search_sorted(spark, sf):  # R11 metadata sort replaces relevance
        eng = _engine(spark, sf)
        return eng.search(
            '"vector"', limit=12, sort_by=[("n_chars", False)]
        ).select("doc_id", "n_chars")

    def q_bm25_topk(spark, sf):  # R4/R5 scored top-k, rank-identical BM25
        return (
            _run(spark, sf, '"table" OR "window"', scored=True, top_k=20)
            .select("doc_id", F.round("score", 4).alias("score"))
        )

    def q_bm25_scores_all(spark, sf):  # R5 full scored match set
        return (
            _run(spark, sf, '"group" AND "batch"', scored=True)
            .select("doc_id", F.round("score", 4).alias("score"))
        )

    def q_min_score_pagination(spark, sf):  # R8
        res = _run(spark, sf, '"spark"', scored=True)
        return (
            res.where(F.col("score") >= 0.3)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(15)
            .select("doc_id", F.round("score", 4).alias("score"))
        )

    def q_count(spark, sf):  # R9
        eng = _engine(spark, sf)
        n = run_categories(spark, eng.reader, [("q", '"merge" OR "join"')], scored=False).count()
        return spark.createDataFrame([(n,)], "match_count long")

    def q_facets(spark, sf):  # R10 terms aggregation
        return (
            _docs(spark, sf)
            .groupBy("lang")
            .agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), F.asc("lang"))
            .limit(100)
        )

    def q_dictionary_stats(spark, sf):  # I3/I6: df/cf of the built index
        eng = _engine(spark, sf)
        words = ["table", "window", "vector", "spark", "query", "the"]
        return (
            eng.reader.dictionary()
            .where(F.col("term").isin(words))
            .select("term", "df", "cf")
        )

    def q_doc_stats(spark, sf):  # index corpus stats
        eng = _engine(spark, sf)
        return spark.createDataFrame(
            [(int(eng.reader.n_docs), round(float(eng.reader.avgdl["textnocasnopunc"]), 6))],
            "n_docs long, avgdl double",
        )

    def q_dedup_exact(spark, sf):  # exact dedup on clones
        d = _docs(spark, sf)
        d2 = d.unionByName(d.limit(5).withColumn("doc_id", F.col("doc_id") + 1000000))
        return dedup.exact_duplicates(d2).select("doc_id", "grp", "group_size")

    def q_ngram_jaccard(spark, sf):  # exact n-gram Jaccard near-dups
        d = _docs(spark, sf)
        d2 = d.unionByName(d.limit(5).withColumn("doc_id", F.col("doc_id") + 1000000))
        return dedup.ngram_jaccard_pairs(d2, min_jaccard=0.999).select(
            "a", "b", F.round("jaccard", 6).alias("jaccard")
        )

    def q_minhash_lsh(spark, sf):
        # the production dedup pipeline shape: MinHash-LSH generates the
        # candidate pairs (min_est_jaccard=1.0 — all 64 hashes agree; MUST
        # recall every identical-shingle-set pair), then an exact verify
        # stage keeps set-identical pairs.  The DuckDB twin is the exact
        # Jaccard==1 pair set, independent of hash functions.
        d = _docs(spark, sf)
        d2 = d.unionByName(d.limit(5).withColumn("doc_id", F.col("doc_id") + 1000000))
        cand = dedup.minhash_lsh_pairs(d2, min_est_jaccard=1.0).select("a", "b")
        keys = (
            dedup.shingles(d2)
            .groupBy("doc_id")
            .agg(
                F.md5(
                    F.concat_ws("\n", F.array_sort(F.collect_list("shingle")))
                ).alias("k")
            )
        )
        return (
            cand.join(keys.select(F.col("doc_id").alias("a"), F.col("k").alias("ka")), "a")
            .join(keys.select(F.col("doc_id").alias("b"), F.col("k").alias("kb")), "b")
            .where(F.col("ka") == F.col("kb"))
            .select("a", "b")
        )

    def q_simhash(spark, sf):
        # candidate pairs from SimHash chunk banding at hamming 0 (must
        # recall every identical-token-multiset pair — SimHash is order-
        # invariant), exact multiset-equality verify keeps true clones
        d = _docs(spark, sf)
        d2 = d.unionByName(d.limit(5).withColumn("doc_id", F.col("doc_id") + 1000000))
        cand = dedup.simhash_near_pairs(d2, max_hamming=0).select("a", "b")
        key = F.md5(
            F.concat_ws("\n", F.array_sort(F.split(F.lower(F.col("text")), r"\s+")))
        )
        keys = d2.select(F.col("doc_id"), key.alias("k"))
        return (
            cand.join(keys.select(F.col("doc_id").alias("a"), F.col("k").alias("ka")), "a")
            .join(keys.select(F.col("doc_id").alias("b"), F.col("k").alias("kb")), "b")
            .where(F.col("ka") == F.col("kb"))
            .select("a", "b")
        )

    def q_similarity_bruteforce(spark, sf):  # exact cosine top-k ANN baseline
        e = _emb(spark, sf)
        qs = e.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return similarity.brute_force_topk(e, qs, k=5).select(
            "query_id", "vec_id", "cosine"
        )

    def q_similarity_ivf(spark, sf):  # IVF ANN; nprobe == n_cells => exact
        e = _emb(spark, sf)
        qs = e.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return similarity.ivf_topk(
            e, qs, k=5, n_cells=8, nprobe=8
        ).select("query_id", "vec_id", "cosine")

    def q_similarity_lsh(spark, sf):
        # self-retrieval: every corpus vector used as a query MUST hash to
        # its own buckets and re-rank itself to rank 1 with cosine 1.0 —
        # exercises signature, banding, bucket join, and exact re-rank with
        # a SQL-expressible oracle (identity + cosine 1.0)
        e = _emb(spark, sf)
        qs = e.where(F.col("vec_id") < 200).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return similarity.lsh_topk(e, qs, k=1, n_planes=16, bands=8).select(
            "query_id", "vec_id", F.round("cosine", 6).alias("cosine")
        )

    def q_token_counts(spark, sf):
        return textstats.token_counts(_docs(spark, sf))

    def q_quality(spark, sf):
        return textstats.quality_scores(_docs(spark, sf))

    def q_langid(spark, sf):
        return textstats.language_id(_docs(spark, sf)).select("doc_id", "pred_lang")

    def q_fingerprint(spark, sf):
        return textstats.fingerprints(_docs(spark, sf))

    def q_multimodal(spark, sf):  # binary-column plumbing: sizes per kind
        feats = multimodal.extract_features(
            multimodal.assets_from_documents(_docs(spark, sf))
        )
        return feats.select("asset_id", "kind", "n_bytes")

    def q_multimodal_features(spark, sf):
        # byte entropy over the high nibble (16-bin histogram); the docs
        # are ASCII so DuckDB can recompute it from character code points
        # compare at the operator's own 6-digit rounding: re-rounding to 4
        # was a DOUBLE rounding — every 6-digit value ending in "50" sat on
        # a knife edge where Spark/NumPy/DuckDB tie-break rules disagree
        # (~1/100 docs), flaking the hash gate
        feats = multimodal.extract_features(
            multimodal.assets_from_documents(_docs(spark, sf))
        )
        return feats.select("asset_id", "byte_entropy")

    def q_video_frame_sample(spark, sf):
        """Vendored Y4M video decode through the FULL Spark path: a
        deterministic Y4M clip per document (n_frames = 3 + doc_id % 5,
        12x8 frames), sampled every 2nd frame via
        operators.multimodal.sample_frames (decode -> select -> PNG
        re-encode inside mapInPandas).  Returns per-asset sampled-frame
        counts, which the DuckDB oracle recomputes arithmetically — so the
        video decode path is VALUE-verified, not rows-only."""
        import pandas as _pd

        from ds_discovery_opensearch_taxonomy_spark.functions import (
            minimedia as _mm,
        )

        docs = _docs(spark, sf).select("doc_id").orderBy("doc_id").limit(24)

        def gen(batches):
            import numpy as _np

            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    n = 3 + int(did) % 5
                    frames = []
                    for i in range(n):
                        y = _np.full(
                            (8, 12), 16 + (int(did) + 31 * i) % 220, _np.uint8
                        )
                        u = _np.full((4, 6), 128, _np.uint8)
                        frames.append((y, u, u.copy()))
                    payloads.append(_mm.encode_y4m(frames))
                yield _pd.DataFrame(
                    {
                        "asset_id": pdf["doc_id"],
                        "kind": "video",
                        "payload": payloads,
                    }
                )

        assets = docs.mapInPandas(
            gen, "asset_id long, kind string, payload binary"
        )
        sampled = multimodal.sample_frames(assets, every_n=2)
        return sampled.groupBy("asset_id").agg(
            F.count("*").alias("n_sampled")
        )

    def q_wildcard_overlap(spark, sf):
        # OVERLAPPING patterns compiled in one pooled batch across several
        # categories (regression: first-match expansion dropped terms)
        eng = _engine(spark, sf)
        cats = [
            ("WB", "tab*"),
            ("WN", "table*"),
            ("WX", '"window" NOT tab*'),
        ]
        return run_categories(spark, eng.reader, cats, scored=False).select(
            "category_id", "doc_id"
        )

    def q_field_scoped(spark, sf):  # Q8 field-scoped routing to 2nd field
        return _run(spark, sf, 'LANGREF:en AND "table"').select("doc_id")

    def q_numeric_range_wide(spark, sf):
        # wide virtual clause matching ~every doc — must evaluate
        # DISTRIBUTED (regression: doc_ids were collected to the driver)
        return _run(spark, sf, "NUM_START_DATE:[* TO 20991231]").select("doc_id")

    def q_boost(spark, sf):  # classic ^N boost scales clause scores
        return _run(spark, sf, '"table"^2 OR "window"', scored=True).select(
            "doc_id", F.round("score", 4).alias("score")
        )

    def q_match_all(spark, sf):  # Q11 match-all syntax incl. NOT leg
        return _run(spark, sf, '*:* NOT "vector"').select("doc_id")

    def q_fuzzy(spark, sf):  # classic fuzzy ~N (Levenshtein expansion)
        return _run(spark, sf, "window~1 OR tabel~1").select("doc_id")

    def q_stream_categorise(spark, sf):  # S5/S9: micro-batch daily-update
        """The streaming categoriser (per-batch in-memory index + the
        vectorized evaluator) over the documents table as ONE micro-batch;
        every doc emitted with its sorted matching-category list."""
        from ds_discovery_opensearch_taxonomy_spark.streaming.incremental import (
            categorise_batch,
        )

        base = _engine(spark, sf)  # global index provides the stats snapshot
        eng = TaxonomyEngine(spark, str(base.reader.cat.root), DOCS_CONFIG)
        eng.set_categories(
            [
                {"category_id": "S1", "query_text": '"table" AND "window" NOT "vector"'},
                {"category_id": "S2", "query_text": "quer* OR *ndow"},
                {"category_id": "S3", "query_text": '"table window"'},
            ]
        )
        return categorise_batch(eng, _docs(spark, sf)).select(
            "doc_id", F.array_join("category_ids", ",").alias("cats")
        )

    def q_embedding_near_dup(spark, sf):
        # embedding-cosine near-dup: LSH-bucketed candidate pairs + exact
        # cosine verify.  Injected exact duplicates (vec_id + 1e6) MUST be
        # recalled (identical vectors share every band bucket), so at
        # threshold ~1.0 the result is the exact collinear pair set — a
        # hash-independent DuckDB twin (brute-force cosine over all pairs).
        e = _emb(spark, sf)
        e2 = e.unionByName(
            e.where(F.col("vec_id") < 5).withColumn(
                "vec_id", F.col("vec_id") + 1000000
            )
        )
        # cosine is already 6-rounded inside the operator — no re-round
        # (double rounding flakes the hash gate at 6-digit "..50" values)
        return similarity.embedding_near_dup(
            e2, threshold=0.9999995, bands=4
        ).select("id_a", "id_b", "cosine")

    def q_categorise_all(spark, sf):  # R3/R7/A1: grouped per-doc category sets
        """Index-backed categorise-all: every doc emitted with its sorted
        matching-category list, EMPTY list kept (the reference seeds every
        batch IAID, InMemoryCategoriserRepository.cs:376-394).  Same three
        categories and oracle shape as q_stream_categorise, so the gate
        pins batch-vs-stream agreement too."""
        base = _engine(spark, sf)
        eng = TaxonomyEngine(spark, str(base.reader.cat.root), DOCS_CONFIG)
        eng.set_categories(
            [
                {"category_id": "S1", "query_text": '"table" AND "window" NOT "vector"'},
                {"category_id": "S2", "query_text": "quer* OR *ndow"},
                {"category_id": "S3", "query_text": '"table window"'},
            ]
        )
        return eng.categorise_all().select(
            "doc_id", F.array_join("category_ids", ",").alias("cats")
        )

    def q_incremental_index(spark, sf):  # S5/S8/I7: live-index append path
        """Index maintenance (SURVEY §3.2): build on 80% of docs, APPEND
        the rest through the daily-update path, then run a scored match
        query over the LIVE index — rows and exact BM25 scores must equal
        the oracle over the FULL table (appended postings, folded df,
        updated n/avgdl).  Reference contract: updated docs are
        immediately searchable (OpenSearchIAViewUpdateRepository.cs:32-70)."""
        eng = _incr_engine(spark, sf)
        return run_categories(
            spark, eng.reader, [("q", '"table" AND "window"')], scored=True
        ).select("doc_id", F.round("score", 4).alias("score"))

    def q_compacted_index(spark, sf):  # I6/S8: compaction across a reset
        """Full maintenance cycle (SURVEY §3.2): build 60% + append 20% +
        COMPACT (delta folded into generation-versioned main tables, salt
        renumbered into the dense compacted range, batch-seq counter
        reset) + append 20% post-reset — then a scored match query over
        the live view must equal full-table BM25 exactly (compacted
        postings decode in order, stats_base rolled, post-reset delta
        folds on top)."""
        eng = _cmp_engine(spark, sf)
        return run_categories(
            spark, eng.reader, [("q", '"merge" AND "filter"')], scored=True
        ).select("doc_id", F.round("score", 4).alias("score"))

    def q_results_upsert(spark, sf):  # S7/S8: bucketed results-sink upsert
        """Results sink (S7/S8): two OVERLAPPING batches saved through the
        doc_id-hash-bucketed upsert (engine.save_results) — batch 1 writes
        one category set for doc_id % 3 == 0, batch 2 overwrites
        doc_id % 2 == 0 with different sets.  The final table must show
        last-writer-wins per doc_id (the reference's bulk doc-as-upsert,
        OpenSearchIAViewUpdateRepository.cs:49-70); docs in batch 1 only
        keep their batch-1 sets.  Replaying the probe converges: the same
        two saves always land on the same final content (snapshot numbers
        advance, bucket contents don't)."""
        eng = _engine(spark, sf)
        docs = _docs(spark, sf).select("doc_id")
        b1 = docs.where(F.col("doc_id") % 3 == 0).select(
            "doc_id", F.array(F.lit("A")).alias("category_ids")
        )
        b2 = docs.where(F.col("doc_id") % 2 == 0).select(
            "doc_id",
            F.when(F.col("doc_id") % 4 == 0, F.array(F.lit("B"), F.lit("C")))
            .otherwise(F.array(F.lit("B")))
            .alias("category_ids"),
        )
        eng.save_results(b1)
        eng.save_results(b2)
        return eng.results().select(
            "doc_id", F.array_join("category_ids", ",").alias("cats")
        )

    def q_categorise_from_store(spark, sf):  # A3 + persisted category CRUD
        """Categorise-all driven from the PERSISTED category dimension:
        seed three categories into the index's category store, mutate one
        through the CRUD API, verify the reference's Lock semantics refuse
        an edit to a locked row (MongoCategoryRepository.cs:113-185), then
        categorise every doc from a FRESH engine that loads the store from
        disk — the category set survives engine restarts, and the result
        reflects the post-update queries.  Replays converge (seed
        overwrites; the same mutations land the same final store)."""
        from ds_discovery_opensearch_taxonomy_spark.sources.categories import (
            CategoryLockedError,
        )

        base = _engine(spark, sf)
        root = str(base.reader.cat.root)
        store = TaxonomyEngine(spark, root, DOCS_CONFIG).category_store
        store.seed(
            [
                {"category_id": "P1", "title": "Tables",
                 "query_text": '"table" AND "window"'},
                {"category_id": "P2", "title": "Vectors",
                 "query_text": '"vector"', "locked": True},
                {"category_id": "P3", "title": "Queries",
                 "query_text": "quer*"},
            ],
            overwrite=True,
        )
        store.save(  # unlocked row: update applies (and the query below sees it)
            {"category_id": "P3", "title": "Queries",
             "query_text": 'quer* OR "stream"'}
        )
        try:  # locked row: title/query edits refused while locked
            store.save(
                {"category_id": "P2", "title": "Vectors",
                 "query_text": '"merge"', "locked": True}
            )
            raise AssertionError("locked category update must be refused")
        except CategoryLockedError:
            pass
        fresh = TaxonomyEngine(spark, root, DOCS_CONFIG)  # loads store from disk
        return fresh.categorise_all().select(
            "doc_id", F.array_join("category_ids", ",").alias("cats")
        )

    return {
        "q_match_bool": q_match_bool,
        "q_match_or": q_match_or,
        "q_match_phrase": q_match_phrase,
        "q_match_phrase_slop": q_match_phrase_slop,
        "q_wildcard": q_wildcard,
        "q_term_range": q_term_range,
        "q_date_rewrite": q_date_rewrite,
        "q_id_conjunction": q_id_conjunction,
        "q_search_filtered": q_search_filtered,
        "q_search_filtered_selective": q_search_filtered_selective,
        "q_facets_scoped": q_facets_scoped,
        "q_search_sorted": q_search_sorted,
        "q_numeric_range": q_numeric_range,
        "q_bm25_topk": q_bm25_topk,
        "q_bm25_scores_all": q_bm25_scores_all,
        "q_min_score_pagination": q_min_score_pagination,
        "q_count": q_count,
        "q_facets": q_facets,
        "q_dictionary_stats": q_dictionary_stats,
        "q_doc_stats": q_doc_stats,
        "q_dedup_exact": q_dedup_exact,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_minhash_lsh": q_minhash_lsh,
        "q_simhash": q_simhash,
        "q_similarity_bruteforce": q_similarity_bruteforce,
        "q_similarity_ivf": q_similarity_ivf,
        "q_similarity_lsh": q_similarity_lsh,
        "q_token_counts": q_token_counts,
        "q_quality": q_quality,
        "q_langid": q_langid,
        "q_fingerprint": q_fingerprint,
        "q_multimodal": q_multimodal,
        "q_multimodal_features": q_multimodal_features,
        "q_video_frame_sample": q_video_frame_sample,
        "q_wildcard_overlap": q_wildcard_overlap,
        "q_field_scoped": q_field_scoped,
        "q_numeric_range_wide": q_numeric_range_wide,
        "q_boost": q_boost,
        "q_match_all": q_match_all,
        "q_fuzzy": q_fuzzy,
        "q_stream_categorise": q_stream_categorise,
        "q_embedding_near_dup": q_embedding_near_dup,
        "q_categorise_all": q_categorise_all,
        "q_incremental_index": q_incremental_index,
        "q_compacted_index": q_compacted_index,
        "q_results_upsert": q_results_upsert,
        "q_categorise_from_store": q_categorise_from_store,
    }


def oracle_sql() -> dict[str, str]:
    tok = "string_split(text, ' ')"
    bm25_term = (
        "ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * "
        "tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))"
    )
    bm25_body = f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN ({{terms}})
  GROUP BY 1, 2
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks WHERE term IN ({{terms}}) GROUP BY 1),
scores AS (
  SELECT tf.doc_id, sum({bm25_term}) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1
)
"""

    def bm25(terms: list[str], tail: str) -> str:
        tl = ", ".join(f"'{t}'" for t in terms)
        return _BM25_PRELUDE + bm25_body.format(terms=tl) + tail

    def bm25_weighted(weights: dict[str, float], tail: str) -> str:
        """BM25 with per-term boost multipliers (classic ^N semantics)."""
        tl = ", ".join(f"'{t}'" for t in weights)
        wcase = "CASE tf.term " + " ".join(
            f"WHEN '{t}' THEN {w}" for t, w in weights.items()
        ) + " ELSE 1.0 END"
        body = f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN ({tl})
  GROUP BY 1, 2
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks WHERE term IN ({tl}) GROUP BY 1),
scores AS (
  SELECT tf.doc_id, sum(({wcase}) * {bm25_term}) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1
)
"""
        return _BM25_PRELUDE + body + tail

    dup_base = """
WITH d2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 5)
)
"""

    return {
        "q_match_bool": f"""
            SELECT doc_id FROM documents
            WHERE list_contains({tok}, 'table')
              AND list_contains({tok}, 'window')
              AND NOT list_contains({tok}, 'vector')
        """,
        "q_match_or": f"""
            SELECT doc_id FROM documents
            WHERE list_contains({tok}, 'vector') OR list_contains({tok}, 'stream')
        """,
        "q_match_phrase": """
            SELECT doc_id FROM documents
            WHERE ' ' || text || ' ' LIKE '% table window %'
        """,
        "q_match_phrase_slop": """
            -- slop 2 over ["window","table"]: pick one position per slot,
            -- window = max(pos_w, pos_t - 1) - min(pos_w, pos_t - 1) <= 2
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS term,
                     generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
              FROM documents
            )
            SELECT DISTINCT w.doc_id
            FROM toks w JOIN toks t USING (doc_id)
            WHERE w.term = 'window' AND t.term = 'table'
              AND greatest(w.pos, t.pos - 1) - least(w.pos, t.pos - 1) <= 2
        """,
        "q_wildcard": f"""
            SELECT doc_id FROM documents
            WHERE len(list_filter({tok}, x -> x LIKE 'quer%')) > 0
               OR len(list_filter({tok}, x -> x LIKE '%ndow')) > 0
        """,
        "q_numeric_range": f"""
            SELECT doc_id FROM documents
            WHERE list_contains({tok}, 'table') AND n_chars BETWEEN 200 AND 400
        """,
        "q_term_range": f"""
            SELECT doc_id FROM documents
            WHERE len(list_filter({tok}, x -> x >= 'win' AND x <= 'wing')) > 0
        """,
        "q_date_rewrite": f"""
            SELECT doc_id FROM documents
            WHERE list_contains({tok}, 'table')
              AND (19000101 + (doc_id % 120) * 10000) >= 19800101
        """,
        "q_id_conjunction": bm25(
            ["table"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "WHERE doc_id IN (5, 6, 7, 8, 9)",
        ),
        "q_search_filtered": bm25(
            ["spark"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "JOIN documents USING (doc_id) "
            "WHERE lang = 'en' AND score >= 0.3 "
            "ORDER BY score DESC, doc_id LIMIT 12",
        ),
        "q_search_filtered_selective": bm25(
            ["table", "window"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "JOIN documents USING (doc_id) "
            "WHERE lang = 'de' "
            "ORDER BY score DESC, doc_id LIMIT 15",
        ),
        "q_facets_scoped": f"""
            SELECT lang, count(*) AS count FROM documents
            WHERE list_contains({tok}, 'table')
              AND list_contains({tok}, 'window')
            GROUP BY lang ORDER BY count DESC, lang LIMIT 100
        """,
        "q_search_sorted": f"""
            SELECT doc_id, n_chars FROM documents
            WHERE list_contains({tok}, 'vector')
            ORDER BY n_chars DESC, doc_id LIMIT 12
        """,
        "q_bm25_topk": bm25(
            ["table", "window"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "ORDER BY score DESC, doc_id LIMIT 20",
        ),
        "q_bm25_scores_all": bm25(
            ["group", "batch"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = 'group') "
            "  AND doc_id IN (SELECT doc_id FROM tf WHERE term = 'batch')",
        ),
        "q_min_score_pagination": bm25(
            ["spark"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "WHERE score >= 0.3 ORDER BY score DESC, doc_id LIMIT 15",
        ),
        # incremental maintenance: the engine index was built on 80% of the
        # table and appended with the rest — the oracle is simply full-table
        # BM25, so rows+scores green proves the append folded df/N/avgdl
        "q_incremental_index": bm25(
            ["table", "window"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = 'table') "
            "  AND doc_id IN (SELECT doc_id FROM tf WHERE term = 'window')",
        ),
        # full maintenance cycle: 60% build + append + COMPACT (salt
        # renumber, seq reset) + append — the oracle is again plain
        # full-table BM25, so a green row proves compaction preserves the
        # decode order and the live stats exactly
        "q_compacted_index": bm25(
            ["merge", "filter"],
            "SELECT doc_id, round(score, 4) AS score FROM scores "
            "WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge') "
            "  AND doc_id IN (SELECT doc_id FROM tf WHERE term = 'filter')",
        ),
        "q_results_upsert": """
            -- last-writer-wins per doc_id across the two saved batches
            WITH b1 AS (
              SELECT doc_id, 'A' AS cats FROM documents WHERE doc_id % 3 = 0
            ),
            b2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0 THEN 'B,C' ELSE 'B' END AS cats
              FROM documents WHERE doc_id % 2 = 0
            )
            SELECT doc_id, cats FROM b2
            UNION ALL
            SELECT doc_id, cats FROM b1
            WHERE doc_id NOT IN (SELECT doc_id FROM b2)
        """,
        "q_categorise_from_store": f"""
            -- final persisted set: P1 '"table" AND "window"', P2 '"vector"'
            -- (locked; edit refused), P3 'quer* OR "stream"' (updated)
            SELECT doc_id,
              concat_ws(',',
                CASE WHEN list_contains({tok}, 'table')
                      AND list_contains({tok}, 'window') THEN 'P1' END,
                CASE WHEN list_contains({tok}, 'vector') THEN 'P2' END,
                CASE WHEN len(list_filter({tok}, t -> t LIKE 'quer%')) > 0
                      OR list_contains({tok}, 'stream') THEN 'P3' END
              ) AS cats
            FROM documents
        """,
        "q_count": f"""
            SELECT count(*) AS match_count FROM documents
            WHERE list_contains({tok}, 'merge') OR list_contains({tok}, 'join')
        """,
        "q_facets": """
            SELECT lang, count(*) AS count FROM documents
            GROUP BY lang ORDER BY count DESC, lang LIMIT 100
        """,
        "q_dictionary_stats": """
            SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
            WHERE term IN ('table','window','vector','spark','query','the')
            GROUP BY term
        """,
        "q_doc_stats": """
            SELECT count(*) AS n_docs,
                   round(avg(len(string_split(text, ' '))), 6) AS avgdl
            FROM documents
        """,
        "q_match_all": f"""
            SELECT doc_id FROM documents
            WHERE NOT list_contains({tok}, 'vector')
        """,
        "q_fuzzy": f"""
            SELECT doc_id FROM documents
            WHERE len(list_filter({tok}, x -> levenshtein(x, 'window') <= 1)) > 0
               OR len(list_filter({tok}, x -> levenshtein(x, 'tabel') <= 1)) > 0
        """,
        "q_stream_categorise": f"""
            SELECT doc_id,
                   concat_ws(',',
                     CASE WHEN list_contains({tok}, 'table')
                           AND list_contains({tok}, 'window')
                           AND NOT list_contains({tok}, 'vector')
                          THEN 'S1' END,
                     CASE WHEN len(list_filter({tok}, x -> x LIKE 'quer%')) > 0
                           OR len(list_filter({tok}, x -> x LIKE '%ndow')) > 0
                          THEN 'S2' END,
                     CASE WHEN ' ' || text || ' ' LIKE '% table window %'
                          THEN 'S3' END) AS cats
            FROM documents
        """,
        "q_categorise_all": f"""
            SELECT doc_id,
                   concat_ws(',',
                     CASE WHEN list_contains({tok}, 'table')
                           AND list_contains({tok}, 'window')
                           AND NOT list_contains({tok}, 'vector')
                          THEN 'S1' END,
                     CASE WHEN len(list_filter({tok}, x -> x LIKE 'quer%')) > 0
                           OR len(list_filter({tok}, x -> x LIKE '%ndow')) > 0
                          THEN 'S2' END,
                     CASE WHEN ' ' || text || ' ' LIKE '% table window %'
                          THEN 'S3' END) AS cats
            FROM documents
        """,
        "q_dedup_exact": dup_base + """
            , h AS (SELECT doc_id, sha256(text) AS grp FROM d2),
            sizes AS (SELECT grp, count(*) AS group_size FROM h GROUP BY 1 HAVING count(*) > 1)
            SELECT doc_id, h.grp, group_size FROM h JOIN sizes USING (grp)
        """,
        "q_ngram_jaccard": dup_base + f"""
            , toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM d2),
            grams AS (
              SELECT DISTINCT doc_id, unnest({_TRIGRAM_SQL}) AS shingle FROM toks
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
              FROM grams x JOIN grams y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b,
                   round(shared / (na.n + nb.n - shared), 6) AS jaccard
            FROM inter
            JOIN sizes na ON na.doc_id = a
            JOIN sizes nb ON nb.doc_id = b
            WHERE shared / (na.n + nb.n - shared) >= 0.999
        """,
        "q_similarity_ivf": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS c
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id, c,
                     row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS r
              FROM scored
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine FROM ranked WHERE r <= 5
        """,
        "q_similarity_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS c
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id, c,
                     row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS r
              FROM scored
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine FROM ranked WHERE r <= 5
        """,
        "q_token_counts": """
            SELECT doc_id,
                   len(string_split(text, ' '))::BIGINT AS ws_tokens,
                   len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS subword_tokens
            FROM documents
        """,
        "q_quality": r"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   len(string_split(text, ' '))::BIGINT AS n_tokens,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) /
                         greatest(length(text), 1), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) /
                         greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                         ['the','of','and','to','in','a','is','for','on','with'])) * 1.0 /
                         greatest(len(string_split(text, ' ')), 1), 6) AS stopword_hit_ratio,
                   round((length(text) - len(string_split(text, ' ')) + 1) * 1.0 /
                         greatest(len(string_split(text, ' ')), 1), 6) AS mean_token_len
            FROM documents
        """,
        "q_langid": """
            WITH hits AS (
              SELECT doc_id,
                len(list_intersect(string_split(lower(text), ' '),
                    ['der','die','das','und','nicht','ist','ein','mit','für','von'])) AS de,
                len(list_intersect(string_split(lower(text), ' '),
                    ['the','of','and','to','in','a','is','for','on','with'])) AS en,
                len(list_intersect(string_split(lower(text), ' '),
                    ['el','la','los','y','es','un','una','para','en','que'])) AS es,
                len(list_intersect(string_split(lower(text), ' '),
                    ['le','la','les','et','est','un','une','pour','dans','que'])) AS fr
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                        WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                        WHEN en >= es AND en >= fr THEN 'en'
                        WHEN es >= fr THEN 'es'
                        ELSE 'fr' END AS pred_lang
            FROM hits
        """,
        "q_fingerprint": f"""
            WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
            SELECT doc_id,
                   list_min(list_transform({_TRIGRAM_SQL},
                            g -> md5(g))) AS fingerprint
            FROM toks
        """,
        "q_multimodal": """
            SELECT doc_id AS asset_id,
                   ['text','image','audio','video'][(doc_id % 4) + 1] AS kind,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents
        """,
        "q_video_frame_sample": """
            -- the Spark side DECODES each synthesized Y4M clip and counts
            -- its sampled frames; the oracle recomputes the expected count
            -- arithmetically (frames 0,2,4,... of n = 3 + doc_id % 5)
            SELECT doc_id AS asset_id,
                   CAST((3 + doc_id % 5 + 1) // 2 AS BIGINT) AS n_sampled
            FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 24)
        """,
        "q_multimodal_features": """
            -- entropy over the high nibble of each byte (text is ASCII, so
            -- code points == bytes); single 6-digit rounding on both sides
            WITH nibbles AS (
              SELECT doc_id, unicode(c) // 16 AS nib
              FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                    FROM documents)
            )
            SELECT doc_id AS asset_id,
                   round(entropy(nib), 6) AS byte_entropy
            FROM nibbles GROUP BY doc_id
        """,
        "q_minhash_lsh": dup_base + f"""
            , toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM d2),
            grams AS (
              SELECT DISTINCT doc_id, unnest({_TRIGRAM_SQL}) AS shingle FROM toks
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
              FROM grams x JOIN grams y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b FROM inter
            JOIN sizes na ON na.doc_id = a
            JOIN sizes nb ON nb.doc_id = b
            WHERE shared = na.n AND shared = nb.n
        """,
        "q_simhash": dup_base + """
            , keys AS (
              SELECT doc_id,
                     md5(array_to_string(list_sort(string_split(lower(text), ' ')), chr(10))) AS k
              FROM d2
            )
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM keys x JOIN keys y ON x.k = y.k AND x.doc_id < y.doc_id
        """,
        "q_similarity_lsh": """
            SELECT vec_id AS query_id, vec_id, 1.0 AS cosine
            FROM embeddings WHERE vec_id < 200
        """,
        "q_embedding_near_dup": """
            WITH e2 AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000, embedding FROM embeddings
                WHERE vec_id < 5
            ),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.embedding, b.embedding) /
                       (sqrt(list_dot_product(a.embedding, a.embedding)) *
                        sqrt(list_dot_product(b.embedding, b.embedding))) AS c
                FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 6) AS cosine
            FROM pairs WHERE round(c, 6) >= 0.9999995
        """,
        "q_wildcard_overlap": f"""
            SELECT 'WB' AS category_id, doc_id FROM documents
            WHERE len(list_filter({tok}, x -> x LIKE 'tab%')) > 0
            UNION ALL
            SELECT 'WN', doc_id FROM documents
            WHERE len(list_filter({tok}, x -> x LIKE 'table%')) > 0
            UNION ALL
            SELECT 'WX', doc_id FROM documents
            WHERE list_contains({tok}, 'window')
              AND len(list_filter({tok}, x -> x LIKE 'tab%')) = 0
        """,
        "q_field_scoped": f"""
            SELECT doc_id FROM documents
            WHERE lang = 'en' AND list_contains({tok}, 'table')
        """,
        "q_numeric_range_wide": """
            SELECT doc_id FROM documents
            WHERE (19000101 + (doc_id % 120) * 10000) <= 20991231
        """,
        "q_boost": bm25_weighted(
            {"table": 2.0, "window": 1.0},
            "SELECT doc_id, round(score, 4) AS score FROM scores",
        ),
    }
