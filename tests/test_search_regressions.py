"""Round-2 regression tests (VERDICT.md r1):

* overlapping wildcard patterns across categories (first-match coalesce bug);
* boost ``^N`` multiplies clause scores (classic-parser semantics);
* virtual-only categories (pure metadata query — previously the matching
  doc set was collected to the driver AND evaluation depended on chunk
  co-residents);
* wide numeric range matching ~every doc (driver-collect scale hazard).

All asserted against the independent brute-force oracle.
"""

import math

import pytest

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig
from ds_discovery_opensearch_taxonomy_spark.operators.index_build import build_index
from ds_discovery_opensearch_taxonomy_spark.operators.oracle import (
    OracleIndex,
    build_oracle_doc,
)
from ds_discovery_opensearch_taxonomy_spark.operators.search import (
    IndexReader,
    run_categories,
)
from ds_discovery_opensearch_taxonomy_spark.plans.queryparser import parse_query
from ds_discovery_opensearch_taxonomy_spark.sources.corpus import (
    synthesize_corpus,
    with_doc_ids,
)

TEST_CONFIG = EngineConfig(
    n_term_buckets=2,
    salt_target_postings=64,
    max_salts=8,
    n_eval_bands=2,
    eval_chunk_size=2,  # small chunks: exercise chunk-packing determinism
)

N_DOCS = 300


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("regr_index")
    corpus = with_doc_ids(synthesize_corpus(spark, N_DOCS))
    build_index(spark, corpus, str(out), TEST_CONFIG)
    rows = [r.asDict() for r in corpus.collect()]
    oracle = OracleIndex(
        [
            build_oracle_doc(
                r["doc_id"], r, TEST_CONFIG,
                doc_ref=f'{r["repo"]}/{r["path"]}/{r["commit"]}',
            )
            for r in rows
        ],
        TEST_CONFIG,
    )
    return oracle, IndexReader(spark, str(out), TEST_CONFIG)


def _assert_parity(spark, built, queries, scored=True):
    oracle, reader = built
    res = run_categories(spark, reader, queries, scored=scored).collect()
    got: dict[str, dict[int, float]] = {cid: {} for cid, _ in queries}
    for r in res:
        got[r["category_id"]][r["doc_id"]] = r["score"]
    for cid, qtext in queries:
        expected = dict(oracle.matching_docs(parse_query(qtext, TEST_CONFIG)))
        assert set(got[cid]) == set(expected), (
            f"{cid}: engine={len(got[cid])} oracle={len(expected)}"
        )
        if scored:
            for d, s in expected.items():
                assert math.isclose(got[cid][d], s, rel_tol=1e-9, abs_tol=1e-12)
    return got


def test_overlapping_wildcards_across_categories(spark, built):
    """ship*/shipwreck*-style overlap: several patterns matching the same
    dictionary terms, spread across categories (one under NOT).  The old
    first-match expansion dropped terms from all but one pattern."""
    queries = [
        ("W_BROAD", "ship*"),
        ("W_NARROW", "ships*"),               # subset of W_BROAD's matches
        ("W_PREFIX", "s*"),                    # superset of both
        ("W_NOT", "women NOT ship*"),          # overlap under MUST_NOT
        ("W_Q", "wome* OR women*"),            # overlap within one query
    ]
    _assert_parity(spark, built, queries)
    # sanity: the overlap is actually exercised
    oracle, _ = built
    broad = set(
        d for d, _ in oracle.matching_docs(parse_query("ship*", TEST_CONFIG))
    )
    narrow = set(
        d for d, _ in oracle.matching_docs(parse_query("ships*", TEST_CONFIG))
    )
    assert narrow and narrow <= broad


def test_boost_multiplies_clause_scores(spark, built):
    oracle, reader = built
    base = run_categories(spark, reader, [("B0", "sea OR strike")], scored=True).collect()
    boosted = run_categories(
        spark, reader, [("B1", "sea^3 OR strike")], scored=True
    ).collect()
    base_sc = {r["doc_id"]: r["score"] for r in base}
    boost_sc = {r["doc_id"]: r["score"] for r in boosted}
    assert set(base_sc) == set(boost_sc)
    # docs matching only "sea" see exactly 3x; verify vs oracle everywhere
    _assert_parity(spark, built, [("B1", "sea^3 OR strike")])
    sea = {
        d: s for d, s in oracle.matching_docs(parse_query("sea", TEST_CONFIG))
    }
    strike = {
        d: s for d, s in oracle.matching_docs(parse_query("strike", TEST_CONFIG))
    }
    only_sea = [d for d in sea if d not in strike]
    assert only_sea
    for d in only_sea[:20]:
        assert math.isclose(boost_sc[d], 3.0 * base_sc[d], rel_tol=1e-9)


def test_virtual_only_categories_deterministic(spark, built):
    """Pure-metadata categories (no dictionary-resident terms) must be
    complete and independent of chunk packing (ADVICE r1: results appeared
    or vanished with eval_chunk_size)."""
    queries = [
        ("V_RANGE", "SOURCE:[0 TO 100]"),
        ("V_DATE", "NUM_START_DATE:[19500101 TO *]"),
        ("V_MIX", "women AND SOURCE:[0 TO 100]"),
        ("V_ALLQ", "NUM_START_DATE:[* TO 20991231]"),  # matches every doc
    ]
    got = _assert_parity(spark, built, queries, scored=False)
    assert len(got["V_ALLQ"]) == N_DOCS
    # chunk-packing independence: same results with a different chunk size
    oracle, reader = built
    import dataclasses

    alt = dataclasses.replace(TEST_CONFIG, eval_chunk_size=7)
    res_alt = run_categories(
        spark, reader, queries, scored=False, config=alt
    ).collect()
    got_alt: dict[str, set[int]] = {cid: set() for cid, _ in queries}
    for r in res_alt:
        got_alt[r["category_id"]].add(r["doc_id"])
    for cid, _ in queries:
        assert got_alt[cid] == set(got[cid]), cid
