"""Brute-force oracle evaluator tests: hand-computed BM25, boolean algebra,
phrases/slop, wildcards, numeric ranges (SURVEY.md §5 items 3-4 base layer)."""

import math

import numpy as np
import pytest

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig, simple_config
from ds_discovery_opensearch_taxonomy_spark.functions import scoring
from ds_discovery_opensearch_taxonomy_spark.operators.oracle import (
    OracleIndex,
    build_oracle_doc,
)
from ds_discovery_opensearch_taxonomy_spark.plans.queryparser import parse_query

CFG = simple_config()


def make_index(texts, config=CFG, ints=None):
    docs = []
    for i, t in enumerate(texts):
        row = {"content": t}
        if ints:
            row.update(ints[i])
        docs.append(build_oracle_doc(i, row, config))
    return OracleIndex(docs, config)


class TestSloppyFreq:
    def test_exact(self):
        # "a b" in "x a b y a b" -> positions a:[1,4] b:[2,5]; adjusted b-1:[1,4]
        slots = [np.array([1, 4]), np.array([1, 4])]
        assert scoring.phrase_freq(slots, 0) == 2.0

    def test_sloppy_window(self):
        # a at 0, b at 3 (adjusted 2): window 2 -> slop 2 matches with 1/(1+2)
        slots = [np.array([0]), np.array([2])]
        assert scoring.phrase_freq(slots, 1) == 0.0
        assert scoring.phrase_freq(slots, 2) == pytest.approx(1 / 3)

    def test_transposed_needs_slop_2(self):
        # doc "pankhurst sylvia": sylvia at 1, pankhurst at 0 (adjusted -1)
        slots = [np.array([1]), np.array([-1])]
        assert scoring.phrase_freq(slots, 1) == 0.0
        assert scoring.phrase_freq(slots, 2) == pytest.approx(1 / 3)


class TestOracleBM25:
    def test_hand_computed_term_score(self):
        idx = make_index(
            [
                "chartism movement grows",          # dl=3, chartism tf=1
                "the chartist movement chartism chartism",  # dl=5, tf=2
                "nothing relevant here at all",     # dl=5
            ]
        )
        node = parse_query('"chartism"', CFG)
        results = dict(idx.matching_docs(node))
        n, avgdl = 3.0, (3 + 5 + 5) / 3.0
        df = 2.0
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

        def tfn(tf, dl):
            return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

        assert results[0] == pytest.approx(idf * tfn(1, 3))
        assert results[1] == pytest.approx(idf * tfn(2, 5))
        assert 2 not in results

    def test_or_and_not(self):
        idx = make_index(
            [
                "ration books issued",
                "rations for the army",
                "rationing ends ADM 101 duty",
                "irrelevant",
            ]
        )
        node = parse_query('"ration" OR "rations" OR "rationing" NOT "ADM 101"', CFG)
        ids = [d for d, _ in idx.matching_docs(node)]
        assert sorted(ids) == [0, 1]

    def test_and_requires_both(self):
        idx = make_index(
            ["women suffrage now", "women vote", "suffrage only", "woman franchise"]
        )
        node = parse_query(
            "((women OR woman) AND (suffrage OR franchise))", CFG
        )
        ids = sorted(d for d, _ in idx.matching_docs(node))
        assert ids == [0, 3]

    def test_phrase_and_slop(self):
        idx = make_index(
            [
                "votes for women",
                "votes given to women",
                "women votes",
                "votes for the cause",
            ]
        )
        exact = parse_query('"votes for women"', CFG)
        assert [d for d, _ in idx.matching_docs(exact)] == [0]
        sloppy = parse_query('"votes women"~2', CFG)
        ids = sorted(d for d, _ in idx.matching_docs(sloppy))
        assert ids == [0, 1, 2]  # doc1 window 2; doc2 transposed window 2

    def test_wildcard(self):
        idx = make_index(["freemason lodge", "freemasonry history", "free man"])
        node = parse_query("freemason*", CFG)
        ids = sorted(d for d, _ in idx.matching_docs(node))
        assert ids == [0, 1]
        lead = parse_query("*masonry", CFG)
        assert [d for d, _ in idx.matching_docs(lead)] == [1]

    def test_multi_token_expansion_matches_parts(self):
        # doc has "tEst" -> terms test/t/est/test; query bare term "tEst"
        idx = make_index(["tEst data", "est only", "unrelated"])
        node = parse_query("tEst", CFG)
        ids = sorted(d for d, _ in idx.matching_docs(node))
        assert ids == [0, 1]

    def test_numeric_range(self):
        cfg = simple_config()
        idx = make_index(
            ["a doc", "b doc", "c doc"],
            config=cfg,
            ints=[
                {"NUM_START_DATE": 19380101},
                {"NUM_START_DATE": 19400101},
                {"NUM_START_DATE": 19500101},
            ],
        )
        node = parse_query('doc AND START_DATE:{1939-01-01 TO *}', cfg)
        ids = sorted(d for d, _ in idx.matching_docs(node))
        assert ids == [1, 2]

    def test_pure_negative_matches_nothing(self):
        idx = make_index(["a", "b"])
        node = parse_query('NOT "a"', CFG)
        assert idx.matching_docs(node) == []

    def test_ranking_tie_break(self):
        idx = make_index(["same text", "same text", "other words"])
        node = parse_query('"same"', CFG)
        assert [d for d, _ in idx.matching_docs(node)] == [0, 1]


class TestFieldRouting:
    def test_catdocref_field(self):
        cfg = EngineConfig()
        docs = [
            build_oracle_doc(
                0,
                {"content": "war office records", "path": "WO 372/1"},
                cfg,
            ),
            build_oracle_doc(
                1,
                {"content": "admiralty records WO 372", "path": "ADM 101/2"},
                cfg,
            ),
        ]
        idx = OracleIndex(docs, cfg)
        node = parse_query('CATDOCREF:"WO 372"', cfg)
        assert [d for d, _ in idx.matching_docs(node)] == [0]
        # unqualified text hits the copy_to field (content + path)
        node2 = parse_query('"WO 372"', cfg)
        assert sorted(d for d, _ in idx.matching_docs(node2)) == [0, 1]

    def test_case_sensitive_field(self):
        cfg = EngineConfig()
        docs = [
            build_oracle_doc(0, {"content": "the LOCOG games", "path": "x"}, cfg),
            build_oracle_doc(1, {"content": "locog lowercase", "path": "x"}, cfg),
        ]
        idx = OracleIndex(docs, cfg)
        node = parse_query("textcasnopunc:LOCOG", cfg)
        assert [d for d, _ in idx.matching_docs(node)] == [0]


class TestReferenceAirForceDoc:
    """Mirror of the reference's only real assertion: the AIR 37/177 document
    matches category 'Air Force' (ElasticCategoriserRepositoryTest.cs:28-243)."""

    DOC = (
        'CHIEF OF STAFF, SUPREME ALLIED COMMAND: Operation "Round-up": '
        "operational organisation of RAF. Air Ministry: Allied Expeditionary "
        "Air Force, later Supreme Headquarters Allied Expeditionary Force "
        "(Air), and 2nd Tactical Air Force: Registered Files and Reports. "
        "AIR 37/177"
    )

    def test_air_force_category_matches(self):
        import json
        from pathlib import Path

        cats = json.loads(
            (Path(__file__).parent.parent / "fixtures" / "categories.json").read_text()
        )
        air_force = next(c for c in cats if c["title"] == "Air Force")
        cfg = EngineConfig()
        docs = [
            build_oracle_doc(0, {"content": self.DOC, "path": "AIR 37/177"}, cfg),
            build_oracle_doc(1, {"content": "nothing to see", "path": "ZZ 1"}, cfg),
        ]
        idx = OracleIndex(docs, cfg)
        node = parse_query(air_force["query_text"], cfg)
        ids = [d for d, _ in idx.matching_docs(node)]
        assert 0 in ids
        assert 1 not in ids
