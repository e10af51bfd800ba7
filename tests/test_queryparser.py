"""Query-compile golden tests (SURVEY.md §5 item 2) for the classic-parser
port, pinned against the fixture queries in FIXTURES.md."""

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig
from ds_discovery_opensearch_taxonomy_spark.plans.queryparser import (
    BoolNode,
    IntRangeNode,
    Occur,
    OrTermsNode,
    PhraseNode,
    TermNode,
    WildcardNode,
    parse_query,
    rewrite_dates,
)

CFG = EngineConfig()
DF = CFG.default_field


def occurs(node):
    assert isinstance(node, BoolNode)
    return [o for o, _ in node.clauses]


class TestBasics:
    def test_single_phrase_single_token(self):
        assert parse_query('"chartism"') == TermNode(DF, "chartism")

    def test_or_of_phrases(self):
        # C10011 Chartism
        n = parse_query('"chartism" OR "chartist movement"')
        assert isinstance(n, BoolNode)
        assert occurs(n) == [Occur.SHOULD, Occur.SHOULD]
        assert n.clauses[0][1] == TermNode(DF, "chartism")
        assert n.clauses[1][1] == PhraseNode(DF, (("chartist",), ("movement",)), 0)

    def test_not_with_field_scope(self):
        # C10041 Freemasons
        n = parse_query('freemason* OR "masonic" NOT CATDOCREF: "HCA 42"')
        assert occurs(n) == [Occur.SHOULD, Occur.SHOULD, Occur.MUST_NOT]
        assert n.clauses[0][1] == WildcardNode(DF, "freemason*")
        assert n.clauses[1][1] == TermNode(DF, "masonic")
        assert n.clauses[2][1] == PhraseNode("CATDOCREF", (("hca",), ("42",)), 0)

    def test_and_promotes_previous(self):
        n = parse_query("women AND suffrage OR franchise")
        assert occurs(n) == [Occur.MUST, Occur.MUST, Occur.SHOULD]

    def test_grouping(self):
        n = parse_query("(women OR woman) AND (suffrage OR franchise)")
        assert occurs(n) == [Occur.MUST, Occur.MUST]
        left = n.clauses[0][1]
        assert isinstance(left, BoolNode)
        assert [c[1] for c in left.clauses] == [
            TermNode(DF, "women"),
            TermNode(DF, "woman"),
        ]

    def test_phrase_slop(self):
        n = parse_query('"sylvia pankhurst"~5')
        assert n == PhraseNode(DF, (("sylvia",), ("pankhurst",)), 5)

    def test_field_scoped_term(self):
        n = parse_query('textcaspunc:"arsenal"')
        assert n == TermNode("textcaspunc", "arsenal")

    def test_case_sensitive_field(self):
        n = parse_query("textcasnopunc:LOCOG")
        assert n == TermNode("textcasnopunc", "LOCOG")

    def test_wildcard_question_in_phrase_is_not_wildcard(self):
        # C10131 "Ottom?n Empire" — '?' is punctuation inside a phrase
        n = parse_query('"Ottom?n Empire"')
        assert n == PhraseNode(DF, (("ottom",), ("n",), ("empire",)), 0)

    def test_leading_wildcard_allowed(self):
        n = parse_query("*ship?")
        assert n == WildcardNode(DF, "*ship?")

    def test_multi_token_unquoted_term_flattens_to_or(self):
        n = parse_query("tEst")
        assert n == OrTermsNode(DF, ("test", "t", "est", "test"))


class TestDatesAndRanges:
    def test_date_rewrite(self):
        assert (
            rewrite_dates("START_DATE:{1939-01-01 TO *}")
            == "NUM_START_DATE:[19390101 TO *]"
        )
        assert (
            rewrite_dates("END_DATE:{* TO 1945-12-31}")
            == "NUM_END_DATE:[* TO 19451231]"
        )

    def test_numeric_range_open_end(self):
        n = parse_query("NUM_START_DATE:[19390101 TO *]")
        assert n == IntRangeNode("NUM_START_DATE", 19390101, None, True, True)

    def test_date_query_end_to_end(self):
        n = parse_query('"blitz" AND START_DATE:{1939-01-01 TO *}')
        assert occurs(n) == [Occur.MUST, Occur.MUST]
        assert n.clauses[1][1] == IntRangeNode(
            "NUM_START_DATE", 19390101, None, True, True
        )

    def test_source_numeric_range(self):
        n = parse_query("SOURCE:[100 TO 200]")
        assert n == IntRangeNode("SOURCE", 100, 200, True, True)


class TestFixtureQueries:
    def test_votes_for_women(self):
        # C10113 — the gnarliest fixture query shape
        q = (
            '"suffragette" OR "suffragettes" OR "suffragist" OR "suffragists" '
            'OR "votes for women" OR ("sylvia pankhurst"~5) OR '
            '("emmeline pankhurst"~5) OR ((women OR woman OR womans OR womens) '
            "AND (suffrage OR franchise OR enfranchise)) "
            'NOT CATDOCREF: "SC 8"'
        )
        n = parse_query(q)
        assert occurs(n) == [Occur.SHOULD] * 8 + [Occur.MUST_NOT]
        assert n.clauses[4][1] == PhraseNode(
            DF, (("votes",), ("for",), ("women",)), 0
        )
        nested = n.clauses[7][1]
        assert isinstance(nested, BoolNode)
        assert occurs(nested) == [Occur.MUST, Occur.MUST]

    def test_all_136_fixture_queries_parse(self):
        import json
        from pathlib import Path

        fixture = Path(__file__).parent.parent / "fixtures" / "categories.json"
        cats = json.loads(fixture.read_text())
        assert len(cats) == 136
        for c in cats:
            node = parse_query(c["query_text"])
            assert node is not None, c["category_id"]
