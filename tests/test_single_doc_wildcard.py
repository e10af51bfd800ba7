"""Daily-update wildcard semantics: an ad-hoc doc containing a wildcard-
matching term the INDEX has never seen must still match (the reference
expands multi-term queries against the transient per-doc index)."""

import pytest

from ds_discovery_opensearch_taxonomy_spark.config import EngineConfig, FieldSpec
from ds_discovery_opensearch_taxonomy_spark.engine import TaxonomyEngine
from ds_discovery_opensearch_taxonomy_spark.sources.corpus import with_doc_ids

CFG = EngineConfig(
    fields=(FieldSpec("textnocasnopunc", "textnocasnopunc", ("content",)),),
    n_term_buckets=2,
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        [
            ("r", "a.py", "c1", "py", "freemason lodge records"),
            ("r", "b.py", "c2", "py", "nothing relevant"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    out = tmp_path_factory.mktemp("widx")
    return TaxonomyEngine.build(spark, with_doc_ids(corpus), str(out), CFG)


def test_unseen_wildcard_term_matches_single_doc(engine):
    engine.set_categories(
        [{"category_id": "CW", "title": "W", "query_text": "freemason*"}]
    )
    # "freemasonry" is NOT in the index dictionary (corpus only has
    # "freemason"), but matches the wildcard for this new doc
    out = engine.categorise_docs([{"content": "freemasonry history"}])
    assert [c["category_id"] for c in out[0]["categories"]] == ["CW"]
    # non-matching doc stays empty
    out2 = engine.categorise_docs([{"content": "free thinking"}])
    assert out2[0]["categories"] == []


def test_indexed_wildcard_term_still_matches(engine):
    engine.set_categories(
        [{"category_id": "CW", "title": "W", "query_text": "freemason*"}]
    )
    out = engine.categorise_docs([{"content": "the freemason meets"}])
    assert [c["category_id"] for c in out[0]["categories"]] == ["CW"]
