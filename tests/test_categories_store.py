"""Persistent category dimension CRUD (sources/categories.py) — the
MongoCategoryRepository.cs:113-185 / CategoriesController.cs:27-143
analogue.  Pure driver-side: no SparkSession."""

from __future__ import annotations

import json

import pytest

from ds_discovery_opensearch_taxonomy_spark.sources.categories import (
    CategoryExistsError,
    CategoryLockedError,
    CategoryNotFoundError,
    CategoryStore,
)

SEED = [
    {"category_id": "C10001", "title": "Air Force", "query_text": '"air force"',
     "score": 0.5, "locked": False},
    {"category_id": "C10002", "title": "Army", "query_text": "army",
     "score": 0.0, "locked": True},
]


@pytest.fixture
def store(tmp_path):
    s = CategoryStore(tmp_path)
    s.seed(SEED)
    return s


def test_seed_idempotent(store, tmp_path):
    store.seed([{"category_id": "CX", "title": "X", "query_text": "x"}])
    assert len(store.list_all()) == 2  # second seed is a no-op
    assert json.loads((tmp_path / "categories.json").read_text())


def test_find_is_case_insensitive_substring_title_sorted(store):
    assert [c["title"] for c in store.find("AR")] == ["Army"]
    assert [c["title"] for c in store.find("a")] == ["Air Force", "Army"]
    assert store.find_by_id("C10002")["title"] == "Army"
    assert store.find_by_title("Nope") is None
    with pytest.raises(CategoryNotFoundError):
        store.find_by_id("C99999")


def test_add_allocates_next_id_and_rejects_dup_title(store):
    new = store.add("Navy", "navy OR ships", score=1.0)
    assert new["category_id"] == "C10003"  # max existing + 1, C%05d
    assert store.find_by_id("C10003")["query_text"] == "navy OR ships"
    with pytest.raises(CategoryExistsError):
        store.add("Navy", "different query")


def test_save_updates_and_requires_existing(store):
    c = store.find_by_id("C10001")
    c["query_text"] = '"air force" OR raf'
    store.save(c)
    assert store.find_by_id("C10001")["query_text"] == '"air force" OR raf'
    with pytest.raises(CategoryNotFoundError):
        store.save({"category_id": "C99999", "title": "x", "query_text": "y"})


def test_locked_category_refuses_query_change_until_unlocked(store):
    locked = store.find_by_id("C10002")
    locked["query_text"] = "army OR soldiers"
    with pytest.raises(CategoryLockedError):
        store.save(locked)
    # score-only updates pass through the lock
    score_only = store.find_by_id("C10002")
    score_only["score"] = 2.0
    store.save(score_only)
    assert store.find_by_id("C10002")["score"] == 2.0
    # unlocking in the update releases it and applies atomically
    locked["locked"] = False
    store.save(locked)
    assert store.find_by_id("C10002")["query_text"] == "army OR soldiers"


def test_cli_categories_roundtrip(tmp_path, capsys):
    from ds_discovery_opensearch_taxonomy_spark.cli import main

    CategoryStore(tmp_path).seed(SEED)
    assert main(["categories", "add", "--index", str(tmp_path),
                 "--title", "Navy", "--query", "navy"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["category_id"] == "C10003"
    assert main(["categories", "search", "--index", str(tmp_path),
                 "--text", "nav"]) == 0
    found = json.loads(capsys.readouterr().out)
    assert [c["title"] for c in found] == ["Navy"]
