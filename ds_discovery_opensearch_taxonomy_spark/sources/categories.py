"""Persistent category dimension — the Mongo category collection analogue.

Mirrors the reference's category CRUD surface
(``Taxonomy.Common/Domain/Repository/Mongo/MongoCategoryRepository.cs:113-185``,
``tna.taxonomy.api/Controllers/CategoriesController.cs:27-143``):

* ``add(title, query_text, score, locked)`` — rejects duplicate titles
  (CategoryAlreadyExistsException analogue) and allocates the next
  ``C%05d`` id from the highest existing one (AddNewCategory:153-173);
* ``save(cat)`` — updates title/query_text/score of an EXISTING category
  (CategoryNotFoundException analogue otherwise; Save:137-151).  The
  reference carries a ``Lock`` flag but never enforces it (FindCategories
  even hard-codes ``Lock = false``); here the flag is made meaningful:
  a locked category refuses query/title updates until unlocked — the
  behaviour the flag exists for;
* ``find(search_text)`` — case-insensitive title substring, title-sorted
  (FindCategories:113-117);
* ``find_by_id`` / ``find_by_title`` — FindByCiaid/FindByTitle:119-135.

Storage is one JSON document under the index root written with the same
tmp-file + ``os.replace`` protocol as the catalog manifest: the dimension
is tiny (hundreds of rows — it broadcasts whole into every query compile),
so a driver-side atomic document IS the right distribution story; Spark
tables are for the 10^12-row fact side.  ``TaxonomyEngine.build`` seeds the
store from the bundled fixture so every index carries its own category
dimension from day one.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

_FIELDS = ("category_id", "title", "query_text", "score", "locked")


class CategoryLockedError(RuntimeError):
    pass


class CategoryNotFoundError(KeyError):
    pass


class CategoryExistsError(ValueError):
    pass


class CategoryStore:
    """Atomic-document store of the category dimension for one index."""

    FILENAME = "categories.json"

    def __init__(self, index_root: str | Path):
        self.path = Path(index_root) / self.FILENAME

    # -- io -------------------------------------------------------------------

    def exists(self) -> bool:
        return self.path.exists()

    def _read(self) -> list[dict]:
        if not self.path.exists():
            raise CategoryNotFoundError(
                f"no category store at {self.path} — seed() it first"
            )
        return json.loads(self.path.read_text())

    def _write(self, cats: list[dict]) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(cats, indent=1, sort_keys=True))
        os.replace(tmp, self.path)

    def seed(self, cats: list[dict], overwrite: bool = False) -> None:
        """Initialize the store (idempotent unless ``overwrite``)."""
        if self.path.exists() and not overwrite:
            return
        self._write([self._norm(c) for c in cats])

    @staticmethod
    def _norm(c: dict) -> dict:
        return {
            "category_id": str(c["category_id"]),
            "title": str(c["title"]),
            "query_text": str(c["query_text"]),
            "score": float(c.get("score", 0.0)),
            "locked": bool(c.get("locked", False)),
        }

    # -- queries ----------------------------------------------------------------

    def list_all(self) -> list[dict]:
        return self._read()

    def find(self, search_text: str) -> list[dict]:
        s = search_text.lower()
        return sorted(
            (c for c in self._read() if s in c["title"].lower()),
            key=lambda c: c["title"],
        )

    def find_by_id(self, category_id: str) -> dict:
        for c in self._read():
            if c["category_id"] == category_id:
                return c
        raise CategoryNotFoundError(category_id)

    def find_by_title(self, title: str) -> dict | None:
        for c in self._read():
            if c["title"] == title:
                return c
        return None

    # -- mutations ----------------------------------------------------------------

    def add(
        self,
        title: str,
        query_text: str,
        score: float = 0.0,
        locked: bool = False,
    ) -> dict:
        """New category under the next ``C%05d`` id; duplicate titles are
        rejected (AddNewCategory:153-173)."""
        cats = self._read()
        if any(c["title"] == title for c in cats):
            raise CategoryExistsError(title)
        top = max(
            (int(c["category_id"][1:]) for c in cats
             if c["category_id"][:1] == "C" and c["category_id"][1:].isdigit()),
            default=0,
        )
        new = self._norm(
            {
                "category_id": f"C{top + 1:05d}",
                "title": title,
                "query_text": query_text,
                "score": score,
                "locked": locked,
            }
        )
        self._write(cats + [new])
        return new

    def save(self, cat: dict) -> None:
        """Update an existing category by id (Save:137-151).  A locked row
        refuses title/query changes until unlocked (``locked: False`` in
        the update releases the lock and applies atomically)."""
        new = self._norm(cat)
        cats = self._read()
        for i, c in enumerate(cats):
            if c["category_id"] == new["category_id"]:
                if c["locked"] and new["locked"] and (
                    new["title"] != c["title"]
                    or new["query_text"] != c["query_text"]
                ):
                    raise CategoryLockedError(new["category_id"])
                cats[i] = new
                self._write(cats)
                return
        raise CategoryNotFoundError(new["category_id"])
