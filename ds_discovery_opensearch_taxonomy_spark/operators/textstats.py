"""Text-analysis operators for training-data pipelines — all pure JVM-side
expressions (no Python in the hot path), each with a DuckDB-expressible
twin in ``__spark_entry__.oracle_sql`` for the correctness gate.

* token counting      — whitespace tokens + a BPE-ish subword regex count;
* quality scoring     — length / punctuation ratio / stopword ratio /
  alpha ratio / mean token length;
* language ID         — stopword-hit heuristic over {en, de, fr, es};
* fingerprinting      — min-hash document fingerprint over token k-gram
  shingles (portable md5 so SQL oracles reproduce it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ("the", "of", "and", "to", "in", "a", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "para", "en", "que"),
}

#: BPE-ish subword segmentation: letter runs, digit runs, single punctuation
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _toks(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, subword_tokens): whitespace count + BPE-ish
    regex-token count (regexp_count is JVM-side)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(_toks(text_col)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_REGEX)).cast("long").alias(
            "subword_tokens"
        ),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality metrics (the usual pre-training filters)."""
    toks = _toks(text_col)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9\\s]", ""))
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(
            F.size(F.array_intersect(toks, en_stops)) / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("stopword_hit_ratio"),
        F.round(
            (n_chars - F.size(toks) + 1) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("mean_token_len"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en,de,fr,es} with deterministic
    tie-break (score desc, language asc); 'und' when nothing hits."""
    toks = _toks(text_col)
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }
    best = None
    for lang in sorted(STOPWORDS):  # asc tie-break
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best["score"], F.struct(s.alias("score"), F.lit(lang).alias("lang"))).otherwise(best)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["score"].cast("long").alias("stopword_hits"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Document fingerprint = min over token k-gram shingles of md5(shingle)
    (portable rolling-hash stand-in — md5 exists in both Spark and DuckDB,
    so the oracle reproduces it exactly)."""
    toks = _toks(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(grams).alias("fingerprint"),
    )
