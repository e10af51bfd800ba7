"""Deterministic corpus synthesis + category loading.

The engine's input is an Iceberg/parquet table of source-code rows
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).  For
tests/benchmarks we synthesize it deterministically (seed folded into
xxhash64 literals — no RNG at runtime, FIXTURES.md §1) entirely with JVM-side
expressions over ``spark.range(n)``: content words are drawn from the
category-query vocabulary so every fixture query has a non-empty match set,
and analyzer-stress fragments (hyphens, acronyms, possessives, diacritics)
are injected at a fixed hash-gated rate.

Row 0 is the reference test document verbatim
(ElasticCategoriserRepositoryTest.cs:166-179) so the reference's
"matches category 'Air Force'" assertion carries over.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

AIR_DOC = (
    'CHIEF OF STAFF, SUPREME ALLIED COMMAND: Operation "Round-up": '
    "operational organisation of RAF. Air Ministry: Allied Expeditionary "
    "Air Force, later Supreme Headquarters Allied Expeditionary Force "
    "(Air), and 2nd Tactical Air Force: Registered Files and Reports. "
    "AIR 37/177"
)

#: the 136 reference category queries ship INSIDE the package (package
#: data) so a ``spark-submit --py-files pkg.zip`` deployment carries them;
#: ``load_categories`` reads them through importlib.resources, which
#: resolves from a zipimported package as well as a checkout.
_FIXTURE_RESOURCE = "fixtures/categories.json"

#: analyzer-stress fragments (FIXTURES.md §1) — exercise hyphen/acronym/
#: possessive/diacritic/case handling and guarantee phrase matches
STRESS_FRAGMENTS = (
    "Czech-oslovakia",
    "E.E.C",
    "women's suffrage",
    "Ottom?n Empire",
    "Ottomán Empire",
    "votes for women",
    "sylvia pankhurst",
    "emmeline pankhurst spoke",
    "chartist movement",
    "unidentified flying object",
    "Royal Artillery barracks",
    "WO 372",
    "HCA 42",
    "ADM 101",
    "SC 8",
    "AIR 37/177",
    "tEst MELODY archiveS",
    "AT&T contract",
    "O'Neil's report",
    "PowerShot camera",
    "wi-fi-2000 device",
    "1,000 rations",
)

_WORD_RE = re.compile(r"[a-z][a-z0-9]{2,}")

GENERIC_WORDS = (
    "the of and to in a is for on with by from at this that def return "
    "class import function value table query index spark merge filter "
    "partition shuffle column row batch stream window sort hash join"
).split()

_DEPTS = ("WO", "ADM", "AIR", "HO", "MEPO", "HCA", "SC", "MAF", "FO", "CAB")
_LANGS = ("python", "java", "csharp", "go", "sql", "md")
_EXTS = {"python": "py", "java": "java", "csharp": "cs", "go": "go", "sql": "sql", "md": "md"}


def load_categories(path: str | Path | None = None) -> list[dict]:
    if path is not None:
        return json.loads(Path(path).read_text())
    from importlib import resources

    root = resources.files(__package__.split(".", 1)[0])
    return json.loads(root.joinpath(_FIXTURE_RESOURCE).read_text())


def query_vocabulary(max_words: int = 320) -> list[str]:
    """Deterministic vocabulary drawn from the 136 category queries: the
    most frequent lowercase words plus generic filler."""
    freq: dict[str, int] = {}
    for c in load_categories():
        for w in _WORD_RE.findall(c["query_text"].lower()):
            if w in ("and", "not", "catdocref", "textcasnopunc", "textcaspunc"):
                continue
            freq[w] = freq.get(w, 0) + 1
    ranked = sorted(freq, key=lambda w: (-freq[w], w))[: max_words - len(GENERIC_WORDS)]
    return list(GENERIC_WORDS) + ranked


def _pick(arr_col, hash_col):
    return F.element_at(arr_col, (F.pmod(hash_col, F.size(arr_col)) + 1).cast("int"))


def synthesize_corpus(
    spark: SparkSession,
    n_rows: int,
    min_words: int = 12,
    max_words: int = 48,
    fragment_rate: int = 4,
    identifier_rate: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the (repo, path, commit, lang, content, NUM_START_DATE,
    NUM_END_DATE, SOURCE) corpus; fully JVM-side (one xxhash64 per word slot,
    codegen'd — no Python in the generation path)."""
    vocab = query_vocabulary()
    vocab_col = F.array(*[F.lit(w) for w in vocab])
    frag_col = F.array(*[F.lit(f) for f in STRESS_FRAGMENTS])
    dept_col = F.array(*[F.lit(d) for d in _DEPTS])
    lang_col = F.array(*[F.lit(lang) for lang in _LANGS])
    ext_col = F.array(*[F.lit(_EXTS[lang]) for lang in _LANGS])

    # explicit partition count: a corpus parquet written from few partitions
    # has few row groups, and row groups are the read-split unit — they cap
    # every downstream stage's parallelism no matter the core count
    df = spark.range(
        0, n_rows, 1, num_partitions or max(spark.sparkContext.defaultParallelism, 32)
    ).withColumnRenamed("id", "i")
    h = lambda *cols: F.xxhash64(F.lit(SEED), *cols)  # noqa: E731

    n_words = (F.pmod(h(F.col("i"), F.lit("len")), F.lit(max_words - min_words + 1)) + min_words).cast("int")

    # one higher-order expression regardless of max_words (a per-slot column
    # list stops codegen'ing around ~100 slots and bench docs are 100s of
    # words — realistic source-file length)
    def slot_word(k):
        query_word = _pick(vocab_col, h(F.col("i"), F.lit("w"), k))
        if identifier_rate <= 0:
            return query_word
        # heavy-tailed identifier vocabulary (~Zipf: value uniform in
        # [0, m), m uniform — P(v) ~ ln(V/v)), letters-only so the analyzer
        # sees a simple token.  Models source code: a small head of common
        # keywords + a long tail of identifiers; without it every term in a
        # long doc is stopword-class (df ≈ N), which no real corpus has.
        zipf = F.pmod(
            h(F.col("i"), F.lit("zv"), k),
            F.pmod(h(F.col("i"), F.lit("zm"), k), F.lit(49999)) + 1,
        )
        ident = F.concat(
            F.lit("x"), F.translate(zipf.cast("string"), "0123456789", "abcdefghij")
        )
        return F.when(
            F.pmod(h(F.col("i"), F.lit("sel"), k), F.lit(10)) < identifier_rate,
            ident,
        ).otherwise(query_word)

    base_text = F.array_join(
        F.transform(F.sequence(F.lit(0), n_words - 1), slot_word), " "
    )
    frag = F.when(
        F.pmod(h(F.col("i"), F.lit("fraggate")), F.lit(fragment_rate)) == 0,
        _pick(frag_col, h(F.col("i"), F.lit("frag"))),
    ).otherwise(F.lit(""))
    content = F.when(F.col("i") == 0, F.lit(AIR_DOC)).otherwise(
        F.trim(F.concat_ws(" ", base_text, frag))
    )

    lang_idx = F.pmod(F.col("i"), F.lit(len(_LANGS)))
    lang = F.element_at(lang_col, (lang_idx + 1).cast("int"))
    ext = F.element_at(ext_col, (lang_idx + 1).cast("int"))
    dept = _pick(dept_col, h(F.col("i"), F.lit("dept")))
    dept_num = F.pmod(h(F.col("i"), F.lit("dnum")), F.lit(400)) + 1
    word_dir = _pick(vocab_col, h(F.col("i"), F.lit("dir")))
    path = F.when(F.col("i") == 0, F.lit("AIR_37/177/readme.md")).otherwise(
        F.concat(
            F.lit("src/"), dept, F.lit("_"), dept_num, F.lit("/"), word_dir, F.lit("."), ext
        )
    )
    start = (F.lit(1900) + F.pmod(h(F.col("i"), F.lit("y0")), F.lit(100))) * 10000 + 101
    end = start + 50000

    return (
        df.select(
            F.concat(
                F.lit("org"), F.pmod(F.col("i"), F.lit(7)), F.lit("/repo"), F.pmod(F.col("i"), F.lit(23))
            ).alias("repo"),
            path.alias("path"),
            F.sha1(F.concat(F.lit("c"), F.col("i"))).alias("commit"),
            lang.alias("lang"),
            content.alias("content"),
            start.cast("int").alias("NUM_START_DATE"),
            end.cast("int").alias("NUM_END_DATE"),
            F.pmod(h(F.col("i"), F.lit("src")), F.lit(200)).cast("int").alias("SOURCE"),
        )
    )


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """doc_id = xxhash64(repo, path, commit); content_sha = per-row
    invariant vs the generating corpus (BASELINE.json input_hint)."""
    return corpus.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
