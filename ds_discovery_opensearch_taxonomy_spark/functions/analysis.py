"""Analyzer chains — pure-Python/NumPy re-implementation of the reference's
Lucene.NET analyzers, used both driver-side (query analysis) and inside
Arrow-vectorized pandas UDFs (index build).

Reference chains (Taxonomy.Common/Domain/Repository/Lucene/Analyzer/*.cs;
filter args LuceneHelperTools.cs:203-227):

* ``textnocasnopunc`` (production default, appsettings.json:123):
  ClassicTokenizer -> WordDelimiterFilter(preserveOriginal=1,
  generateWordParts=1, catenateWords=1, + factory defaults
  generateNumberParts=1, splitOnCaseChange=1, splitOnNumerics=1,
  stemEnglishPossessive=1) -> EnglishPossessiveFilter -> ASCIIFoldingFilter
  -> LowerCaseFilter              (IAViewTextNoCasNoPuncAnalyser.cs:65-91)
* ``text_gen``: same but folding AFTER lowercasing
                                  (IAViewTextGenAnalyser.cs:66-89)
* ``textcasnopunc``: no LowerCaseFilter (IAViewTextCasNoPuncAnalyser.cs:66-90)
* ``textcaspunc``: WhitespaceTokenizer -> StopFilter(stopwords.txt)
                                  (IAViewTextCasPuncAnalyser.cs:60-87)
  ``stopwords.txt`` does not exist in the reference repo, so the stop set is
  empty (inert) — same treatment as synonyms (SURVEY.md §1.4).

SynonymFilter is only wired for AnalyzerType.QUERY but DI registers INDEX
analyzers for both paths (LuceneHelperTools.cs:231-273), so synonyms are
inert; we keep no synonym hook in the hot path.

Pinned Lucene semantics (golden-tested in tests/test_analysis.py):

ClassicTokenizer (Lucene 4.8 classic JFlex grammar): longest match among
ALPHANUM / APOSTROPHE / ACRONYM / COMPANY / EMAIL / HOST / NUM; CJK chars
one token each; everything else is a delimiter.  NUM allows segments joined
by ``[._/,-]`` where no two adjacent segments are digit-free; HOST allows
only ``.`` separators; ACRONYM is letter-dot pairs (keeps its dots — the
reference does NOT apply ClassicFilter).

WordDelimiterFilter emission order/positions (pinned to observed Lucene 4.8
behavior): original first at position p (preserveOriginal, only when the
token is not already a single spanning subword), parts at p, p+1, ...,
catenated word at the position of the LAST part of its alpha run.
stemEnglishPossessive strips a trailing ``'s`` from each subword.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from ds_discovery_opensearch_taxonomy_spark.config import (
    TEXT_CAS_NO_PUNC,
    TEXT_CAS_PUNC,
    TEXT_GEN,
    TEXT_NO_CAS_NO_PUNC,
)

# ---------------------------------------------------------------------------
# ClassicTokenizer
# ---------------------------------------------------------------------------

_LETTER = r"[^\W\d_]"
_ALNUM = r"[^\W_]"

# Order matters: Python's regex alternation is first-match, so supersets and
# longer shapes come first; the HOSTNUM superset is post-validated against
# the HOST/NUM grammar and re-scanned when invalid (see _split_hostnum).
_MASTER = re.compile(
    rf"(?P<EMAIL>{_ALNUM}+(?:[.\-_]{_ALNUM}+)*@{_ALNUM}+(?:[.\-]{_ALNUM}+)+)"
    rf"|(?P<HOSTNUM>{_ALNUM}+(?:[._/,\-]{_ALNUM}+)+)"
    rf"|(?P<APOS>{_LETTER}+(?:['’]{_LETTER}+)+)"
    rf"|(?P<COMPANY>{_LETTER}+[&@]{_LETTER}+)"
    rf"|(?P<ACRONYM>{_LETTER}\.(?:{_LETTER}\.)+)"
    rf"|(?P<ALPHANUM>{_ALNUM}+)"
    rf"|(?P<CJK>[぀-㆏㌀-㍿㐀-䶿一-鿿豈-﫿])",
    re.UNICODE,
)

_HOST_OK = re.compile(rf"^{_ALNUM}+(?:\.{_ALNUM}+)+$")
_ACRO_SHAPE = re.compile(rf"^{_LETTER}(?:\.{_LETTER})+$")
_SEG_SPLIT = re.compile(r"[._/,\-]")
_HAS_DIGIT = re.compile(r"\d")


def _num_valid_prefix_segments(segs: list[str]) -> int:
    """Longest prefix (in segments, >=2) forming a valid classic-NUM token:
    no two adjacent digit-free segments, and at least one digit overall."""
    best = 0
    prev_plain = not _HAS_DIGIT.search(segs[0])
    any_digit = not prev_plain
    for i in range(1, len(segs)):
        plain = not _HAS_DIGIT.search(segs[i])
        if plain and prev_plain:
            break
        any_digit = any_digit or not plain
        if any_digit:
            best = i + 1
        prev_plain = plain
    return best if best >= 2 else 0


def _split_hostnum(text: str, out: list[str]) -> None:
    """Re-scan an invalid HOSTNUM superset span with longest-valid-match
    semantics (emulates JFlex backtracking for the HOST/NUM/ALPHANUM rules)."""
    pos = 0
    n = len(text)
    while pos < n:
        ch = text[pos]
        if not (ch.isalnum() and ch != "_"):
            pos += 1
            continue
        rest = text[pos:]
        segs = _SEG_SPLIT.split(rest)
        # candidate 1: HOST — consecutive dot-joined segments from the start
        host_len = len(segs[0])
        k = len(segs[0])
        hseg = 1
        while k < len(rest) and rest[k] == "." and hseg < len(segs):
            k2 = k + 1 + len(segs[hseg])
            host_len = k2
            k = k2
            hseg += 1
        if hseg == 1:
            host_len = 0
        # candidate 2: NUM
        nseg = _num_valid_prefix_segments(segs)
        num_len = sum(len(s) for s in segs[:nseg]) + (nseg - 1) if nseg else 0
        # candidate 3: plain ALPHANUM
        alnum_len = len(segs[0])
        take = max(host_len, num_len, alnum_len)
        out.append(rest[:take])
        pos += take


def classic_tokenize(text: str) -> list[str]:
    """ClassicTokenizer: returns the token texts in order (no types —
    downstream filters only consume text)."""
    out: list[str] = []
    for m in _MASTER.finditer(text):
        kind = m.lastgroup
        tok = m.group()
        if kind == "HOSTNUM":
            if _HOST_OK.match(tok):
                # ACRONYM wins over HOST when a trailing dot extends the
                # letter-dot-pair shape (longest match)
                end = m.end()
                if (
                    end < len(text)
                    and text[end] == "."
                    and _ACRO_SHAPE.match(tok)
                ):
                    tok = tok + "."
                out.append(tok)
            else:
                segs = _SEG_SPLIT.split(tok)
                nseg = _num_valid_prefix_segments(segs)
                if nseg == len(segs):
                    out.append(tok)  # valid NUM
                else:
                    _split_hostnum(tok, out)
        else:
            out.append(tok)
    return out


_WS_SPLIT = re.compile(r"\S+")


def whitespace_tokenize(text: str) -> list[str]:
    return _WS_SPLIT.findall(text)


# ---------------------------------------------------------------------------
# WordDelimiterFilter
# ---------------------------------------------------------------------------

# split points inside a token: non-alnum runs, lower->Upper, letter<->digit,
# and UPPER+ followed by Upper-lower ("ABCDef" -> ABC | Def)
_WDF_PART = re.compile(r"[^\W_]+", re.UNICODE)
_CASE_SPLITS = re.compile(
    r"(?<=[a-z])(?=[A-Z])|(?<=[^\W\d_])(?=\d)|(?<=\d)(?=[^\W\d_])|(?<=[A-Z])(?=[A-Z][a-z])",
    re.UNICODE,
)
_POSSESSIVE = re.compile(r"['’][sS]$")
_IS_SIMPLE = re.compile(r"^(?:[a-z]+|\d+)$")


def word_delimiter_expand(token: str) -> list[tuple[str, int]]:
    """Apply WordDelimiterFilter(preserveOriginal, generateWordParts,
    generateNumberParts, catenateWords, splitOnCaseChange, splitOnNumerics,
    stemEnglishPossessive) to one token.

    Returns ``[(text, position_increment)]`` — increment is relative to the
    previous emitted token; the first emission carries increment 1 (consumes
    the incoming token's position).
    """
    if _IS_SIMPLE.match(token):
        return [(token, 1)]
    # subwords: split on delimiters, then on case/numeric transitions,
    # with a trailing 's stripped from each subword (stemEnglishPossessive)
    parts: list[str] = []
    for run in _WDF_PART.findall(token):
        for p in _CASE_SPLITS.split(run):
            if p:
                parts.append(p)
    # stemEnglishPossessive operates on the raw subword boundaries: an
    # apostrophe is a delimiter, so "O'Neil's" runs are O / Neil / s; Lucene's
    # iterator instead treats the trailing 's as part of the preceding
    # subword and strips it.  Emulate: drop a lone trailing "s"/"S" part that
    # immediately follows an apostrophe in the original token.
    cleaned: list[str] = []
    i = 0
    search_from = 0
    for p in parts:
        idx = token.find(p, search_from)
        prev_ch = token[idx - 1] if idx > 0 else ""
        nxt = idx + len(p)
        if (
            p in ("s", "S")
            and prev_ch in ("'", "’")
            and cleaned
            and (nxt >= len(token) or not (token[nxt].isalnum() and token[nxt] != "_"))
        ):
            search_from = nxt
            continue
        cleaned.append(p)
        search_from = nxt
        i += 1
    parts = cleaned
    if not parts:
        return [(token, 1)]
    if len(parts) == 1 and parts[0] == token:
        return [(token, 1)]

    out: list[tuple[str, int]] = [(token, 1)]  # preserveOriginal, first
    pos = 0  # relative position of last emitted (original at 0)
    # emit parts with catenation of adjacent alpha runs
    run_buf: list[str] = []
    run_is_alpha = False

    def flush_run(at_pos: int) -> None:
        nonlocal run_buf
        if run_is_alpha and len(run_buf) > 1:
            out.append(("".join(run_buf), 0))  # catenateWords @ last part pos
        run_buf = []

    for j, p in enumerate(parts):
        is_alpha = not p[0].isdigit()
        if run_buf and is_alpha != run_is_alpha:
            flush_run(pos)
        out.append((p, 1 if j > 0 else 0))
        pos += 1 if j > 0 else 0
        if is_alpha:
            if not run_buf:
                run_is_alpha = True
            run_buf.append(p)
        else:
            run_is_alpha = False
            run_buf = []
    flush_run(pos)
    return out


# ---------------------------------------------------------------------------
# Token filters
# ---------------------------------------------------------------------------

_EXTRA_FOLD = {
    "ß": "ss",  # ß
    "æ": "ae",
    "Æ": "AE",
    "œ": "oe",
    "Œ": "OE",
    "ø": "o",
    "Ø": "O",
    "đ": "d",
    "Đ": "D",
    "ð": "d",
    "Ð": "D",
    "þ": "th",
    "Þ": "TH",
    "ł": "l",
    "Ł": "L",
    "ı": "i",
}


def ascii_fold(text: str) -> str:
    """ASCIIFoldingFilter: strip diacritics / fold Latin variants to ASCII."""
    if text.isascii():
        return text
    chars = []
    for ch in text:
        if ord(ch) < 128:
            chars.append(ch)
            continue
        if ch in _EXTRA_FOLD:
            chars.append(_EXTRA_FOLD[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in decomp if not unicodedata.combining(c))
        chars.append(folded if folded.isascii() else ch)
    return "".join(chars)


def strip_possessive(text: str) -> str:
    """EnglishPossessiveFilter: remove a trailing ``'s`` / ``’s``."""
    return _POSSESSIVE.sub("", text)


# ---------------------------------------------------------------------------
# Full chains — memoized per unique raw token
# ---------------------------------------------------------------------------


@lru_cache(maxsize=262144)
def _expand_nocas_nopunc(token: str) -> tuple[tuple[str, int], ...]:
    # WDF -> EnglishPossessive -> ASCIIFold -> LowerCase
    return tuple(
        (ascii_fold(strip_possessive(t)).lower(), inc)
        for t, inc in word_delimiter_expand(token)
    )


@lru_cache(maxsize=262144)
def _expand_gen(token: str) -> tuple[tuple[str, int], ...]:
    # WDF -> EnglishPossessive -> LowerCase -> ASCIIFold (fold after lower)
    return tuple(
        (ascii_fold(strip_possessive(t).lower()), inc)
        for t, inc in word_delimiter_expand(token)
    )


@lru_cache(maxsize=262144)
def _expand_cas_nopunc(token: str) -> tuple[tuple[str, int], ...]:
    # WDF -> EnglishPossessive -> ASCIIFold (no lowercase)
    return tuple(
        (ascii_fold(strip_possessive(t)), inc)
        for t, inc in word_delimiter_expand(token)
    )


_CHAIN_EXPANDERS = {
    TEXT_NO_CAS_NO_PUNC: _expand_nocas_nopunc,
    TEXT_GEN: _expand_gen,
    TEXT_CAS_NO_PUNC: _expand_cas_nopunc,
}


def analyze(analyzer: str, text: str) -> list[tuple[str, int]]:
    """Run the named analyzer chain; returns ``[(term, position)]``.

    Position semantics follow Lucene position increments: the first token is
    at position 0; stacked tokens (original/catenations) share positions.
    """
    out: list[tuple[str, int]] = []
    if analyzer == TEXT_CAS_PUNC:
        # WhitespaceTokenizer + StopFilter(empty set) — see module docstring
        pos = -1
        for tok in whitespace_tokenize(text):
            pos += 1
            out.append((tok, pos))
        return out
    expander = _CHAIN_EXPANDERS[analyzer]
    pos = -1
    for tok in classic_tokenize(text):
        for term, inc in expander(tok):
            pos += inc
            if term:
                out.append((term, pos))
    return out


def analyze_terms(analyzer: str, text: str) -> list[str]:
    return [t for t, _ in analyze(analyzer, text)]
