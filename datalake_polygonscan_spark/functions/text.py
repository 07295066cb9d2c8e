"""Text expressions for the LLM-pipeline operators (L1-L4).

All pure Catalyst expressions (string/array higher-order functions) —
the hot path of a 100 TB dedup job must not cross into Python per row.
The language-ID / quality heuristics are deliberately defined as data
(marker tables, regexes) shared with the DuckDB oracle generator in
queries/llm.py so Spark and oracle always agree by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: token regex: word chars or a single non-space symbol (BPE-ish greedy chunks)
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

#: marker stopwords per language for the n-gram/stopword langid heuristic.
#: Deterministic tie-break: first language in this tuple wins.
LANGID_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "is", "a")),
    ("de", ("der", "die", "und", "ist", "nicht", "das")),
    ("es", ("el", "la", "los", "es", "y", "que")),
    ("fr", ("le", "la", "les", "est", "et", "une")),
    ("zh", ("的", "是", "了", "在", "我", "有")),
)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup (L1): lowercase, collapse
    whitespace, strip. Deliberately mirrors common LLM-corpus dedup
    normalizers (lowercase+whitespace) — punctuation retained."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text, as array<string>."""
    return F.split(normalize_text(col), " ")


def token_count_regex(col: Column | str) -> Column:
    """BPE-ish token count: word runs + individual symbols."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_REGEX), 0))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles (arrays of space-joined k-grams) of the
    normalized text. Rows with < k tokens yield a single shingle of the
    whole text so they still participate in MinHash.

    Implemented as ONE regex pass with a lookahead capture — each
    match anchors at a token start (``(?:^| )``) and captures the next
    k tokens without consuming them, so overlapping k-grams come out
    of a single compiled-regex scan instead of per-shingle interpreted
    ``slice``+``concat_ws`` array ops (higher-order functions are
    CodegenFallback; this form measured 3x faster and is bit-identical
    — normalized text has single-space separators by construction, so
    ``\\S+`` runs ARE whitespace tokens)."""
    norm = normalize_text(col)
    pattern = r"(?:^| )(?=(" + " ".join([r"\S+"] * k) + r"))"
    grams = F.regexp_extract_all(norm, F.lit(pattern), 1)
    return F.when(F.size(grams) > 0, grams).otherwise(F.array(norm))


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-grams of normalized text (SimHash / fingerprinting).
    Same single-pass lookahead-capture trick as :func:`word_shingles`
    (normalized text has no newlines, so ``.`` spans every char);
    strings shorter than k yield the whole string."""
    s = normalize_text(col)
    grams = F.regexp_extract_all(s, F.lit(r"(?=(.{%d}))" % k), 1)
    return F.when(F.size(grams) > 0, grams).otherwise(F.array(s))


def langid_pattern(words: tuple[str, ...]) -> str:
    """Marker regex for one language, shared verbatim with the DuckDB
    oracle generator (queries/llm.py) so both engines agree by
    construction. ``\\b`` is ASCII-word-boundary in both Java and RE2
    regexes — around CJK characters it would require an adjacent ASCII
    word char and never match, so non-ASCII marker sets use plain
    containment instead of word boundaries."""
    body = "(" + "|".join(words) + ")"
    if all(w.isascii() for w in words):
        return r"\b" + body + r"\b"
    return body


def langid_scores(col: Column | str) -> list[tuple[str, Column]]:
    """(lang, marker-hit-count) pairs; count = occurrences of any marker
    word, bounded regex so it stays in codegen."""
    out = []
    for lang, words in LANGID_MARKERS:
        pattern = langid_pattern(words)
        out.append((lang, F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(pattern), 0))))
    return out


def langid(col: Column | str) -> Column:
    """argmax language with deterministic tie-break (LANGID_MARKERS
    order); 'und' when no marker hits at all."""
    scores = langid_scores(col)
    best = F.greatest(*[s for _, s in scores])
    expr: Column = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when(score == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))
