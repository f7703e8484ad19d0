"""Text-analysis expression builders (SURVEY.md §2.11) — all JVM-side
column expressions (no Python UDFs): tokenization, n-gram shingles, token
statistics, language-ID scoring, quality scoring, fingerprinting.

These are *expressions*, composable into any query; the scale story is the
same as any narrow projection — they fuse into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: deterministic per-language marker words (synthetic corpus — the fixture
#: text is a shared word soup, so these act as a *mechanism* demo; swap in
#: real stopword lists for production use).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("la", "el", "line", "row"),
    "de": ("der", "die", "merge", "sort"),
    "fr": ("le", "les", "join", "scan"),
    "zh": ("zh", "hash", "group", "batch"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "or")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (fixture text is single-space separated)."""
    return F.split(text, " ")


def regex_tokens(text: Column, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish regex tokenization: alnum runs (pattern kept to a subset both
    Java regex and RE2 agree on, for oracle parity)."""
    return F.regexp_extract_all(text, F.lit(pattern), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def shingles(text: Column, n: int = 2) -> Column:
    """Word n-gram shingles (distinct), the dedup unit for MinHash/Jaccard.

    Documents with fewer than n tokens yield an EMPTY array: without the
    guard, ``sequence(1, size-(n-1))`` would auto-step DOWNWARD for short
    docs ([1, 0]) and ``element_at(w, 0)`` throws under Spark 4's default
    ANSI mode — and the DuckDB oracle's end-exclusive ``range`` is empty for
    the same input, so the guard is also what keeps the engines agreeing."""
    w = tokens(text)
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return (
        F.when(text.isNull(), F.lit(None).cast("array<string>"))  # NULL propagates (oracle parity)
        .when(F.size(w) >= n, F.array_distinct(gram))
        .otherwise(F.array().cast("array<string>"))
    )


def raw_grams(text: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (unlike ``shingles``, which is
    distinct) — the unit for repetition metrics, where duplicate grams are
    exactly the signal. Same short-doc/NULL guards as ``shingles``."""
    w = tokens(text)
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return (
        F.when(text.isNull(), F.lit(None).cast("array<string>"))
        .when(F.size(w) >= n, gram)
        .otherwise(F.array().cast("array<string>"))
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    t = tokens(text)
    stops = F.filter(t, lambda x: x.isin(*STOPWORDS))
    return F.size(stops) / F.size(t)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: lexical diversity (0.3) +
    non-stopword density (0.5) + length adequacy capped at 100 tokens (0.2).
    Deterministic, SQL-portable (oracle mirrors it term for term)."""
    n = token_count(text).cast("double")
    diversity = distinct_token_count(text) / n
    density = 1.0 - stopword_ratio(text)
    length_term = F.least(n / 100.0, F.lit(1.0))
    return 0.3 * diversity + 0.5 * density + 0.2 * length_term


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over distinct tokens."""
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANG_MARKERS.items()
    }


def lang_predict(text: Column) -> Column:
    """Argmax language with fixed precedence order (en>es>de>fr>zh) on ties —
    a deterministic CASE chain, identical in the oracle SQL. Zero marker hits
    in every language → 'unknown' (a real no-signal bucket, not a tie win)."""
    scores = lang_scores(text)
    order = list(LANG_MARKERS)
    best = scores[order[0]]
    for lang in order[1:]:
        best = F.greatest(best, scores[lang])
    expr = F.lit("unknown")
    for lang in reversed(order):  # build CASE bottom-up so earlier langs win ties
        expr = F.when(scores[lang] == best, lang).otherwise(expr)
    return F.when(best == 0, "unknown").otherwise(expr)


def fingerprint(text: Column, prefix_tokens: int = 8) -> Column:
    """Document fingerprint: md5 of the first k tokens — a cheap
    locality-insensitive key for prefix-duplicate clustering."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(text), 1, prefix_tokens)))


def content_hash(text: Column) -> Column:
    """Exact-dedup key: sha256 hex of the full text."""
    return F.sha2(text, 256)


#: PII patterns kept to the regex subset Java (Spark) and RE2 (DuckDB)
#: agree on: no lookarounds, no backreferences.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+",
    "phone": r"\+?[0-9]+(-[0-9]+)+",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (computed BEFORE scrubbing)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_pii(text: Column) -> Column:
    """Redact PII in-place: each category's matches replaced by its
    ``<KIND>`` token. Chained regexp_replace — pure JVM expressions, fuses
    into codegen like any projection (the standard pre-training scrub
    pass; extend PII_PATTERNS for more categories)."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
