"""Text-analysis column functions for the training-data pipeline surface.

All hot-path functions compile to built-in Catalyst expressions (JVM-side,
whole-stage-codegen) — no Python in the loop.  Each has a documented
DuckDB-SQL equivalent used by the driver's correctness oracle
(``__spark_entry__.oracle_sql``).

Covers: tokenization / token counting, quality scoring (length, punctuation
ratio, stopword ratio, mean token length), marker-word language ID, and
document fingerprinting (normalized-text md5 + min-shingle w-fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic marker-word lists for the language-ID heuristic.
# (A real deployment would use fastText/CLD3; the heuristic is the honest
# no-extra-deps variant and is what the oracle SQL reproduces.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "es": ("el", "la", "de", "que", "los", "es"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)

# BPE-ish token regex: word pieces, numbers, or single non-space symbols —
# approximates a byte-pair pre-tokenizer's split points.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed (split on runs)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish regex tokens (JVM regexp_count — no UDF)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def stopword_ratio(text: Column) -> Column:
    toks = ws_tokens(F.lower(text))
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stops) / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]:

    0.25 * min(1, n_tokens/100)            (enough content)
    + 0.25 * (1 - min(1, 4*punct_ratio))   (not punctuation soup)
    + 0.25 * min(1, 4*stopword_ratio)      (natural-language function words)
    + 0.25 * clamp01((mean_token_len-2)/6) (plausible word lengths)
    """
    return quality_score_from(
        text, ws_tokens(text), ws_tokens(F.lower(text))
    )


def quality_score_from(text: Column, toks: Column, ltoks: Column) -> Column:
    """:func:`quality_score` over PRE-TOKENIZED arrays (``toks`` =
    ws_tokens(text), ``ltoks`` = ws_tokens(lower(text))).

    Catalyst does not share common subexpressions across the four quality
    terms, so the fused form re-tokenizes the document once per term;
    callers that project the token arrays as real columns first (see
    ``corpus_clean``) pay for tokenization once.  Identical expressions
    over identical inputs ⇒ value-identical scores."""
    n = F.size(toks).cast("double")
    length_term = F.least(F.lit(1.0), n / F.lit(100.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), F.lit(4.0) * punct_ratio(text))
    stops = F.filter(ltoks, lambda t: t.isin(*STOPWORDS))
    stop_ratio = F.when(
        F.size(ltoks) > 0, F.size(stops) / F.size(ltoks)
    ).otherwise(F.lit(0.0))
    stop_term = F.least(F.lit(1.0), F.lit(4.0) * stop_ratio)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mtl = F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))
    len_term = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), (mtl - F.lit(2.0)) / F.lit(6.0))
    )
    return (
        F.lit(0.25) * length_term
        + F.lit(0.25) * punct_term
        + F.lit(0.25) * stop_term
        + F.lit(0.25) * len_term
    )


def lang_marker_score(text: Column, lang: str) -> Column:
    """Count of marker-word hits for ``lang`` in lowercased text."""
    toks = ws_tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def lang_id(text: Column) -> Column:
    """argmax over marker scores; ties broken by fixed language order
    en > es > fr > de; zero hits everywhere → 'und'."""
    return lang_id_from(ws_tokens(F.lower(text)))


def lang_id_from(ltoks: Column) -> Column:
    """:func:`lang_id` over a PRE-TOKENIZED lowercased token array.

    The argmax references every language's marker count several times
    (greatest + the when-chain); with ``ltoks`` a real column those
    references are cheap array filters instead of one re-tokenization of
    the document each (≈10 tokenizations per row in the fused form)."""
    scores = {
        lg: F.size(F.filter(ltoks, lambda t: t.isin(*LANG_MARKERS[lg])))
        for lg in LANG_MARKERS
    }
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # build reversed so earlier langs win ties via later .when precedence
    expr = F.when(best == F.lit(0), F.lit("und"))
    for lg in LANG_MARKERS:  # insertion order = tie-break priority
        expr = expr.when(scores[lg] == best, F.lit(lg))
    return expr.otherwise(result)


def norm_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase normalization for fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized text."""
    return F.md5(norm_text(text))


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles over whitespace tokens, document order, as strings
    joined by single spaces.  Catalyst-only (transform + slice)."""
    toks = ws_tokens(norm_text(text))
    n = F.size(toks)
    # sequence(1, 0) would DESCEND ([1, 0]); short docs need an empty array
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))


def min_shingle_fingerprint(text: Column, k: int = 3, seed: int = 1) -> Column:
    """w-shingling fingerprint: lexicographic min of seeded-md5 over
    k-shingles (a 1-hash MinHash).  Cross-engine stable (md5 hex strings)."""
    sh = shingles(text, k)
    hashed = F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    return F.array_min(hashed)


__all__ = [
    "LANG_MARKERS",
    "STOPWORDS",
    "BPE_TOKEN_RE",
    "ws_tokens",
    "token_count_ws",
    "token_count_bpe",
    "stopword_ratio",
    "punct_ratio",
    "mean_token_len",
    "quality_score",
    "quality_score_from",
    "lang_id",
    "lang_id_from",
    "lang_marker_score",
    "norm_text",
    "fingerprint_md5",
    "shingles",
    "min_shingle_fingerprint",
]
