"""Text-analysis operators for the documents surface.

All hot-path operators are native Column expressions (JVM-side, codegen'd)
— no Python in the loop. These are the building blocks a training-data
pipeline runs over every document at 100 TB, so per-row Python is
disqualifying.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
#: BPE-ish word/number/punctuation splitter for subword-flavored counting.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank)."""
    return F.split(F.trim(_c(col)), TOKEN_SPLIT_RE)


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, TOKEN_SPLIT_RE))).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-flavored count: runs of letters, runs of digits, and each
    punctuation mark count separately (regexp-driven, stays JVM-side)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_RE), 0)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"[^A-Za-z0-9\s]", "")
    n = F.length(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.length(stripped)).cast("double") / n.cast("double")
    )


#: Tiny per-language marker sets for the n-gram/stopword language-ID
#: heuristic. Deliberately minimal and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "id": ["yang", "dan", "di", "itu", "dengan"],
}


def marker_hits(col: Column | str, markers: list[str]) -> Column:
    """Count of tokens that are in the marker list (array_intersect-free:
    counts duplicates, which matters for short texts)."""
    toks = tokens(F.lower(_c(col)))
    return F.size(F.filter(toks, lambda t: t.isin(markers))).cast("long")


def lang_id(col: Column | str, langs: dict[str, list[str]] | None = None) -> Column:
    """Stopword-marker language ID: argmax of per-language marker hits,
    'und' (undetermined) when nothing matches. On tied hit counts the
    lexicographically LARGEST language code wins (array_max compares the
    (hits, code) struct fields in order: id > fr > es > en > de) — the t03
    oracle encodes the same reverse order."""
    langs = langs or LANG_MARKERS
    scored = F.array(
        *[
            F.struct(
                marker_hits(col, m).alias("hits"),
                F.lit(code).alias("code"),
            )
            for code, m in sorted(langs.items())
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best["code"])


def quality_score(text_col: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards mid-length documents
    and whitespace structure, penalizes punctuation soup.

    score = 0.4 * min(1, tokens/64) + 0.3 * (1 - punct_ratio)
          + 0.3 * (distinct_tokens / tokens)   [0 when empty]
    """
    tc = token_count(text_col)
    distinct = F.size(F.array_distinct(tokens(F.lower(_c(text_col))))).cast("long")
    len_term = F.least(F.lit(1.0), tc.cast("double") / F.lit(64.0))
    punct_term = F.lit(1.0) - punct_ratio(text_col)
    dedup_term = F.when(tc == 0, F.lit(0.0)).otherwise(
        distinct.cast("double") / tc.cast("double")
    )
    return F.round(
        F.lit(0.4) * len_term + F.lit(0.3) * punct_term + F.lit(0.3) * dedup_term, 6
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of case-folded, whitespace-collapsed text.
    Stable across engines (md5 is bit-exact everywhere), used as the exact
    dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full feature set as columns."""
    return (
        df.withColumn("token_count", token_count(text_col))
        .withColumn("bpe_ish_tokens", bpe_ish_token_count(text_col))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 6))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )
