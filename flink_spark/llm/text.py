"""Text-analysis operators for training-data pipelines.

All expressions are JVM-side built-ins (no Python UDFs) so they run
inside whole-stage codegen and scale linearly with the scan — at 100 TB
these are map-only operators with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword list used by quality scoring + language ID.
STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty strings filtered out."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(col, r"[^\.,;:!\?'\"\(\)\[\]\{\}-]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(F.lower(col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards moderate length,
    penalizes punctuation soup, rewards stopword presence (prose-ness).
    Deterministic arithmetic only, so it is oracle-checkable in SQL.
    """
    length_score = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    prose_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    return (length_score + prose_score + punct_penalty) / 3.0


def lang_id(col: Column) -> Column:
    """Heuristic language ID: stopword-hit based en/unknown classifier.

    The container has no language-ID model; this is the deterministic
    n-gram/stopword heuristic variant (real deployments would swap in a
    fastText-style model behind the same column contract).
    """
    return F.when(stopword_ratio(col) >= 0.05, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — catches trivially
    re-formatted duplicates that exact hashing misses.
    """
    norm = F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)
