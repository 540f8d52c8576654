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


# GPT-2-style pre-tokenizer shape (letters / digits / punctuation runs,
# each with an optional leading space) — the "BPE-ish" proxy for token
# counting without a vocab. Dialect-neutral regex (no lookaround) so the
# Java engine (Spark) and RE2 (DuckDB oracle) extract identical runs.
BPE_SPLIT_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: matches of the pre-tokenizer regex.

    A real BPE tokenizer merges within these runs, so this counts
    *pre-merge* segments — the standard cheap upper-bound proxy used for
    corpus sizing. Map-only, regex in codegen.
    """
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), F.lit(0)))


def token_hash16(t: Column) -> Column:
    """Deterministic 16-bit token hash: first 4 hex chars of md5.

    md5-derived (not murmur) so an external oracle reproduces it exactly.
    """
    return F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")


def rolling_hash(col: Column, base: int = 1_000_003, mod: int = 2_147_483_647) -> Column:
    """Rabin-Karp rolling fingerprint over the whitespace token stream:
    ``h = fold(tokens, 0, (acc, t) -> (acc·base + h16(t)) mod m)``.

    Order-sensitive (unlike the md5-of-normalized-text fingerprint), so
    it distinguishes permuted documents while staying engine-independent:
    the fold is left-associated 64-bit integer math (acc < 2³¹, so
    acc·base + h < 2⁵² — no overflow in either engine). Map-only."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(base) + token_hash16(t)) % F.lit(mod),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — catches trivially
    re-formatted duplicates that exact hashing misses.
    """
    norm = F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)


# PII redaction patterns shared with the DuckDB oracle (RE2/Java-regex
# compatible subset: no lookaround, no backreferences). Order matters:
# URLs first (their host/path digits must become part of [URL], not
# [NUM]), then emails, then long digit runs.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"https?://[^ ]+", "[URL]"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"[0-9]{5,}", "[NUM]"),
]


def redact_pii(col: Column) -> Column:
    """Scrub URL / email / long-number spans from a text column — the
    standard pre-training privacy pass (map-only, JVM regexp_replace
    chain, stays in whole-stage codegen; no Python in the hot path).

    The pattern list is intentionally the lookaround-free subset that
    means the same thing to Java regex (Spark) and RE2 (DuckDB), so the
    pass is oracle-verifiable byte-for-byte.
    """
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
