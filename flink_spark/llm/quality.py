"""Gopher-style corpus quality and repetition signals.

The rule set is the public MassiveText/Gopher filter battery (Rae et
al. 2021, "Scaling Language Models", Table A1): document length
bounds, mean-word-length band, symbol-to-word ratio, alphabetic-word
fraction, and the repetition family (duplicate unigram fraction,
most-common-n-gram character fraction, duplicated-n-gram character
fraction). These run ahead of dedup in every production pre-training
pipeline; at 100 TB they must be map-only (per-document) or
one-aggregation (per-document n-gram counting) — never corpus-wide.

Design for scale:

- The per-document signals (``gopher_signals``) are pure JVM
  column expressions — whole-stage codegen, zero shuffle, linear scan.
- The n-gram repetition signals shuffle (doc_id, gram) *digests* once
  into a hash aggregate — the same shape as the MinHash tier — and
  never materialize text crosswise. Partial aggregation applies
  map-side because the grouping key includes doc_id (already
  clustered within a scan partition).

Every formula is deterministic integer/double arithmetic over the
whitespace token stream, so DuckDB reproduces it exactly (the oracle
entries in queries_ext5.py hash-match end-to-end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_spark.llm.text import tokens

# Symbols counted by the Gopher symbol-to-word rule: hash marks and
# ellipses (the public rule counts "#" and "..."). Regex meaning is
# identical in Java regex (Spark) and RE2 (DuckDB): no lookaround.
SYMBOL_RE = r"#|\.\.\."


def nonspace_chars(col: Column) -> Column:
    """Characters outside whitespace — the denominator of every
    char-fraction signal (tokens partition exactly these chars)."""
    return F.length(F.regexp_replace(col, r"\s+", ""))


def mean_word_length(col: Column) -> Column:
    w = tokens(col)
    return F.when(
        F.size(w) > 0, nonspace_chars(col) / F.size(w)
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(col: Column) -> Column:
    w = tokens(col)
    n_sym = F.size(F.regexp_extract_all(col, F.lit(SYMBOL_RE), F.lit(0)))
    return F.when(F.size(w) > 0, n_sym / F.size(w)).otherwise(F.lit(0.0))


def alpha_word_frac(col: Column) -> Column:
    """Fraction of words containing at least one alphabetic char."""
    w = tokens(col)
    n_alpha = F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]")))
    return F.when(F.size(w) > 0, n_alpha / F.size(w)).otherwise(F.lit(0.0))


def dup_word_frac(col: Column) -> Column:
    """1 − |distinct words| / |words| — the unigram repetition signal.

    array_distinct is per-row JVM work: the corpus-scale cost is the
    scan itself, no shuffle.
    """
    w = tokens(col)
    return F.when(
        F.size(w) > 0,
        F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w),
    ).otherwise(F.lit(0.0))


def word_ngrams(w: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array if < n words.

    ``w`` must be an already-projected token ARRAY column (not the
    ``tokens(text)`` expression): any expression referenced inside a
    higher-order-function lambda is re-evaluated PER ELEMENT, so an
    inline split() here re-tokenizes the whole document once per
    start position — O(words²) per doc — measured 26 s → 2.7 s at sf1
    (50k docs, 2.7M words) from this fix alone. Callers project the array first; since it is
    referenced more than once, Catalyst's CollapseProject keeps the
    projection (non-cheap multi-referenced expressions are not
    re-inlined).
    """
    starts = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(w, i, n), " ")
    )


def gopher_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the map-only Gopher signal columns + the keep verdict.

    Thresholds are the published MassiveText defaults where they are
    public (word count 50–100 000, mean word length 3–10, symbol
    ratio ≤ 0.1, ≥ 80% alphabetic words); the duplicate-unigram bound
    (≤ 0.9) stands in for the line-based duplicate rules, which need
    newline structure this corpus doesn't carry.
    """
    c = F.col(text_col)
    w = tokens(c)
    out = df.withColumns(
        {
            "word_count": F.size(w).cast("long"),
            "mean_word_len": F.round(mean_word_length(c), 6),
            "symbol_ratio": F.round(symbol_word_ratio(c), 6),
            "alpha_frac": F.round(alpha_word_frac(c), 6),
            "dup_word_frac": F.round(dup_word_frac(c), 6),
        }
    )
    keep = (
        F.col("word_count").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("dup_word_frac") <= 0.9)
    )
    return out.withColumn("gopher_keep", keep)


def _gram_counts(df: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, gram) → occurrence count + char weight.

    One hash aggregate keyed by (doc_id, gram): partial (map-side)
    combine applies, and because doc_id leads the key, the shuffle
    moves one row per *distinct* gram per doc — digests, not text.
    """
    toks = df.select("doc_id", tokens(F.col(text_col)).alias("w"))
    return (
        toks.select("doc_id", F.explode(word_ngrams(F.col("w"), n)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "glen", F.length(F.regexp_replace("gram", " ", "")).cast("long")
        )
    )


def top_ngram_char_frac(
    df: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """Per doc: fraction of non-space chars covered by occurrences of
    the single most frequent word n-gram (ties broken lexicographically
    so the answer is deterministic). Gopher applies this for n = 2,3,4.

    Plan: one (doc_id, gram) hash aggregate, then a per-doc top-1 as
    min of struct(−count, gram) — (count DESC, gram ASC)
    lexicographically. Spark's HashAggregate needs mutable fixed-width
    buffers, so a struct-valued min plans as partial+final
    SortAggregate — but the PARTIAL phase still combines map-side
    (the exchange moves ≤ one row per doc per partition). The obvious
    ROW_NUMBER()=1 spelling instead shuffles EVERY distinct gram row
    and sorts whole doc_id partitions under the Window: measured
    38.4 s vs DuckDB 2.2 s at sf1 (50k docs); the aggregate form plus
    the word_ngrams projection fix run the same data in 2.7 s, and
    the sf1→sf10 ratio falls 1.67→0.66 (SCALE_STUDY_r05_quality).
    """
    counts = _gram_counts(df, n, text_col)
    top = (
        counts.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("gram").alias("gram"),
                    F.col("glen").alias("glen"),
                )
            ).alias("t")
        )
        .select(
            "doc_id",
            F.col("t.gram").alias("gram"),
            (-F.col("t.neg_cnt")).alias("cnt"),
            F.col("t.glen").alias("glen"),
        )
    )
    denom = df.select(
        "doc_id", nonspace_chars(F.col(text_col)).alias("nc")
    )
    return (
        top.join(denom, "doc_id")
        .select(
            "doc_id",
            F.col("gram").alias("top_gram"),
            F.col("cnt").alias("top_gram_count"),
            F.round(F.col("cnt") * F.col("glen") / F.col("nc"), 6).alias(
                "top_gram_char_frac"
            ),
        )
    )


def dup_ngram_char_frac(
    df: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per doc: char-weighted fraction of n-gram occurrences that are
    duplicates — Σ_{grams with count>1} count·len / Σ count·len.
    Gopher applies this for n = 5..10 ("fraction of characters in
    duplicated n-grams"); this is the standard occurrence-weighted
    simplification (overlap-exact span accounting is not reproducible
    across engines).

    Two chained hash aggregates on the same doc_id key — the second
    reuses the first's partitioning (no extra shuffle).
    """
    counts = _gram_counts(df, n, text_col)
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.col("glen"))
                .otherwise(F.lit(0))
            ).alias("dup_chars"),
            F.sum(F.col("cnt") * F.col("glen")).alias("all_chars"),
        )
        .select(
            "doc_id",
            F.round(F.col("dup_chars") / F.col("all_chars"), 6).alias(
                "dup_ngram_char_frac"
            ),
        )
    )
