"""Round-5 LLM-pipeline coverage: the Gopher/MassiveText quality and
repetition filter battery (flink_spark/llm/quality.py) as oracle-backed
registry entries over the ``documents`` fixture.

These are the filters every production pre-training pipeline runs
*before* dedup (Rae et al. 2021, Table A1): per-document signal
computation is map-only JVM codegen; the n-gram repetition signals are
one (doc_id, gram) hash aggregate each — at 100 TB both shapes stay
linear in the scan with no corpus-wide state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.llm import quality as ql
from flink_spark.queries import query

# Shared oracle prelude: whitespace tokens + non-space char count, the
# same split the Spark side's tokens() performs.
_T = r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS w,
             length(regexp_replace(text, '\s+', '', 'g')) AS nc
      FROM documents)
"""


@query(
    "doc_gopher_quality",
    _T
    + r"""
    , s AS (
      SELECT doc_id,
             len(w)::BIGINT AS word_count,
             round(CASE WHEN len(w) > 0 THEN nc * 1.0 / len(w)
                        ELSE 0.0 END, 6) AS mean_word_len,
             round(CASE WHEN len(w) > 0 THEN
                     len(regexp_extract_all(text, '#|\.\.\.')) * 1.0 / len(w)
                        ELSE 0.0 END, 6) AS symbol_ratio,
             round(CASE WHEN len(w) > 0 THEN
                     len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                       * 1.0 / len(w)
                        ELSE 0.0 END, 6) AS alpha_frac,
             round(CASE WHEN len(w) > 0 THEN
                     1.0 - len(list_distinct(w)) * 1.0 / len(w)
                        ELSE 0.0 END, 6) AS dup_word_frac
      FROM t)
    SELECT *,
           (word_count BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio <= 0.1
            AND alpha_frac >= 0.8
            AND dup_word_frac <= 0.9) AS gopher_keep
    FROM s
    """,
)
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only Gopher signal battery + keep verdict per document."""
    d = Catalog(spark, sf_dir).documents
    return ql.gopher_signals(d).select(
        "doc_id", "word_count", "mean_word_len", "symbol_ratio",
        "alpha_frac", "dup_word_frac", "gopher_keep",
    )


@query(
    "doc_top_bigram_frac",
    _T
    + r"""
    , g AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
            FROM t, unnest(range(1, len(w))) AS r(i) WHERE len(w) >= 2),
    c AS (SELECT doc_id, gram, count(*) AS cnt,
                 length(replace(gram, ' ', '')) AS glen
          FROM g GROUP BY doc_id, gram),
    top AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY cnt DESC, gram) AS rn
            FROM c)
    SELECT top.doc_id, gram AS top_gram, cnt AS top_gram_count,
           round(cnt * glen * 1.0 / t.nc, 6) AS top_gram_char_frac
    FROM top JOIN t ON top.doc_id = t.doc_id
    WHERE rn = 1
    """,
)
def doc_top_bigram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common-bigram character fraction (Gopher repetition rule,
    n = 2). One hash aggregate + WindowGroupLimit top-1 per doc."""
    d = Catalog(spark, sf_dir).documents
    return ql.top_ngram_char_frac(d, n=2)


@query(
    "doc_dup_5gram_frac",
    _T
    + r"""
    , g AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
            FROM t, unnest(range(1, len(w) - 3)) AS r(i)
            WHERE len(w) >= 5),
    c AS (SELECT doc_id, gram, count(*) AS cnt,
                 length(replace(gram, ' ', '')) AS glen
          FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           round(sum(CASE WHEN cnt > 1 THEN cnt * glen ELSE 0 END) * 1.0
                 / sum(cnt * glen), 6) AS dup_ngram_char_frac
    FROM c GROUP BY doc_id
    """,
)
def doc_dup_5gram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-5-gram character fraction (Gopher repetition rule,
    n = 5, occurrence-weighted). Two chained aggregates on one doc_id
    partitioning — a single shuffle of gram digests."""
    d = Catalog(spark, sf_dir).documents
    return ql.dup_ngram_char_frac(d, n=5)


@query(
    "doc_pipeline_clean",
    r"""
    WITH t AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS w,
             length(regexp_replace(text, '\s+', '', 'g')) AS nc
      FROM documents),
    s AS (
      SELECT doc_id, source, text,
        (len(w)::BIGINT BETWEEN 50 AND 100000
         AND round(CASE WHEN len(w) > 0 THEN nc * 1.0 / len(w)
                        ELSE 0.0 END, 6) BETWEEN 3.0 AND 10.0
         AND round(CASE WHEN len(w) > 0 THEN
                 len(regexp_extract_all(text, '#|\.\.\.')) * 1.0 / len(w)
                        ELSE 0.0 END, 6) <= 0.1
         AND round(CASE WHEN len(w) > 0 THEN
                 len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                   * 1.0 / len(w)
                        ELSE 0.0 END, 6) >= 0.8
         AND round(CASE WHEN len(w) > 0 THEN
                 1.0 - len(list_distinct(w)) * 1.0 / len(w)
                        ELSE 0.0 END, 6) <= 0.9) AS keep
      FROM t),
    f AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp,
             len(list_filter(string_split_regex(trim(
                 regexp_replace(regexp_replace(regexp_replace(text,
                     'https?://[^ ]+', '[URL]', 'g'),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '[EMAIL]', 'g'),
                     '[0-9]{5,}', '[NUM]', 'g')), '\s+'),
                 x -> x <> ''))::BIGINT AS n_tok
      FROM s WHERE keep),
    k AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp),
    kept AS (SELECT f.source, f.n_tok
             FROM f JOIN k ON f.fp = k.fp AND f.doc_id = k.keep_id),
    base AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_in,
                    CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                      AS dropped_quality
             FROM s GROUP BY source),
    ks AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
                  CAST(sum(n_tok) AS BIGINT) AS kept_tokens
           FROM kept GROUP BY source)
    SELECT base.source, docs_in, dropped_quality,
           docs_in - dropped_quality - coalesce(docs_kept, 0) AS dropped_dup,
           coalesce(docs_kept, 0) AS docs_kept,
           coalesce(kept_tokens, 0) AS kept_tokens
    FROM base LEFT JOIN ks ON base.source = ks.source
    """,
)
def doc_pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning pass — the composition every
    pre-training pipeline runs, as ONE declarative plan: Gopher
    quality gate → normalized-fingerprint dedup (keep lowest doc_id)
    → PII redaction → per-source yield report.

    Scale shape: the quality gate and redaction are map-only codegen;
    dedup shuffles 128-bit fingerprints (never text) once; the report
    is two small aggregates. Catalyst pipelines the whole thing —
    the text column is scanned exactly once for the signal battery
    and once for the fingerprint/redaction branch.
    """
    from flink_spark.llm import text as txt

    d = Catalog(spark, sf_dir).documents
    g = ql.gopher_signals(d).select("doc_id", "source", "text", "gopher_keep")
    fps = (
        g.where(F.col("gopher_keep"))
        .select(
            "doc_id", "source",
            txt.fingerprint(F.col("text")).alias("fp"),
            txt.token_count(txt.redact_pii(F.col("text")))
            .cast("long").alias("n_tok"),
        )
    )
    keep = fps.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    kept = fps.join(keep, "fp").where(F.col("doc_id") == F.col("keep_id"))
    base = g.groupBy("source").agg(
        F.count("*").alias("docs_in"),
        F.sum(F.when(~F.col("gopher_keep"), 1).otherwise(0)).cast("long")
        .alias("dropped_quality"),
    )
    ks = kept.groupBy("source").agg(
        F.count("*").alias("docs_kept"),
        F.sum("n_tok").alias("kept_tokens"),
    )
    return base.join(ks, "source", "left").select(
        "source", "docs_in", "dropped_quality",
        (F.col("docs_in") - F.col("dropped_quality")
         - F.coalesce("docs_kept", F.lit(0))).alias("dropped_dup"),
        F.coalesce("docs_kept", F.lit(0)).alias("docs_kept"),
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
    )
