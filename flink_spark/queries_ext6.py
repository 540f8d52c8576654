"""Round-5 LLM-pipeline additions, part 2: exact-substring (span)
deduplication (Lee et al. 2021 ExactSubstr, fixed-width-window
spelling — flink_spark/llm/spandedup.py), the temperature-weighted
domain mixture (the sampling-weights step of every multi-source
pre-training mix), and the savepoint/state-reader tier lives in
flink_spark/state_reader.py (ITCase-verified; no SQL oracle applies
to checkpoint internals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.llm import spandedup as sd
from flink_spark.queries import query

# Shared oracle prelude: whitespace tokens (same split as llm.text
# tokens()), plus every w=10-token window with its 0-based start, and
# the corpus-wide duplicated-window set (count >= 2 occurrences).
_SPAN = r"""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents),
    g AS (SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+9], ' ') AS gram
          FROM t, unnest(range(1, len(w) - 8)) AS r(i)
          WHERE len(w) >= 10),
    d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    occ AS (SELECT g.doc_id, g.pos AS s, g.pos + 9 AS e
            FROM g JOIN d USING (gram)),
    m AS (SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      -1)
                      THEN 1 ELSE 0 END AS brk
          FROM occ),
    isl AS (SELECT doc_id, s, e,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS isl
            FROM m),
    merged AS (SELECT doc_id, isl, min(s) AS s, max(e) AS e
               FROM isl GROUP BY doc_id, isl)
"""


@query(
    "doc_dup_span_coverage",
    _SPAN
    + r"""
    , per AS (SELECT doc_id, sum(e - s + 1)::BIGINT AS dup_tokens
              FROM merged GROUP BY doc_id)
    SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
           coalesce(per.dup_tokens, 0)::BIGINT AS dup_tokens,
           round(CASE WHEN len(t.w) > 0
                      THEN coalesce(per.dup_tokens, 0) * 1.0 / len(t.w)
                      ELSE 0.0 END, 6) AS dup_frac
    FROM t LEFT JOIN per USING (doc_id)
    """,
)
def doc_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr detection tier: per-doc coverage of corpus-wide
    duplicated 10-token spans (interval-union, double counts merged).

    Scale shape: one digest hash-aggregate corpus-wide; the island
    merge windows over duplicated occurrences only."""
    d = Catalog(spark, sf_dir).documents
    return sd.dup_span_coverage(d, w=10)


@query(
    "doc_span_dedup_clean",
    _SPAN
    + r"""
    , tok AS (SELECT doc_id, i - 1 AS pos, w[i] AS tok
              FROM t, unnest(range(1, len(w) + 1)) AS r(i)),
    keep AS (SELECT tok.doc_id, tok.pos, tok.tok
             FROM tok
             WHERE NOT EXISTS (SELECT 1 FROM merged
                               WHERE merged.doc_id = tok.doc_id
                                 AND tok.pos BETWEEN merged.s AND merged.e)),
    agg AS (SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   count(*)::BIGINT AS n_kept
            FROM keep GROUP BY doc_id)
    SELECT t.doc_id,
           (len(t.w) - coalesce(agg.n_kept, 0))::BIGINT AS n_removed,
           coalesce(agg.clean_text, '') AS clean_text
    FROM t LEFT JOIN agg USING (doc_id)
    """,
)
def doc_span_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal tier: cut every duplicated 10-token span,
    rebuild the text map-side from each doc's merged-island array —
    the oracle pins the full reconstructed text per doc."""
    d = Catalog(spark, sf_dir).documents
    return sd.span_dedup_clean(d, w=10)


@query(
    "doc_mixture_weights",
    r"""
    WITH t AS (
      SELECT source,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents),
    s AS (SELECT source, count(*)::BIGINT AS n_docs,
                 sum(n_tok)::BIGINT AS n_tokens
          FROM t GROUP BY source),
    p AS (SELECT *, n_tokens * 1.0 / sum(n_tokens) OVER () AS share
          FROM s)
    SELECT source, n_docs, n_tokens,
           round(share, 6) AS token_share,
           round(pow(share, 0.7) / sum(pow(share, 0.7)) OVER (), 6)
             AS mix_weight
    FROM p
    """,
)
def doc_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixture (alpha = 0.7, the
    multilingual-sampling rule of Conneau & Lample 2019 §3.1 /
    the domain-mix step of every multi-source pre-training recipe):
    per-source token share p_i and sampling weight p_i^a / sum p_j^a.

    Scale shape: one per-source aggregate (tiny result), the
    normalizations are single-row broadcasts (window over the
    20-source aggregate). The heavy input scan is map-only token
    counting."""
    from flink_spark.llm.text import token_count

    d = Catalog(spark, sf_dir).documents
    s = d.select(
        "source", token_count(F.col("text")).alias("n_tok")
    ).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    everything = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    alpha = F.pow(share, F.lit(0.7))
    return s.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(alpha / F.sum(alpha).over(everything), 6).alias("mix_weight"),
    )


@query(
    "doc_unigram_logprob",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS tok FROM t),
    uni AS (SELECT tok, count(*)::BIGINT AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT sum(cnt) AS n FROM uni),
    scored AS (
      SELECT tok.doc_id, -ln(uni.cnt * 1.0 / tot.n) AS nll
      FROM tok JOIN uni USING (tok) CROSS JOIN tot)
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (the LM-scoring step of CCNet,
    Wenzek et al. 2020, with the corpus's own unigram model standing
    in for the external KenLM): per-doc mean negative log-probability
    of its tokens under corpus unigram frequencies. High avg_nll =
    rare-token-heavy documents (gibberish/boilerplate candidates).

    Scale shape: token explode → one hash aggregate for the unigram
    table (vocab ≪ corpus, partial aggregation map-side), the total is
    a single-row broadcast, the scoring join shuffles (tok) digests
    once, and the per-doc mean is a second map-side-combinable
    aggregate. Nothing corpus-wide beyond the vocab table.
    """
    from flink_spark.llm.text import tokens as _toks

    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("tok")
    )
    uni = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    tot = F.sum("cnt").over(Window.partitionBy())
    uni = uni.select("tok", (-F.log(F.col("cnt") / tot)).alias("nll"))
    return (
        tok.join(uni, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )
