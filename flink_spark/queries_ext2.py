"""Second extension batch: non-equi joins, OFFSET/FETCH, exact
percentiles, UDAF/TableAggregateFunction parity via applyInPandas,
SCD2 temporal (versioned) join, TRY_CAST/TYPEOF, and a Python UDTF
lateral join — the remaining rows of SURVEY.md §2.3/§2.4/§2.6/§2.8/§2.10.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.queries import query


# ---------------------------------------------------------------------------
# §2.3 Nested-loop (theta / non-equi) join
# ---------------------------------------------------------------------------

_TIERS = [("economy", 0.0, 1000.0), ("standard", 1000.0, 1400.0), ("premium", 1400.0, 1e12)]


@query(
    "join_theta_band",
    """
    SELECT p_partkey, p_retailprice, tier
    FROM part JOIN (VALUES ('economy', 0.0, 1000.0),
                           ('standard', 1000.0, 1400.0),
                           ('premium', 1400.0, 1e12)) AS t(tier, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    """,
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/non-equi join (BatchExecNestedLoopJoin.java:46): band-join
    parts into price tiers. No equi key at all, so Catalyst must pick
    BroadcastNestedLoopJoin — correct here because the build side is a
    3-row literal table; a large-large band join would instead be
    rewritten as a range join (see join_temporal_scd2 for that shape)."""
    p = Catalog(spark, sf_dir).part
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    return (
        p.join(
            F.broadcast(tiers),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .select("p_partkey", "p_retailprice", "tier")
    )


# ---------------------------------------------------------------------------
# §2.6 OFFSET / FETCH (Table.offset:642 / Table.fetch:660)
# ---------------------------------------------------------------------------


@query(
    "sort_offset_fetch",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    OFFSET 10 LIMIT 15
    """,
)
def sort_offset_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... OFFSET m FETCH n (Table.java:622-660). Spark plans
    offset+limit as a single TakeOrderedAndProject(limit=m+n, offset=m)
    — per-partition top-(m+n) heaps, no global sort."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(15)
    )


# ---------------------------------------------------------------------------
# §2.4 Exact percentiles / median
# ---------------------------------------------------------------------------


@query(
    "agg_percentile_family",
    """
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.90) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (the deterministic tier under
    Flink's APPROX_* family). At 100 TB prefer approx_percentile —
    exact percentile needs the full value multiset per group; this
    query exists to pin the interpolation semantics."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_extendedprice", 0.25).alias("p25_price"),
        F.percentile("l_extendedprice", 0.90).alias("p90_price"),
    )


# ---------------------------------------------------------------------------
# §2.4 / §2.10 user-defined aggregates (AggregateFunction parity)
# ---------------------------------------------------------------------------


@query(
    "udaf_weighted_avg",
    """
    SELECT l_returnflag,
           sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate (AggregateFunction.java accumulate/merge
    protocol) as an Arrow-batched pandas aggregation. applyInPandas
    shuffles whole rows (no partial agg) — acceptable for genuinely
    custom accumulators; anything expressible as built-in exprs should
    use them instead (they get map-side combine for free)."""
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_quantity"]
        x = pdf["l_extendedprice"]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "wavg_price": [float((x * w).sum() / w.sum())],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        wavg, "l_returnflag string, wavg_price double"
    )


@query(
    "tableagg_top2_orders",
    """
    SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
               AS rank
      FROM orders) WHERE rank <= 2
    """,
)
def tableagg_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableAggregateFunction parity (TableAggregateFunction.java, the
    Top2 example from Table.flatAggregate:903): an aggregate that emits
    multiple rows per group, via applyInPandas returning ≤2 rows."""
    o = Catalog(spark, sf_dir).orders.select("o_custkey", "o_orderkey", "o_totalprice")

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(2)
        s = s.assign(rank=range(1, len(s) + 1))
        return s[["o_custkey", "rank", "o_orderkey", "o_totalprice"]]

    return o.groupBy("o_custkey").applyInPandas(
        top2, "o_custkey bigint, rank bigint, o_orderkey bigint, o_totalprice double"
    )


# ---------------------------------------------------------------------------
# §2.3 Temporal (versioned) join — FOR SYSTEM_TIME AS OF
# ---------------------------------------------------------------------------


@query(
    "join_temporal_scd2",
    """
    WITH p AS (SELECT user_id, ts, value,
                      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS valid_to
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id AS event_id, c.user_id AS user_id,
           p.value AS version_value,
           CAST(epoch_ms(c.ts) AS BIGINT) AS click_ms
    FROM c JOIN p ON c.user_id = p.user_id
                 AND c.ts >= p.ts
                 AND (p.valid_to IS NULL OR c.ts < p.valid_to)
    """,
)
def join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/versioned join (StreamExecTemporalJoin.java:77,
    TemporalRowTimeJoinOperator.java:78): each purchase opens a new
    version of the user's "profile"; clicks join the version valid at
    click time (FOR SYSTEM_TIME AS OF c.ts). Batch shape: build SCD2
    validity intervals with lead(), then an equi join on the key with
    a range residual — shuffles on user_id, never a nested loop."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("valid_from"),
            F.col("value").alias("version_value"),
            "valid_to",
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return (
        clicks.join(
            versions,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            "event_id",
            "user_id",
            "version_value",
            F.unix_millis("ts").alias("click_ms"),
        )
    )


# ---------------------------------------------------------------------------
# §2.8 TRY_CAST / TYPEOF
# ---------------------------------------------------------------------------


@query(
    "scalar_try_cast_typeof",
    """
    SELECT doc_id,
           TRY_CAST(CAST(doc_id AS VARCHAR) AS BIGINT) AS t_int_ok,
           TRY_CAST(lang AS BIGINT) AS t_int_fail,
           TRY_CAST('12.5' AS DOUBLE) AS t_dbl_ok,
           TRY_CAST(substr(text, 1, 8) AS DOUBLE) AS t_dbl_mixed,
           lower(typeof(doc_id)) AS ty_long,
           lower(typeof(n_chars / 2.0)) AS ty_double,
           lower(typeof(doc_id > 1)) AS ty_bool
    FROM documents
    """,
)
def scalar_try_cast_typeof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST (FlinkSqlOperatorTable.java:883) + TYPE_OF
    (BuiltInFunctionDefinitions.java:102). try_cast yields NULL instead
    of failing; typeof is lowercased so both engines' spellings agree."""
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.col("doc_id").cast("string").try_cast("bigint").alias("t_int_ok"),
        F.col("lang").try_cast("bigint").alias("t_int_fail"),
        F.lit("12.5").try_cast("double").alias("t_dbl_ok"),
        F.substring("text", 1, 8).try_cast("double").alias("t_dbl_mixed"),
        F.lower(F.typeof(F.col("doc_id"))).alias("ty_long"),
        F.lower(F.typeof(F.col("n_chars") / 2.0)).alias("ty_double"),
        F.lower(F.typeof(F.col("doc_id") > 1)).alias("ty_bool"),
    )


# ---------------------------------------------------------------------------
# §2.10 Python UDTF + lateral join (TableFunction / Correlate)
# ---------------------------------------------------------------------------


@query(
    "correlate_udtf_words",
    """
    SELECT doc_id, word, CAST(length(word) AS INTEGER) AS wlen
    FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
          FROM documents WHERE doc_id < 40)
    WHERE word <> ''
    """,
)
def correlate_udtf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableFunction + lateral correlate (TableFunction.java,
    StreamExecCorrelate.java:53) as a Python UDTF (Spark 3.5+). The
    UDTF is the escape hatch for table functions with imperative logic;
    a plain tokenize-to-rows should stay `explode(split(...))`
    (JVM-side) — see unnest_words for that spelling."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, wlen int")
    class SplitWords:
        def eval(self, text: str):
            for w in (text or "").split():
                yield w, len(w)

    spark.udtf.register("split_words", SplitWords)
    d = Catalog(spark, sf_dir).documents
    d.where(F.col("doc_id") < 40).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.word, s.wlen
        FROM udtf_docs, LATERAL split_words(text) s
        """
    )
