"""Query registry: every implemented operator exposed as a named query.

Each entry couples a Spark DataFrame builder (spark, sf_dir) -> DataFrame
with an equivalent ANSI-SQL oracle string that DuckDB runs over the same
parquet tables. The driver hash-compares the two at sf=0.01 — column
names are aliased identically on both sides (the compare sorts columns
by name before hashing).

Organization mirrors SURVEY.md §2:
  §2.2 calc/projection/filter        §2.3 joins (incl. interval/as-of)
  §2.4 aggregations                  §2.5 OVER windows / rank / dedup
  §2.6 sort/limit                    §2.7 set ops
  §2.8 scalar functions              window TVFs (tumble/hop/cumulate/session)
  M6   LLM-pipeline operators (dedup, similarity, text analysis)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.llm import dedup as lsh
from flink_spark.llm import similarity as sim
from flink_spark.llm import text as txt
from flink_spark.operators import joins as J
from flink_spark.operators import tvf_windows as TVF
from flink_spark.operators import windows as W
from flink_spark.functions import scalar as FS

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.2 Calc (projection + filter) — StreamExecCalc/BatchExecCalc analogue
# ---------------------------------------------------------------------------


@query(
    "calc_project_filter",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS flag_uc
    FROM lineitem
    WHERE l_quantity > 25 AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def calc_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused project+filter; Catalyst pushes both into the parquet scan."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.where((F.col("l_quantity") > 25) & (F.col("l_shipdate") < "1998-01-01"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.upper("l_returnflag").alias("flag_uc"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the reference's minimum end-to-end slice (SURVEY §7 M1).

    Hash aggregate with partial/final phases; scan carries only the 7
    referenced columns (check ReadSchema in .explain).

    Scaled-long fast path (r4 verdict item 4): the money/quantity
    columns are 2-dp values (TPC-H money domain), so each measure is
    rounded to integer cents once and every sum runs over primitive
    longs — integer adds in whole-stage codegen instead of double adds
    (and instead of the BigDecimal path a decimal spelling would take).
    Measured at sf10: 0.856 s (double sums) -> 0.616 s. Exactness: the
    sums are exact integers; the single double division at the end
    reconstructs the same value the oracle's double sum converges to
    (diff ~1e-15 relative, far under the compare's 12-significant-digit
    normalization). Precision bound: the charge term is
    <= 99_990 * 100 * 110 ~ 1.1e9 per row, so int64 overflows only past
    ~8e9 rows PER GROUP (sf ~1300); past that, split the sum into a
    per-partition long partial and a decimal final, or sum as
    decimal(38) directly.
    """
    li = Catalog(spark, sf_dir).lineitem
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    e, d, t, q = (
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
        cents("l_quantity"),
    )
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(q) / 100).alias("sum_qty"),
            (F.sum(e) / 100).alias("sum_base_price"),
            (F.sum(e * (100 - d)) / 10_000).alias("sum_disc_price"),
            (F.sum(e * (100 - d) * (100 + t)) / 1_000_000).alias("sum_charge"),
            (F.sum(q) / n / 100).alias("avg_qty"),
            (F.sum(e) / n / 100).alias("avg_price"),
            (F.sum(d) / n / 100).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "agg_stats_family",
    """
    WITH m AS (
      SELECT l_returnflag,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             CAST(count(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, min_price, max_price,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd_samp,
           sqrt((s2 - s1 * s1 / n) / n) AS sd_pop,
           (s2 - s1 * s1 / n) / (n - 1) AS v_samp,
           (s2 - s1 * s1 / n) / n AS v_pop
    FROM m
    """,
)
def agg_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV/VAR family (BuiltInFunctionDefinitions.java:378-496).

    Moments are summed in DECIMAL(18,2)/DECIMAL(38,4) — exact in both
    engines — then the variance is derived with an identical IEEE-double
    expression on both sides, so the driver's value hash is bitwise
    stable (float summation order drifted vs DuckDB in round 1).
    """
    li = Catalog(spark, sf_dir).lineitem
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.count("*").cast("double").alias("n"),
    )
    ss = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
    return m.select(
        "l_returnflag",
        "min_price",
        "max_price",
        F.sqrt(ss / (F.col("n") - 1)).alias("sd_samp"),
        F.sqrt(ss / F.col("n")).alias("sd_pop"),
        (ss / (F.col("n") - 1)).alias("v_samp"),
        (ss / F.col("n")).alias("v_pop"),
    )


@query(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-agg — Catalyst plans the Expand-based split that the
    reference gets from SplitAggregateRule.scala."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_approx_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_COUNT_DISTINCT (HLL++, rsd=0.5%). The approximate value itself
    can't be hash-compared, so the query emits the exact count plus a boolean
    asserting the HLL estimate lands within ±2% of it — the oracle returns the
    exact count and literal TRUE, making the tolerance check itself part of
    the hash. Reference: ApproximateCountDistinct in
    flink-table BuiltInFunctionDefinitions + HllSketchAggFunction."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.005).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.02 * F.col("exact_parts")
            ).alias("approx_within_2pct"),
        )
    )


@query(
    "agg_rollup",
    """
    SELECT r_name, n_name, sum(s_acctbal) AS total_bal, count(*) AS n,
           CAST(grouping(r_name) AS BIGINT) AS g_r,
           CAST(grouping(n_name) AS BIGINT) AS g_n
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP via Expand (DecomposeGroupingSetsRule analogue is built into
    Catalyst). Dimension joins are broadcast — nation/region are tiny."""
    c = Catalog(spark, sf_dir)
    joined = c.supplier.join(
        F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.sum("s_acctbal").alias("total_bal"),
        F.count("*").alias("n"),
        F.grouping("r_name").cast("long").alias("g_r"),
        F.grouping("n_name").cast("long").alias("g_n"),
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_f,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_s
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.grouping("l_returnflag").cast("long").alias("g_f"),
        F.grouping("l_linestatus").cast("long").alias("g_s"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           sum(o_totalprice) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (FlinkSqlOperatorTable GROUPING support)."""
    c = Catalog(spark, sf_dir)
    c.register_all()
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               sum(o_totalprice) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_listagg",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink LISTAGG → deterministic collect_set/sort/join composition."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        FS.listagg(F.col("l_linestatus"), ",", distinct=True).alias("statuses")
    )


@query(
    "pivot_event_values",
    """
    SELECT user_id % 10 AS user_bucket,
           sum(CASE WHEN event_type = 'click' THEN value END) AS evt_click,
           sum(CASE WHEN event_type = 'purchase' THEN value END) AS evt_purchase,
           sum(CASE WHEN event_type = 'view' THEN value END) AS evt_view,
           sum(CASE WHEN event_type = 'signup' THEN value END) AS evt_signup,
           sum(CASE WHEN event_type = 'error' THEN value END) AS evt_error
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — single-shuffle grouped agg with a fixed value list (never
    let Spark infer pivot values at scale: that is an extra job)."""
    ev = Catalog(spark, sf_dir).events
    kinds = ["click", "purchase", "view", "signup", "error"]
    piv = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", kinds)
        .sum("value")
    )
    return piv.select(
        "user_bucket", *[F.col(k).alias(f"evt_{k}") for k in kinds]
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_groupby",
    """
    SELECT c_mktsegment, count(*) AS n_orders, sum(o_totalprice) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("revenue"))
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
           coalesce(sum(o_totalprice), 0.0) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
    )


@query(
    "join_full_outer",
    """
    SELECT n_nationkey, n_name, c_custkey
    FROM nation FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) hc
      ON n_nationkey = c_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    high = c.customer.where(F.col("c_acctbal") > 9000)
    return (
        c.nation.join(high, F.col("n_nationkey") == F.col("c_nationkey"), "full")
        .select("n_nationkey", "n_name", "c_custkey")
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (Flink SEMI_JOIN_RULES analogue is
    Catalyst's RewritePredicateSubquery)."""
    c = Catalog(spark, sf_dir)
    big = c.orders.where(F.col("o_totalprice") > 100000)
    return c.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join; customers with no urgent orders."""
    c = Catalog(spark, sf_dir)
    urgent = c.orders.where(F.col("o_orderpriority") == "1-URGENT")
    return c.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    """
    SELECT a.r_regionkey AS r1, b.r_regionkey AS r2
    FROM region a CROSS JOIN region b
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (DataSet.cross / BatchExecNestedLoopJoin)."""
    r = Catalog(spark, sf_dir).region
    return (
        r.alias("a")
        .crossJoin(r.alias("b"))
        .select(F.col("a.r_regionkey").alias("r1"), F.col("b.r_regionkey").alias("r2"))
    )


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k.

    Scale shape (the r4 scale study's one true regression, fixed here).
    The r4 plan let the filtered orders side outgrow the 10 MB broadcast
    threshold and fall onto a full SORT-merge join of both fact sides
    (26.9x vs DuckDB at sf10, ratio GROWING with scale). Measured
    variants at sf1/sf10 (4-run interleaved brackets, BENCH notes):
    pre-aggregating lineitem to (l_orderkey, revenue) first 3.8-4.3 s,
    forced orders broadcast 2.4-2.9 s, SHUFFLE_HASH 2.6-2.9 s — from
    9.05 s. SHUFFLE_HASH is the pick: statistically tied with broadcast
    here, and it stays the right plan at 100 TB where the filtered
    orders side (~30 GB at sf100k) can never broadcast but hash-builds
    fine per partition, with no sort of either fact. Customer broadcasts
    into orders map-side first, so the big join's build side is already
    segment-pruned."""
    c = Catalog(spark, sf_dir)
    cust = c.customer.where(F.col("c_mktsegment") == "BUILDING")
    ords = c.orders.where(F.col("o_orderdate") < "1998-03-15").join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    li = c.lineitem.where(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(ords.hint("SHUFFLE_HASH"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_regional_revenue",
    """
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join; dims broadcast, facts shuffle on their keys."""
    c = Catalog(spark, sf_dir)
    ords = c.orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        c.lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(c.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@query(
    "join_interval_clicks_purchases",
    """
    SELECT l.user_id AS user_id, count(*) AS n_pairs
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'purchase'
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    GROUP BY l.user_id
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (TimeIntervalJoin.java:51 semantics, batch): purchases
    within 1h after a click by the same user."""
    ev = Catalog(spark, sf_dir).events
    clicks = ev.where(F.col("event_type") == "click")
    purch = ev.where(F.col("event_type") == "purchase")
    paired = J.interval_join(
        clicks, purch, "user_id", "user_id", "ts", "ts", "0 SECOND", "1 HOUR"
    )
    return paired.groupBy(F.col("l.user_id").alias("user_id")).agg(
        F.count("*").alias("n_pairs")
    )


@query(
    "join_asof_last_click",
    """
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           c.value AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts, value FROM (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
            FROM events WHERE event_type = 'click') WHERE rn = 1
    ) c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/as-of join (TemporalRowTimeJoinOperator.java:78 semantics):
    each purchase sees the value of the user's latest click at-or-before
    its time. Right side deduped to one row per (key, ts) — 'latest
    version wins', matching the reference's versioned state."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase")
    # dedupe by (user_id, ts) keeping the max event_id row
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", "ts", "value", "event_id")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", "value")
    )
    return J.asof_join(
        purchases.select("event_id", "user_id", "ts"),
        clicks,
        key="user_id",
        ts_left="ts",
        ts_right="ts",
        payload={"value": "last_click_value"},
    ).select("event_id", "user_id", "last_click_value")


# ---------------------------------------------------------------------------
# §2.5 OVER windows / rank / dedup
# ---------------------------------------------------------------------------


@query(
    "over_topn_per_group",
    """
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn <= 3
    """,
)
def over_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per key — the StreamExecRank.java:83 pattern in batch."""
    c = Catalog(spark, sf_dir).customer
    return W.top_n(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        3,
    ).withColumn("rn", F.col("rn").cast("long"))


@query(
    "over_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           sum(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_spend
    FROM orders
    """,
)
def over_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.sum("o_totalprice").over(w).alias("running_spend")
    )


@query(
    "over_lag_lead",
    """
    SELECT user_id, event_id,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def over_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "over_rank_family",
    """
    SELECT p_brand, p_partkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           ntile(4) OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def over_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "over_range_frame",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
    FROM orders
    """,
)
def over_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a numeric offset (BatchExecOverAggregate frames).

    Partitioned by priority — an unpartitioned RANGE frame would force a
    single-partition global sort, a scale-killer at 100 TB (VERDICT r1
    §wrong-4)."""
    o = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_1k"),
    )


@query(
    "over_range_time_frame",
    """
    SELECT user_id, epoch_ms(ts) AS ts_ms, value,
           sum(value) OVER w AS frame_sum,
           count(*) OVER w AS frame_cnt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
)
def over_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range OVER frame (1 hour preceding) — the batch-equivalence
    anchor for the streaming OVER operator
    (streaming/stateful.py:over_range_bounded_stream, reference
    RowTimeRangeBoundedPrecedingFunction.java)."""
    ev = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return ev.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        F.sum("value").over(w).alias("frame_sum"),
        F.count("*").over(w).alias("frame_cnt"),
    )


@query(
    "dedup_first_per_key",
    """
    SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
      FROM events) WHERE rn = 1
    """,
)
def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplication keep-first (StreamExecDeduplicate.java:85, batch).

    Event time is emitted as epoch millis — the raw column is nanosecond
    precision on disk and engines truncate differently past micros.
    """
    ev = Catalog(spark, sf_dir).events
    return W.dedup_keep_first(
        ev.select("user_id", "event_id", "ts", "event_type"),
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
    ).select("user_id", "event_id", F.unix_millis("ts").alias("ts_ms"), "event_type")


@query(
    "dedup_last_per_key",
    """
    SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events) WHERE rn = 1
    """,
)
def dedup_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return W.dedup_keep_last(
        ev.select("user_id", "event_id", "ts", "event_type"),
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
    ).select("user_id", "event_id", F.unix_millis("ts").alias("ts_ms"), "event_type")


# ---------------------------------------------------------------------------
# §2.6 Sort / limit
# ---------------------------------------------------------------------------


@query(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject (BatchExecSortLimit analogue):
    per-partition top-k then a driver merge of k*partitions rows — no
    global sort even at 100 TB."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    """
    SELECT k FROM (SELECT c_nationkey AS k FROM customer
                   UNION ALL SELECT s_nationkey AS k FROM supplier)
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return c.customer.select(F.col("c_nationkey").alias("k")).unionAll(
        c.supplier.select(F.col("s_nationkey").alias("k"))
    )


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS k FROM customer
    INTERSECT SELECT s_nationkey AS k FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return c.customer.select(F.col("c_nationkey").alias("k")).intersect(
        c.supplier.select(F.col("s_nationkey").alias("k"))
    )


@query(
    "set_except",
    """
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal < -520
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with no deeply-negative-balance customer."""
    cust = Catalog(spark, sf_dir).customer
    return cust.select(F.col("c_nationkey").alias("k")).subtract(
        cust.where(F.col("c_acctbal") < -520).select(F.col("c_nationkey").alias("k"))
    )


@query(
    "set_intersect_all",
    """
    SELECT o_orderstatus AS s FROM orders WHERE o_totalprice > 50000
    INTERSECT ALL
    SELECT o_orderstatus AS s FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.where(F.col("o_totalprice") > 50000)
        .select(F.col("o_orderstatus").alias("s"))
        .intersectAll(
            o.where(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_orderstatus").alias("s")
            )
        )
    )


# ---------------------------------------------------------------------------
# UNNEST / lateral (§2.2 Correlate)
# ---------------------------------------------------------------------------


@query(
    "unnest_words",
    """
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
    """,
)
def unnest_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST/explode (LogicalUnnestRule / INTERNAL_UNNEST_ROWS analogue)."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "unnest_with_ordinality",
    """
    SELECT doc_id, unnest(range(0, len(ws))) AS pos, unnest(ws) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE doc_id < 10)
    """,
)
def unnest_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode = UNNEST WITH ORDINALITY."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.where(F.col("doc_id") < 10)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "word")
    )


# ---------------------------------------------------------------------------
# Window TVFs: TUMBLE / HOP / CUMULATE / SESSION
# ---------------------------------------------------------------------------


@query(
    "tvf_tumble_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
           count(*) AS n, sum(value) AS total
    FROM events GROUP BY 1, 2
    """,
)
def tvf_tumble_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE TVF (SliceAssigners.java:61) — Spark window()."""
    ev = Catalog(spark, sf_dir).events
    return (
        TVF.tumble(ev, "ts", "1 day")
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )


@query(
    "tvf_hop_2h_1h",
    """
    WITH hopped AS (
      SELECT date_trunc('hour', ts) AS h0, unnest([0, 1]) AS k, value
      FROM events
    )
    SELECT CAST(h0 - INTERVAL 1 HOUR * k AS TIMESTAMP) AS window_start,
           count(*) AS n, sum(value) AS total
    FROM hopped GROUP BY 1
    """,
)
def tvf_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP TVF (SliceAssigners.java:77): size 2h, slide 1h — each row in 2
    windows. Spark window(ts, '2 hours', '1 hour')."""
    ev = Catalog(spark, sf_dir).events
    return (
        TVF.hop(ev, "ts", "2 hours", "1 hour")
        .groupBy("window_start")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )


@query(
    "tvf_cumulate_6h_day",
    """
    WITH exploded AS (
      SELECT value, ts, date_trunc('day', ts) AS base,
             unnest([1, 2, 3, 4]) AS k
      FROM events
    )
    SELECT CAST(base AS TIMESTAMP) AS window_start,
           CAST(base + INTERVAL 6 HOUR * k AS TIMESTAMP) AS window_end,
           count(*) AS n, sum(value) AS total
    FROM exploded WHERE base + INTERVAL 6 HOUR * k > ts GROUP BY 1, 2
    """,
)
def tvf_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE TVF (SliceAssigners.java:94): step 6h, max 1 day."""
    ev = Catalog(spark, sf_dir).events
    return (
        TVF.cumulate(ev.select("ts", "value"), "ts", "6 hours", "1 day")
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )


@query(
    "tvf_session_1h",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 3600 THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, sum(value) AS total
    FROM sess GROUP BY user_id, session_id
    """,
)
def tvf_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION windows, batch sessionization (gap 1h) per user."""
    ev = Catalog(spark, sf_dir).events
    sessions = TVF.session(ev.select("user_id", "ts", "value"), "ts", "1 hour", "user_id")
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total"))
        .withColumn("session_id", F.col("session_id").cast("long"))
    )


# ---------------------------------------------------------------------------
# §2.8 Scalar function batteries (Flink surface → Spark expressions)
# ---------------------------------------------------------------------------


@query(
    "scalar_string_battery",
    """
    SELECT p_partkey,
           upper(p_name) AS s_upper,
           lower(p_brand) AS s_lower,
           substr(p_name, 1, 8) AS s_substr,
           length(p_name) AS s_len,
           concat_ws('-', p_brand, p_type) AS s_concat,
           lpad(p_brand, 12, '*') AS s_lpad,
           rpad(p_brand, 12, '*') AS s_rpad,
           replace(p_type, 'a', '@') AS s_replace,
           reverse(p_brand) AS s_reverse,
           repeat(p_brand, 2) AS s_repeat,
           trim(concat('  ', p_brand, '  ')) AS s_trim,
           strpos(p_name, 'a') AS s_instr,
           left(p_name, 3) AS s_left,
           right(p_name, 3) AS s_right,
           string_split(p_type, ' ')[2] AS s_split_idx,
           md5(p_name) AS s_md5,
           sha256(p_brand) AS s_sha256
    FROM part
    """,
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (SURVEY §2.8; FlinkSqlOperatorTable.java:386-689).

    SPLIT_INDEX maps to get(split(...)) — NULL out of range on both
    engines; HASH functions map to md5/sha2.
    """
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("s_upper"),
        F.lower("p_brand").alias("s_lower"),
        F.substring("p_name", 1, 8).alias("s_substr"),
        F.length("p_name").cast("long").alias("s_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("s_concat"),
        F.lpad("p_brand", 12, "*").alias("s_lpad"),
        F.rpad("p_brand", 12, "*").alias("s_rpad"),
        F.replace(F.col("p_type"), F.lit("a"), F.lit("@")).alias("s_replace"),
        F.reverse("p_brand").alias("s_reverse"),
        F.repeat("p_brand", 2).alias("s_repeat"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("s_trim"),
        F.instr("p_name", "a").cast("long").alias("s_instr"),
        F.substring("p_name", 1, 3).alias("s_left"),
        F.substring(F.col("p_name"), -3, 3).alias("s_right"),
        FS.split_index(F.col("p_type"), " ", 1).alias("s_split_idx"),
        F.md5("p_name").alias("s_md5"),
        F.sha2("p_brand", 256).alias("s_sha256"),
    )


@query(
    "scalar_math_battery",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS m_abs,
           ceil(l_extendedprice) AS m_ceil,
           floor(l_extendedprice) AS m_floor,
           round(l_discount * 100) AS m_round,
           sqrt(l_quantity) AS m_sqrt,
           exp(l_discount) AS m_exp,
           ln(l_extendedprice) AS m_ln,
           log10(l_extendedprice) AS m_log10,
           pow(l_quantity, 2) AS m_pow,
           l_partkey % 7 AS m_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS m_sign,
           sin(l_quantity) AS m_sin,
           cos(l_quantity) AS m_cos,
           atan2(l_quantity, 10.0) AS m_atan2,
           degrees(l_discount) AS m_degrees,
           radians(l_quantity) AS m_radians,
           pi() AS m_pi,
           greatest(l_tax, l_discount) AS m_greatest,
           least(l_tax, l_discount) AS m_least
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (BuiltInFunctionDefinitions.java:966-1417)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.where(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("m_abs"),
        F.ceil("l_extendedprice").cast("double").alias("m_ceil"),
        F.floor("l_extendedprice").cast("double").alias("m_floor"),
        F.round(F.col("l_discount") * 100).alias("m_round"),
        F.sqrt("l_quantity").alias("m_sqrt"),
        F.exp("l_discount").alias("m_exp"),
        F.log("l_extendedprice").alias("m_ln"),
        F.log10("l_extendedprice").alias("m_log10"),
        F.pow("l_quantity", F.lit(2)).alias("m_pow"),
        (F.col("l_partkey") % 7).alias("m_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("m_sign"),
        F.sin("l_quantity").alias("m_sin"),
        F.cos("l_quantity").alias("m_cos"),
        F.atan2(F.col("l_quantity"), F.lit(10.0)).alias("m_atan2"),
        F.degrees("l_discount").alias("m_degrees"),
        F.radians("l_quantity").alias("m_radians"),
        F.lit(3.141592653589793).alias("m_pi"),
        F.greatest("l_tax", "l_discount").alias("m_greatest"),
        F.least("l_tax", "l_discount").alias("m_least"),
    )


@query(
    "scalar_datetime_battery",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS d_year,
           month(o_orderdate) AS d_month,
           day(o_orderdate) AS d_day,
           quarter(o_orderdate) AS d_quarter,
           weekofyear(o_orderdate) AS d_week,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS d_trunc_month,
           strftime(o_orderdate, '%Y-%m') AS d_fmt,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS d_last_day,
           epoch_ms(o_orderdate) AS d_epoch_ms,
           CAST(o_orderdate + INTERVAL 3 HOUR AS TIMESTAMP) AS d_plus_3h,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS d_diff_days
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal functions (SURVEY §2.8: EXTRACT/TRUNC/FORMAT/DIFF family)."""
    o = Catalog(spark, sf_dir).orders
    return o.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("d_year"),
        F.month("o_orderdate").cast("long").alias("d_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("d_day"),
        F.quarter("o_orderdate").cast("long").alias("d_quarter"),
        F.weekofyear("o_orderdate").cast("long").alias("d_week"),
        F.date_trunc("month", "o_orderdate").alias("d_trunc_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("d_fmt"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("d_last_day"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("d_epoch_ms"),
        F.timestamp_add("HOUR", F.lit(3), F.col("o_orderdate")).alias("d_plus_3h"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("d_diff_days"),
    )


@query(
    "scalar_conditional_battery",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS c_case,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS c_coalesce_nullif,
           (o_orderstatus = 'F') AS c_bool,
           (o_totalprice BETWEEN 50000 AND 150000) AS c_between,
           (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS c_in
    FROM orders
    """,
)
def scalar_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/BETWEEN/IN (SURVEY §2.8 comparison row)."""
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("c_case"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "c_coalesce_nullif"
        ),
        (F.col("o_orderstatus") == "F").alias("c_bool"),
        (F.col("o_totalprice").between(50000, 150000)).alias("c_between"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("c_in"),
    )


@query(
    "scalar_json_battery",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def scalar_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_VALUE → get_json_object (SURVEY §2.8 JSON row)."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.select(
            (FS.json_value(F.col("props"), "$.k").cast("bigint") % 10).alias("k_bucket")
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# M6: LLM-pipeline operators — deduplication
# ---------------------------------------------------------------------------


@query(
    "doc_exact_dedup",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep lowest doc_id.

    One shuffle on the 128-bit hash; at 100 TB the hash (not the text)
    is the shuffle payload once you pre-project."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


def _minhash_oracle() -> str:
    # mirrors minhash_signatures: 32-bit slices of ceil(8/4)=2 salted md5s
    mins = ", ".join(
        f"min(substr(md5('{s // 4}|' || s), {1 + (s % 4) * 8}, 8)) AS h{s}"
        for s in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{2*b} || h{2*b+1} AS bv FROM sig"
        for b in range(4)
    )
    return f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh0 AS (SELECT doc_id,
                   [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                    for i in range(1, len(ws) - 1)] AS shl
            FROM words WHERE len(ws) >= 3),
    sh AS (SELECT doc_id, unnest(shl) AS s FROM sh0),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS ({bands})
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


@query("doc_minhash_lsh_pairs", _minhash_oracle())
def doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 8 md5 minhashes, 4 bands of 2."""
    d = Catalog(spark, sf_dir).documents
    return lsh.minhash_lsh_pairs(d, "doc_id", "text", shingle_n=3, num_hashes=8, rows_per_band=2)


@query(
    "doc_ngram_jaccard",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh0 AS (SELECT doc_id,
                   [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                    for i in range(1, len(ws) - 1)] AS shl
            FROM words WHERE len(ws) >= 3),
    sh AS (SELECT DISTINCT doc_id, unnest(shl) AS s FROM sh0),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT d1, d2, ni * 1.0 / (s1.sz + s2.sz - ni) AS jaccard
    FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    WHERE ni * 1.0 / (s1.sz + s2.sz - ni) >= 0.1
    """,
)
def doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs ≥ 0.1 (verification tier of the dedup
    pipeline; the LSH candidates above are the scale tier)."""
    d = Catalog(spark, sf_dir).documents
    return lsh.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.1)


def _neardup_pipeline_oracle(threshold: float = 0.4) -> str:
    mins = ", ".join(
        f"min(substr(md5('{s // 4}|' || s), {1 + (s % 4) * 8}, 8)) AS h{s}"
        for s in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{2*b} || h{2*b+1} AS bv FROM sig"
        for b in range(4)
    )
    return f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh0 AS (SELECT doc_id,
                   [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                    for i in range(1, len(ws) - 1)] AS shl
            FROM words WHERE len(ws) >= 3),
    shall AS (SELECT doc_id, unnest(shl) AS s FROM sh0),
    sig AS (SELECT doc_id, {mins} FROM shall GROUP BY doc_id),
    bands AS ({bands}),
    cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                    count(*) AS n_shared_bands
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    sh AS (SELECT DISTINCT doc_id, s FROM shall),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT c.d1, c.d2, c.n_shared_bands, count(*) AS ni
              FROM cand c
              JOIN sh a ON a.doc_id = c.d1
              JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
              GROUP BY 1, 2, 3)
    SELECT d1, d2, n_shared_bands,
           ni * 1.0 / (s1.sz + s2.sz - ni) AS jaccard
    FROM inter JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE ni * 1.0 / (s1.sz + s2.sz - ni) >= {threshold}
    """


def _sample_mix_oracle() -> str:
    # hash_bucket replicated: first 4 md5 nibbles of the stringified id
    def nib(i: int) -> str:
        a = f"ascii(substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1))"
        return f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"

    bucket = (
        f"(CAST({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)}"
        " AS BIGINT) % 10000)"
    )
    return f"""
    WITH b AS (SELECT doc_id, source, lang, {bucket} AS bucket
               FROM documents),
    mixed AS (
      SELECT * FROM b
      WHERE (source = 'src0' AND bucket < 2000)
         OR (source = 'src1' AND bucket < 10000)
         OR (source = 'src2' AND bucket < 5000)),
    quota AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM mixed) WHERE rn <= 50)
    SELECT m.source, CAST(count(*) AS BIGINT) AS n_mixed,
           CAST(count(q.doc_id) AS BIGINT) AS n_in_quota
    FROM mixed m LEFT JOIN quota q ON m.doc_id = q.doc_id
    GROUP BY m.source
    """


@query("doc_sample_mix", _sample_mix_oracle())
def doc_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mix pipeline: per-source hash-sampling rates
    (src0 20% / src1 100% / src2 50%) then a per-language quota of 50 —
    reproducible across engines because every keep/drop decision is an
    md5-bucket of the doc id (llm/sampling.py). Counts per source verify
    both stages."""
    from flink_spark.llm import sampling as smp

    d = Catalog(spark, sf_dir).documents
    mixed = smp.mix_sources(
        d, "source", "doc_id", {"src0": 0.2, "src1": 1.0, "src2": 0.5}
    )
    quota = smp.stratified_quota(mixed, "lang", "doc_id", 50).select(
        F.col("doc_id").alias("q_doc_id")
    )
    return (
        mixed.join(quota, mixed["doc_id"] == quota["q_doc_id"], "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_mixed"),
            F.count("q_doc_id").alias("n_in_quota"),
        )
    )


@query(
    "doc_pack_sequences",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents),
    laid AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id
      FROM laid)
    SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(sum(n_tokens) / 512.0, 6) AS fill_ratio
    FROM packed GROUP BY seq_id
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing at a 512-token budget
    (llm/packing.py): streaming-fill layout in doc-id order, per-sequence
    fill stats. The doc→trainer step of the pipeline."""
    from flink_spark.llm import packing as pk

    d = Catalog(spark, sf_dir).documents
    packed = pk.pack_sequences(
        d, "doc_id", txt.token_count(F.col("text")).cast("long"), 512
    )
    return pk.pack_stats(packed, 512).select(
        "seq_id",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "fill_ratio",
    )


@query(
    "emb_quantize_int8",
    """
    WITH q AS (
      SELECT vec_id,
             CASE WHEN list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x))) > 0
                  THEN list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x))) / 127.0
                  ELSE 1.0 END AS scale,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    qq AS (
      SELECT vec_id, scale,
             list_transform(v, x -> CAST(greatest(-127,
                 least(127, CAST(round(x / scale, 0) AS BIGINT))) AS BIGINT))
               AS qvec
      FROM q)
    SELECT vec_id, round(scale, 9) AS scale,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           CAST(list_min(qvec) AS BIGINT) AS q_min,
           CAST(list_max(qvec) AS BIGINT) AS q_max,
           CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT)
             AS q_l1
    FROM qq
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (llm/similarity.py
    quantize_int8) — the payload-compression step before shuffling or
    sinking embeddings; verified through exact integer digests of the
    quantized vectors."""
    e = Catalog(spark, sf_dir).embeddings
    q = sim.quantize_int8(e)
    qv = F.col("qvec")
    return q.select(
        "vec_id",
        "scale",
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.array_min(qv).cast("long").alias("q_min"),
        F.array_max(qv).cast("long").alias("q_max"),
        F.aggregate(
            F.transform(qv, lambda x: F.abs(x)),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("q_l1"),
    )


def _kmeans_oracle(nlist: int = 4, rounds: int = 2) -> str:
    a = "ascii(substr(md5(CAST(vec_id AS VARCHAR)), 1, 1))"
    nib = f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"
    ctes = [
        f"a0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,\n"
        f"               CAST({nib} % {nlist} AS BIGINT) AS cell\n"
        f"        FROM embeddings)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"c{r} AS (SELECT cell, list(cv ORDER BY pos) AS centroid FROM (\n"
            f"    SELECT cell, pos, round(avg(v), 6) AS cv FROM (\n"
            f"      SELECT cell, unnest(range(0, len(emb))) AS pos,\n"
            f"             unnest(emb) AS v FROM a{p})\n"
            f"    GROUP BY 1, 2) GROUP BY cell)"
        )
        ctes.append(
            f"a{r} AS (SELECT vec_id, emb, cell FROM (\n"
            f"    SELECT s.vec_id, s.emb, c.cell,\n"
            f"           row_number() OVER (PARTITION BY s.vec_id\n"
            f"             ORDER BY list_cosine_similarity(s.emb, c.centroid)"
            f" DESC, c.cell) AS rn\n"
            f"    FROM a{p} s CROSS JOIN c{r} c) WHERE rn = 1)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT a.cell, CAST(count(*) AS BIGINT) AS n_members,
           round(any_value(
             list_sum(list_transform(c.centroid, x -> abs(x)))), 6)
             AS centroid_l1
    FROM a{rounds} a JOIN c{rounds} c ON a.cell = c.cell
    GROUP BY a.cell
    """
    )


@query("emb_kmeans_lloyd", _kmeans_oracle())
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd rounds of k-means (k=4) over the embeddings — the
    batch-iteration showcase (operators/iterate.py pattern): each round
    is an M-step (per-cell mean, rounded to 1e-6 to pin the floats
    across engines) and an E-step (nearest-centroid reassignment), with
    the round boundary cut by localCheckpoint so round r's plan does not
    replay round r-1. Output: per-cell membership count + centroid L1
    digest, exact against a fully unrolled DuckDB oracle."""
    e = Catalog(spark, sf_dir).embeddings
    assigned = e.select(
        "vec_id",
        "embedding",
        sim._seed_cell(F.col("vec_id"), 4).cast("long").alias("cell"),
    )
    cents = None
    for _ in range(2):
        per_dim = (
            assigned.select(
                "cell", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("cv"))
        )
        cents = per_dim.groupBy("cell").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cv"))),
                lambda s: F.round(s.cv, 6),
            ).alias("centroid")
        ).localCheckpoint(eager=True)
        assigned = sim.ivf_assign(
            assigned.drop("cell"), cents, "vec_id", "embedding"
        ).localCheckpoint(eager=True)
    digests = cents.select(
        F.col("cell").cast("long").alias("cell"),
        F.round(
            F.aggregate(
                F.transform(F.col("centroid"), lambda x: F.abs(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("centroid_l1"),
    )
    counts = assigned.groupBy(F.col("cell").cast("long").alias("cell")).agg(
        F.count("*").alias("n_members")
    )
    return counts.join(digests, "cell").select(
        "cell", "n_members", "centroid_l1"
    )


@query("doc_neardup_pipeline", _neardup_pipeline_oracle())
def doc_neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier near-dedup pipeline: MinHash+LSH candidates verified by
    exact 3-gram Jaccard ON THE CANDIDATES ONLY (llm/dedup.py
    near_dedup_pipeline) — the composition a 100 TB dedup job runs."""
    d = Catalog(spark, sf_dir).documents
    return lsh.near_dedup_pipeline(
        d, "doc_id", "text", shingle_n=3, num_hashes=8, rows_per_band=2,
        threshold=0.4,
    )


def _simhash_oracle(bits: int = 32) -> str:
    votes = []
    for i in range(bits):
        pos, shft = 1 + i // 4, 3 - i % 4
        a = f"ascii(substr(h, {pos}, 1))"
        nib = f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"
        votes.append(
            f"sum(((({nib} >> {shft}) & 1) * 2 - 1) * tf) AS v{i}"
        )
    concat = ", ".join(
        f"CASE WHEN v{i} > 0 THEN '1' ELSE '0' END" for i in range(bits)
    )
    return f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf, md5(tok) AS h
           FROM toks WHERE tok <> '' GROUP BY 1, 2),
    votes AS (SELECT doc_id, {', '.join(votes)} FROM tf GROUP BY doc_id)
    SELECT doc_id, concat({concat}) AS simhash FROM votes
    """


@query("doc_simhash", _simhash_oracle())
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures (md5-derived bit votes, tf-weighted)."""
    d = Catalog(spark, sf_dir).documents
    return lsh.simhash(d, "doc_id", "text", bits=32)


# ---------------------------------------------------------------------------
# M6: text analysis
# ---------------------------------------------------------------------------

_STOP_SQL = "['the','a','an','and','or','of','to','in','is','it']"


@query(
    "doc_token_stats",
    f"""
    WITH t AS (SELECT lang,
                      len(list_filter(string_split(text, ' '), x -> x <> ''))
                        AS n_tok
               FROM documents)
    SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           avg(n_tok * 1.0) AS avg_tokens
    FROM t GROUP BY lang
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document, aggregated per language."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.select("lang", txt.token_count(F.col("text")).cast("long").alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.avg("n_tok").alias("avg_tokens"),
        )
    )


@query(
    "doc_quality",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             length(regexp_replace(text, '[^\\.,;:!\\?''"\\(\\)\\[\\]\\{{\\}}-]', '', 'g'))
               * 1.0 / length(text) AS punct_ratio
      FROM documents),
    r AS (
      SELECT doc_id, len(toks) AS n_tok,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, lower(x))))
                       * 1.0 / len(toks)
                  ELSE 0.0 END AS stop_ratio,
             punct_ratio
      FROM t)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, stop_ratio,
           (least(n_tok / 100.0, 1.0)
            + least(stop_ratio * 5.0, 1.0)
            + greatest(0.0, 1.0 - punct_ratio * 4.0)) / 3.0 AS quality
    FROM r
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/punctuation heuristics."""
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        txt.token_count(F.col("text")).cast("long").alias("n_tok"),
        txt.stopword_ratio(F.col("text")).alias("stop_ratio"),
        txt.quality_score(F.col("text")).alias("quality"),
    )


@query(
    "doc_langid",
    f"""
    WITH t AS (
      SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    g AS (
      SELECT lang,
             CASE WHEN len(toks) > 0 AND
                       len(list_filter(toks, x -> list_contains({_STOP_SQL}, lower(x))))
                         * 1.0 / len(toks) >= 0.05
                  THEN 'en' ELSE 'unknown' END AS lang_guess
      FROM t)
    SELECT lang, lang_guess, count(*) AS n FROM g GROUP BY 1, 2
    """,
)
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID vs the labeled lang column."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.select("lang", txt.lang_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
    )


@query(
    "scalar_shim_battery",
    """
    SELECT p_partkey,
           string_split(p_type, ' ')[2] AS sh_split_idx,
           CASE WHEN sign(p_retailprice - 1000) >= 0
                THEN floor(abs(p_retailprice - 1000) * 100) / 100
                ELSE -(floor(abs(p_retailprice - 1000) * 100) / 100)
           END AS sh_truncate,
           regexp_matches(p_brand, '^[0-9]+$') AS sh_is_digit,
           regexp_matches(replace(p_type, ' ', ''), '^[A-Za-z]+$')
             AS sh_is_alpha,
           regexp_matches(CAST(p_retailprice AS VARCHAR),
             '^\\s*[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?\\s*$')
             AS sh_is_decimal,
           to_base64(encode(p_brand)) AS sh_b64
    FROM part
    """,
)
def scalar_shim_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the name/semantics shims of functions/scalar.py that no
    other battery covers: SPLIT_INDEX, TRUNCATE(x, scale), IS_DIGIT,
    IS_ALPHA, IS_DECIMAL, TO_BASE64 (FlinkSqlOperatorTable rows cited in
    the shim docstrings)."""
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        FS.split_index(F.col("p_type"), " ", 1).alias("sh_split_idx"),
        FS.truncate(F.col("p_retailprice") - 1000, 2).alias("sh_truncate"),
        FS.is_digit(F.col("p_brand")).alias("sh_is_digit"),
        FS.is_alpha(F.regexp_replace(F.col("p_type"), " ", "")).alias(
            "sh_is_alpha"
        ),
        FS.is_decimal(F.col("p_retailprice")).alias("sh_is_decimal"),
        FS.to_base64(F.encode(F.col("p_brand"), "UTF-8")).alias("sh_b64"),
    )


@query(
    "doc_fingerprint",
    """
    WITH f AS (
      SELECT source,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                     '\\s+', ' ', 'g'))) AS fp
      FROM documents)
    SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_fingerprints
    FROM f GROUP BY source
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprints per source."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.select("source", txt.fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_fingerprints"),
        )
    )


def _bpe_rolling_oracle() -> str:
    # token_hash16 replicated: nibble-decode the first 4 md5 hex chars
    def nib(i: int) -> str:
        a = f"ascii(substr(md5(t), {i}, 1))"
        return f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"

    h16 = f"CAST({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)} AS BIGINT)"
    return f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT)
             AS n_bpe_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split(text, ' '), t -> t <> ''),
                 t -> {h16})),
             (a, b) -> (a * 1000003 + b) % 2147483647) AS rolling_fp
    FROM documents
    """


@query("doc_bpe_rolling_fp", _bpe_rolling_oracle())
def doc_bpe_rolling_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counts + Rabin-Karp rolling fingerprint per doc —
    the order-sensitive complement of doc_fingerprint's normalized md5
    (llm/text.py bpe_token_count / rolling_hash; both map-only)."""
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        txt.bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        txt.rolling_hash(F.col("text")).alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# M6: similarity search over embeddings
# ---------------------------------------------------------------------------


@query(
    "emb_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 5),
    scored AS (SELECT q.q_id, c.vec_id AS neighbor_id,
                      list_cosine_similarity(q.q_vec,
                          CAST(c.embedding AS DOUBLE[])) AS cosine_sim
               FROM embeddings c, q WHERE c.vec_id <> q.q_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                         ORDER BY cosine_sim DESC, neighbor_id) AS rn
               FROM scored)
    SELECT q_id, neighbor_id, round(cosine_sim, 6) AS cosine_sim
    FROM ranked WHERE rn <= 5
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 query vectors (ANN baseline) on the
    numpy scoring tier: per-partition GEMM + local top-k, global merge."""
    e = Catalog(spark, sf_dir).embeddings
    return sim.brute_force_topk_np(e, e.where(F.col("vec_id") < 5), k=5)


@query(
    "emb_centroid_per_label",
    """
    WITH ex AS (SELECT label, unnest(range(0, len(embedding))) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings)
    SELECT label, pos, avg(v) AS avg_val FROM ex GROUP BY 1, 2
    """,
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via posexplode + grouped avg (the building block
    for IVF coarse quantizers)."""
    e = Catalog(spark, sf_dir).embeddings
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .select("label", F.col("pos").cast("long").alias("pos"), F.col("v").cast("double").alias("v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("avg_val"))
    )


def _ann_lsh_oracle(dim: int = 64, planes: int = 4, k: int = 5) -> str:
    from flink_spark.llm.similarity import plane_weight

    buckets = []
    for p in range(planes):
        terms = " + ".join(
            f"embedding[{d + 1}] * ({plane_weight(p, d)})" for d in range(dim)
        )
        buckets.append(f"CASE WHEN ({terms}) > 0 THEN '1' ELSE '0' END")
    bucket = "concat(" + ", ".join(buckets) + ")"
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec, bucket
          FROM b WHERE vec_id < 5),
    scored AS (SELECT q.q_id, c.vec_id AS neighbor_id,
                      list_cosine_similarity(q.q_vec,
                          CAST(c.embedding AS DOUBLE[])) AS cosine_sim
               FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q.q_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                         ORDER BY cosine_sim DESC, neighbor_id) AS rn
               FROM scored)
    SELECT q_id, neighbor_id, round(cosine_sim, 6) AS cosine_sim
    FROM ranked WHERE rn <= {k}
    """


@query("emb_ann_lsh", _ann_lsh_oracle())
def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets — the scale
    path: candidate generation is a bucket equi-join, not a cross join."""
    e = Catalog(spark, sf_dir).embeddings
    return sim.lsh_topk(e, e.where(F.col("vec_id") < 5), dim=64, k=5, planes=4)


def _ann_ivf_oracle(nlist: int = 8, nprobe: int = 2, k: int = 5) -> str:
    # first md5 nibble of the stringified id — the deterministic k-means
    # seed shared with similarity._seed_cell
    a = "ascii(substr(md5(CAST(vec_id AS VARCHAR)), 1, 1))"
    nib = f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"
    return f"""
    WITH seeded AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             {nib} % {nlist} AS cell
      FROM embeddings),
    per_dim AS (
      SELECT cell, pos, round(avg(v), 6) AS cv FROM (
        SELECT cell, unnest(range(0, len(emb))) AS pos, unnest(emb) AS v
        FROM seeded)
      GROUP BY 1, 2),
    cent AS (SELECT cell, list(cv ORDER BY pos) AS centroid
             FROM per_dim GROUP BY cell),
    assigned AS (
      SELECT vec_id, emb, cell FROM (
        SELECT s.vec_id, s.emb, c.cell,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY list_cosine_similarity(s.emb, c.centroid) DESC,
                          c.cell) AS rn
        FROM seeded s CROSS JOIN cent c) WHERE rn = 1),
    probes AS (
      SELECT q_id, q_vec, cell FROM (
        SELECT s.vec_id AS q_id, s.emb AS q_vec, c.cell,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY list_cosine_similarity(s.emb, c.centroid) DESC,
                          c.cell) AS rn
        FROM seeded s CROSS JOIN cent c WHERE s.vec_id < 5)
      WHERE rn <= {nprobe}),
    scored AS (
      SELECT p.q_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(p.q_vec, a.emb) AS cosine_sim
      FROM assigned a JOIN probes p USING (cell) WHERE a.vec_id <> p.q_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                         ORDER BY cosine_sim DESC, neighbor_id) AS rn
               FROM scored)
    SELECT q_id, neighbor_id, round(cosine_sim, 6) AS cosine_sim
    FROM ranked WHERE rn <= {k}
    """


@query("emb_ann_ivf", _ann_ivf_oracle())
def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 through an IVF index (deterministic one-round
    k-means: md5-seeded cells → rounded centroids → nearest-centroid
    assignment; queries probe their 2 nearest of 8 cells). The
    data-adaptive counterpart of emb_ann_lsh — candidates come from a
    cell equi-join, centroids are a broadcast table."""
    e = Catalog(spark, sf_dir).embeddings
    return sim.ivf_topk(
        e, e.where(F.col("vec_id") < 5), k=5, nlist=8, nprobe=2
    )


def _ann_ivf_sharded_oracle(nlist: int = 4, nprobe: int = 1,
                            k: int = 5, shards: int = 4) -> str:
    # cell seed = FIRST md5 nibble (similarity._seed_cell); placement
    # shard = SECOND nibble (similarity._shard_of) — independent hashes
    a1 = "ascii(substr(md5(CAST(vec_id AS VARCHAR)), 1, 1))"
    a2 = "ascii(substr(md5(CAST(vec_id AS VARCHAR)), 2, 1))"
    nib1 = f"(CASE WHEN {a1} <= 57 THEN {a1} - 48 ELSE {a1} - 87 END)"
    nib2 = f"(CASE WHEN {a2} <= 57 THEN {a2} - 48 ELSE {a2} - 87 END)"
    return f"""
    WITH seeded AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             {nib2} % {shards} AS shard,
             {nib1} % {nlist} AS cell
      FROM embeddings),
    per_dim AS (
      SELECT shard, cell, pos, round(avg(v), 6) AS cv FROM (
        SELECT shard, cell, unnest(range(0, len(emb))) AS pos,
               unnest(emb) AS v
        FROM seeded)
      GROUP BY 1, 2, 3),
    cent AS (SELECT shard, cell, list(cv ORDER BY pos) AS centroid
             FROM per_dim GROUP BY shard, cell),
    assigned AS (
      SELECT vec_id, emb, shard, cell FROM (
        SELECT s.vec_id, s.emb, s.shard, c.cell,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY list_cosine_similarity(s.emb, c.centroid) DESC,
                          c.cell) AS rn
        FROM seeded s JOIN cent c ON s.shard = c.shard) WHERE rn = 1),
    probes AS (
      SELECT q_id, q_vec, shard, cell FROM (
        SELECT s.vec_id AS q_id, s.emb AS q_vec, c.shard, c.cell,
               row_number() OVER (PARTITION BY s.vec_id, c.shard
                 ORDER BY list_cosine_similarity(s.emb, c.centroid) DESC,
                          c.cell) AS rn
        FROM seeded s CROSS JOIN cent c WHERE s.vec_id < 5)
      WHERE rn <= {nprobe}),
    scored AS (
      SELECT p.q_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(p.q_vec, a.emb) AS cosine_sim
      FROM assigned a
      JOIN probes p ON a.shard = p.shard AND a.cell = p.cell
      WHERE a.vec_id <> p.q_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
                         ORDER BY cosine_sim DESC, neighbor_id) AS rn
               FROM scored)
    SELECT q_id, neighbor_id, round(cosine_sim, 6) AS cosine_sim
    FROM ranked WHERE rn <= {k}
    """


@query("emb_ann_ivf_sharded", _ann_ivf_sharded_oracle())
def emb_ann_ivf_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard IVF ANN (r11, VERDICT r10 task #8): the corpus lives
    in 4 placement shards (deterministic id hash — in production, the
    partition layout), each shard trains and searches its OWN IVF index
    (4 cells, 1 probe per shard), queries fan out to every shard
    (multi-probe), and shard-local top-5 candidates merge through one
    global re-rank. The distributed-serving counterpart of emb_ann_ivf:
    no shard ever sees another shard's vectors, the search is ONE
    map-only Arrow/GEMM pass over the corpus (rows score only against
    their own shard's centroids), and the only exchange is the final
    O(partitions·|queries|·k) merge window — at 100 TB the corpus
    never moves. test_plans.py pins the no-join no-pre-exchange plan."""
    e = Catalog(spark, sf_dir).embeddings
    return sim.ivf_topk_sharded(
        e, e.where(F.col("vec_id") < 5), k=5, nlist=4, nprobe=1,
        shards=4,
    )


@query(
    "multimodal_binary_meta",
    """
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: treat content as opaque bytes + metadata
    (the pattern for image/audio payload columns; see llm/multimodal.py)."""
    d = Catalog(spark, sf_dir).documents
    b = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.md5(b).alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# M5: CEP / MATCH_RECOGNIZE (flink_spark/cep.py)
# ---------------------------------------------------------------------------


@query(
    "cep_click_to_purchase",
    """
    WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
               FROM events),
    c AS (SELECT * FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, tms, min(event_id) AS p_id
          FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
    first_p AS (
      SELECT c.user_id, c.event_id AS a_id, c.tms AS a_ts,
             (SELECT min(p.tms) FROM p
              WHERE p.user_id = c.user_id AND p.tms > c.tms
                AND p.tms < c.tms + 3600000) AS b_ts
      FROM c)
    SELECT f.user_id, f.a_id, f.a_ts, p.p_id AS b_id, f.b_ts
    FROM first_p f JOIN p ON p.user_id = f.user_id AND p.tms = f.b_ts
    """,
)
def cep_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern (NO_SKIP): each click matched to the first strictly-later
    purchase within 1h — Pattern.begin('a').followed_by('b').within(1h)
    through the NFA engine, verified against a pure-SQL oracle."""
    from flink_spark.cep import Pattern, pattern_match

    ev = Catalog(spark, sf_dir).events
    pat = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "click")
        .followed_by("b").where(
            lambda e, b: e["event_type"] == "purchase"
            and e["__ts_ms"] > b["a"][0]["__ts_ms"]
        )
        .within(3_600_000)
    )
    out = pattern_match(
        ev, pat, key="user_id", ts_col="ts",
        order_cols=["event_id"], payload_cols=["event_type", "event_id"],
    )
    a = out.where(F.col("step") == "a").select(
        "user_id", "match_id",
        F.col("event_id").cast("long").alias("a_id"),
        F.col("ts_ms").alias("a_ts"),
    )
    b = out.where(F.col("step") == "b").select(
        "user_id", "match_id",
        F.col("event_id").cast("long").alias("b_id"),
        F.col("ts_ms").alias("b_ts"),
    )
    return a.join(b, ["user_id", "match_id"]).select(
        "user_id", "a_id", "a_ts", "b_id", "b_ts"
    )


@query(
    "match_recognize_click_purchase",
    """
    WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms
               FROM events),
    c AS (SELECT * FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, tms, min(event_id) AS p_id
          FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
    first_p AS (
      SELECT c.user_id, c.event_id AS a_id, c.tms AS a_ts,
             (SELECT min(p.tms) FROM p
              WHERE p.user_id = c.user_id AND p.tms > c.tms
                AND p.tms < c.tms + 3600000) AS b_ts
      FROM c)
    SELECT f.user_id, f.a_id, f.a_ts, p.p_id AS b_id, f.b_ts
    FROM first_p f JOIN p ON p.user_id = f.user_id AND p.tms = f.b_ts
    """,
)
def match_recognize_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL MATCH_RECOGNIZE front-end (StreamExecMatch.java:59) compiled
    onto the CEP engine: PATTERN (A X*? B) — reluctant catch-all X — is
    the standard spelling of "first purchase after each click", and
    AFTER MATCH SKIP TO NEXT ROW keeps one match per click. Result is
    identical to cep_click_to_purchase's Pattern-API plan, so the same
    SQL oracle verifies both layers."""
    from flink_spark.match_recognize import match_recognize

    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_millis("ts").alias("tms"),
    )
    out = match_recognize(
        ev,
        """
        PARTITION BY user_id
        ORDER BY ts, event_id
        MEASURES FIRST(A.event_id) AS a_id, FIRST(A.tms) AS a_ts,
                 FIRST(B.event_id) AS b_id, FIRST(B.tms) AS b_ts
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A X*? B)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase' AND B.tms > FIRST(A.tms)
        """,
        measure_types={"a_id": "long", "a_ts": "long",
                       "b_id": "long", "b_ts": "long"},
    )
    return out.select("user_id", "a_id", "a_ts", "b_id", "b_ts")


# ---------------------------------------------------------------------------
# M4: changelog / retraction layer (flink_spark/changelog.py)
# ---------------------------------------------------------------------------

_CDC_KIND_SQL = """CASE event_type WHEN 'signup' THEN '+I'
                                   WHEN 'error' THEN '-D'
                                   ELSE '+U' END"""


def _cdc_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC stream derived from events: signup=+I, error=-D,
    others=+U, keyed by user_id and ordered by (ts, event_id)."""
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        F.when(F.col("event_type") == "signup", "+I")
        .when(F.col("event_type") == "error", "-D")
        .otherwise("+U")
        .alias("row_kind"),
    )


@query(
    "changelog_normalize_state",
    f"""
    WITH cdc AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
             {_CDC_KIND_SQL} AS row_kind
      FROM events),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_ms DESC, event_id DESC) AS rn
      FROM cdc WHERE row_kind <> '-U')
    SELECT user_id, event_id, ts_ms, value
    FROM ranked WHERE rn = 1 AND row_kind <> '-D'
    """,
)
def changelog_normalize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangelogNormalize (StreamExecChangelogNormalize.java:74): the
    current state of a CDC stream — newest row per key, deletes drop."""
    from flink_spark import changelog as CL

    cdc = _cdc_from_events(spark, sf_dir)
    return CL.changelog_normalize(
        cdc, ["user_id"], [F.col("ts_ms"), F.col("event_id")]
    ).select("user_id", "event_id", "ts_ms", "value")


@query(
    "changelog_retract_sum",
    f"""
    WITH cdc AS (
      SELECT user_id, value, {_CDC_KIND_SQL} AS row_kind FROM events)
    SELECT user_id % 10 AS user_bucket,
           sum(CASE WHEN row_kind IN ('+I', '+U') THEN value ELSE -value END)
             AS sum_value,
           CAST(sum(CASE WHEN row_kind IN ('+I', '+U') THEN 1 ELSE -1 END)
             AS BIGINT) AS net_count
    FROM cdc GROUP BY 1
    """,
)
def changelog_retract_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable SUM/COUNT over a changelog (GroupAggFunction.java:43
    retract path): +I/+U accumulate, -U/-D retract."""
    from flink_spark import changelog as CL

    cdc = _cdc_from_events(spark, sf_dir).withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return CL.retracting_sum(cdc, ["user_bucket"], "value")


@query(
    "changelog_retract_minmax",
    """
    WITH cdc AS (
      SELECT user_id % 10 AS user_bucket, round(value, 3) AS v,
             CASE WHEN event_type = 'signup' THEN 1
                  WHEN event_type = 'error' THEN -1
                  ELSE 1 END AS w
      FROM events),
    per_val AS (
      SELECT user_bucket, v, sum(w) AS net
      FROM cdc GROUP BY 1, 2)
    SELECT user_bucket, min(v) AS min_value, max(v) AS max_value,
           CAST(count(DISTINCT v) AS BIGINT) AS n_live_values
    FROM per_val WHERE net > 0
    GROUP BY user_bucket
    """,
)
def changelog_retract_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable MIN/MAX over a changelog — the value→net-count
    backing-map design of Min/MaxWithRetractAggFunction.java, spelled
    relationally (net count per (key, value), extremes over live
    values). Values rounded to 3 decimals so the distinct-value grouping
    is engine-stable."""
    from flink_spark import changelog as CL

    cdc = (
        _cdc_from_events(spark, sf_dir)
        .withColumn("user_bucket", F.col("user_id") % 10)
        .withColumn("value", F.round("value", 3))
    )
    return CL.retracting_min_max(cdc, ["user_bucket"], "value")


# ---------------------------------------------------------------------------
# Extended query families — imported last so their @query decorators run
# against the registry above.
# ---------------------------------------------------------------------------

from flink_spark import queries_tpch as _queries_tpch  # noqa: E402,F401
from flink_spark import queries_tpch2 as _queries_tpch2  # noqa: E402,F401
from flink_spark import queries_tpcds as _queries_tpcds  # noqa: E402,F401
from flink_spark import queries_tpcds2 as _queries_tpcds2  # noqa: E402,F401
from flink_spark import queries_tpcds3 as _queries_tpcds3  # noqa: E402,F401
from flink_spark import queries_tpcds4 as _queries_tpcds4  # noqa: E402,F401
from flink_spark import queries_tpcds5 as _queries_tpcds5  # noqa: E402,F401
from flink_spark import queries_tpcds6 as _queries_tpcds6  # noqa: E402,F401
from flink_spark import queries_tpcds_real as _queries_tpcds_real  # noqa: E402,F401
from flink_spark import queries_nexmark as _queries_nexmark  # noqa: E402,F401
from flink_spark import queries_ext as _queries_ext  # noqa: E402,F401
from flink_spark import queries_ext2 as _queries_ext2  # noqa: E402,F401
from flink_spark import queries_ext3 as _queries_ext3  # noqa: E402,F401
from flink_spark import queries_ext4 as _queries_ext4  # noqa: E402,F401
from flink_spark import queries_ext5 as _queries_ext5  # noqa: E402,F401
from flink_spark import queries_ext6 as _queries_ext6  # noqa: E402,F401
from flink_spark import queries_ext7 as _queries_ext7  # noqa: E402,F401
