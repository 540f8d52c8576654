"""TPC-H-style batch queries adapted to the driver's simplified schema.

The reference validates its batch SQL engine against TPC-H/TPC-DS
(flink-end-to-end-tests/flink-tpch-test/.../TpchDataGenerator.java,
test-scripts/test_tpch.sh:22). The driver's testdata is a reduced TPC-H
star schema (no partsupp, no commit/receipt dates, fewer columns), so
each query here keeps the original's *plan shape* — the joins, subquery
rewrites, and aggregation patterns Catalyst must handle — with
predicates adapted to the available columns.

Plan-shape coverage:
  q4  EXISTS subquery with a non-equi correlate → left-semi join
  q6  single-table filter + agg (full pushdown)
  q7  6-way join with self-joined dimension (nation x2)
  q9  5-way fact-dim join + LIKE filter + multi-key agg
  q10 join + agg + deterministic top-k
  q14 conditional-aggregate ratio (CASE inside SUM)
  q15 scalar subquery on an aggregated CTE (max-of-agg)
  q17 correlated scalar subquery (per-key avg) → decorrelated join
  q18 IN subquery over GROUP BY ... HAVING
  q22 scalar subquery + NOT EXISTS anti join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.queries import query

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: EXISTS with a correlated inequality → left-semi join whose
    condition carries the non-equi residual (l_shipdate > o_orderdate).
    The equi part (orderkey) stays the shuffle key."""
    c = Catalog(spark, sf_dir)
    ords = c.orders.where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    late = c.lineitem.select("l_orderkey", "l_shipdate")
    return (
        ords.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan+filter+agg — every predicate must reach the parquet
    scan (PushedFilters) and the scan must read only 4 columns."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: cross-nation trade volume. The nation dim joins twice under
    different roles — both broadcast; the fact-side joins shuffle on
    orderkey once (lineitem->orders) then custkey."""
    c = Catalog(spark, sf_dir)
    n1 = c.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = c.lineitem.where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q9_product_profit",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           sum(l_extendedprice * (1 - l_discount)) AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: product-line profit by nation/year. The part filter prunes the
    fact early (broadcast the filtered part into lineitem)."""
    c = Catalog(spark, sf_dir)
    red_parts = c.part.where(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        c.lineitem.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_revenue()).alias("profit"))
    )


@query(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name, sum(l_extendedprice * (1 - l_discount)) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by returned-item revenue. orderBy+limit stays
    TakeOrderedAndProject (per-partition top-k, no global sort); c_custkey
    tiebreak keeps the cut deterministic across engines."""
    c = Catalog(spark, sf_dir)
    ords = c.orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = c.lineitem.where(F.col("l_returnflag") == "R")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT 100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
           / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: conditional-aggregate ratio; part broadcasts into the
    date-pruned lineitem scan."""
    c = Catalog(spark, sf_dir)
    li = c.lineitem.where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    joined = li.join(
        F.broadcast(c.part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "ECONOMY", _revenue()).otherwise(0.0))
            / F.sum(_revenue())
        ).alias("promo_revenue")
    )


@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: scalar subquery over an aggregated view. Catalyst evaluates
    the max as a one-row broadcast (no second shuffle of revenue)."""
    c = Catalog(spark, sf_dir)
    c.register_all()
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@query(
    "tpch_q17_small_qty_revenue",
    """
    SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: correlated scalar subquery (per-part average). Catalyst
    decorrelates it into an aggregate + join — the same rewrite Flink
    gets from FlinkDecorrelateProgram.scala (SURVEY §4.1)."""
    c = Catalog(spark, sf_dir)
    c.register_all()
    return spark.sql(
        """
        SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        """
    )


@query(
    "tpch_q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           o_totalprice, sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: IN over GROUP BY ... HAVING → left-semi join against the
    aggregated subquery."""
    c = Catalog(spark, sf_dir)
    c.register_all()
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum(l_quantity) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        """
    )


@query(
    "tpch_q22_idle_customers",
    """
    SELECT c_nationkey, count(*) AS numcust, sum(c_acctbal) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: above-average-balance customers with no orders — scalar
    subquery (broadcast one-row) + NOT EXISTS → left-anti join."""
    c = Catalog(spark, sf_dir)
    c.register_all()
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS numcust, sum(c_acctbal) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        """
    )
