"""Round-9 probe #3 (VERDICT r8 task #8): mechanism notes for the two
weak rows with no current probe note.

1. tpch_q3_shape (fixture q3 on the scale-study corpus): ratio drifted
   4.07 -> 4.7 -> 5.73 across r6-r8 WITH NO CODE CHANGE. Decomposition
   from the recorded scale studies: Spark sf10 2.112 -> 2.304 -> 2.411
   (+14%) while DuckDB sf10 0.519 -> 0.490 -> 0.421 (-19%) — both
   within the container's documented 1.5-2x oscillation. This probe
   re-measures min-of-5 in one window with a DuckDB quietness anchor,
   and dumps the plan to confirm the pinned shape (ShuffledHashJoin
   fact edge + broadcast dims) is unchanged.

2. tpcds_real_q58 (1.02 s, 6.0x pinned sf10): times the three channel
   subplans separately to decompose constant-vs-work.

Usage: python tools/probe_r9_q58_q3.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = os.path.join(BASE, "tpcds_sf10")
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

import duckdb  # noqa: E402

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.catalog import TABLES  # noqa: E402


def tmin(fn, runs=5):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    out = {}
    sf10 = os.path.join(BASE, "sf10")
    spark = get_spark(app_name="probe_r9_q58_q3")
    spark.sparkContext.setLogLevel("ERROR")

    # --- tpch_q3 on the scale corpus
    out["tpch_q3_sf10_spark_s"] = tmin(
        lambda: Q.QUERIES["tpch_q3_shipping_priority"](spark, sf10).count()
    )
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf10}/{t}.parquet'")
    sql = Q.ORACLE["tpch_q3_shipping_priority"]
    out["tpch_q3_sf10_duck_s"] = tmin(lambda: con.execute(sql).fetchall())
    out["tpch_q3_ratio"] = round(
        out["tpch_q3_sf10_spark_s"] / out["tpch_q3_sf10_duck_s"], 2
    )
    df = Q.QUERIES["tpch_q3_shipping_priority"](spark, sf10)
    df.count()
    ep = df._jdf.queryExecution().executedPlan().toString()
    out["tpch_q3_plan"] = {
        "shj": ep.count("ShuffledHashJoin"),
        "bhj": ep.count("BroadcastHashJoin"),
        "smj": ep.count("SortMergeJoin"),
        "exchanges": ep.count("Exchange hashpartitioning"),
    }

    # --- q58 decomposition at fact volume
    out["q58_full_s"] = tmin(
        lambda: Q.QUERIES["tpcds_real_q58"](spark, "x").toPandas(), runs=3
    )
    # one channel subplan alone (ss_items shape), through plain SQL on
    # the already-registered stats tables
    one = """
    select i_item_id item_id, sum(ss_ext_sales_price) ss_item_rev
    from store_sales, item, date_dim
    where ss_item_sk = i_item_sk
      and d_date in (select d_date from date_dim
                     where d_week_seq = (select d_week_seq from date_dim
                                         where d_date = '2000-01-03'))
      and ss_sold_date_sk = d_date_sk
    group by i_item_id
    """
    # _run_real leaves the session on the default db; the stats-mode
    # catalog tables live in the stats db
    spark.sql("USE tpcds_stats")
    out["q58_one_channel_s"] = tmin(
        lambda: spark.sql(one).toPandas(), runs=3
    )
    out["q58_floor_s"] = tmin(lambda: spark.range(1).toPandas())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
