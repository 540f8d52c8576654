"""Registry entries, part 3: trigger/evictor escape hatches + async lookup.

Round-3 additions closing SURVEY §2.9's trigger/evictor gap (reference
windowing/triggers/ + windowing/evictors/) and §2.10's async lookup
(AsyncWaitOperator.java:91) with driver-checkable oracles:

- window_evictor_count / window_evictor_time: declarative evictor
  semantics (rank/filter before the window aggregate fires) — plain
  Catalyst plans, one shuffle each, verified against DuckDB.
- lookup_async_enrich: the async lookup join run with a deterministic
  in-process resolver (the dimension is a 25-row nation map, the
  standard lookup-table shape), verified against the equivalent batch
  join. The async machinery (bounded in-flight, completion-order
  emission) is exercised for real; only the I/O endpoint is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.queries import query
from flink_spark.streaming.triggers import (
    count_evictor_window_agg,
    time_evictor_window_agg,
)


@query(
    "window_evictor_count",
    """
    WITH w AS (
      SELECT user_id, date_trunc('day', ts) AS ws, value, event_id,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, epoch_ms(ws) AS window_start_ms,
           round(sum(value), 6) AS agg_sum, count(*) AS agg_cnt
    FROM w WHERE rn <= 5 GROUP BY 1, 2
    """,
)
def window_evictor_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountEvictor(5): daily window aggregate over only the last five
    rows per (user, day) — evict-before-fire semantics
    (windowing/evictors/CountEvictor.java)."""
    ev = Catalog(spark, sf_dir).events
    out = count_evictor_window_agg(
        ev, "user_id", "ts", "value", "1 day", keep_last_n=5,
        order_col="event_id",
    )
    return out.select(
        "user_id",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.round("agg_sum", 6).alias("agg_sum"),
        "agg_cnt",
    )


@query(
    "window_evictor_time",
    """
    WITH w AS (
      SELECT user_id, date_trunc('day', ts) AS ws, value,
             epoch_ms(ts) AS tms,
             max(epoch_ms(ts)) OVER (PARTITION BY user_id,
                                     date_trunc('day', ts)) AS mx
      FROM events)
    SELECT user_id, epoch_ms(ws) AS window_start_ms,
           round(sum(value), 6) AS agg_sum, count(*) AS agg_cnt
    FROM w WHERE tms > mx - 3600000 GROUP BY 1, 2
    """,
)
def window_evictor_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeEvictor(1h): only rows within the last hour before each
    (user, day) window's max event time survive to the aggregate
    (windowing/evictors/TimeEvictor.java)."""
    ev = Catalog(spark, sf_dir).events
    out = time_evictor_window_agg(
        ev, "user_id", "ts", "value", "1 day", keep_ms=3_600_000
    )
    return out.select(
        "user_id",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.round("agg_sum", 6).alias("agg_sum"),
        "agg_cnt",
    )


@query(
    "lookup_async_enrich",
    """
    SELECT s_suppkey, s_name, n_name AS nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def lookup_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async lookup join (AsyncDataStream.unorderedWait): suppliers
    enriched against the nation dimension through the bounded-in-flight
    asyncio path; the resolver holds the 25-row dim as a local map (the
    lookup-table shape — at scale this is the external KV endpoint)."""
    from flink_spark.operators.async_lookup import async_lookup_join

    cat = Catalog(spark, sf_dir)
    nation_map = {
        r.n_nationkey: r.n_name for r in cat.nation.collect()
    }

    def factory():
        import asyncio

        async def resolver(k):
            await asyncio.sleep(0)  # real await point, no artificial delay
            name = nation_map.get(k)
            return None if name is None else {"nation": name}

        return resolver

    out = async_lookup_join(
        cat.supplier.select("s_suppkey", "s_name", "s_nationkey"),
        factory,
        "s_nationkey",
        {"nation": "string"},
        capacity=64,
        ordered=False,
        how="inner",
    )
    return out.select("s_suppkey", "s_name", "nation")
