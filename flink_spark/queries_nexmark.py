"""Nexmark-shaped streaming query suite, batch semantics.

The reference's streaming perf contract is the (out-of-tree) Nexmark
suite (SURVEY.md §6; public spec: github.com/nexmark/nexmark — the
auction/person/bid queries q1-q8). The fixtures carry one event stream
(`events`: event_id, ts, user_id, event_type, value, props), so each
query is re-grounded on it: bids ↦ events rows (user_id = bidder,
value = price, event_type = category), persons ↦ customer.

Every entry here is the query's BATCH spelling with a DuckDB oracle
(driver-verifiable); tests/test_nexmark_stream.py runs the SAME
pipelines through Structured Streaming (file replay → availableNow →
memory sink) and asserts the streaming result equals the batch result —
the unified-batch-streaming contract Flink's planner makes for these
queries, verified rather than claimed.

All timestamps are emitted as epoch millis (never raw ts — the
TIMESTAMP(NANOS) fixture footgun) and DOUBLEs are rounded where
engines could differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.queries import query


# n1: currency conversion — map-only reprice (Nexmark q1).
@query(
    "nexmark_n1_currency",
    """
    SELECT event_id, user_id,
           round(value * 0.908, 6) AS price_eur
    FROM events WHERE event_type = 'purchase'
    """,
)
def nexmark_n1_currency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q1 (currency conversion): stateless reprice of the bid
    stream — pure map, fuses into the scan, zero state. The streaming
    twin is the same select on readStream."""
    ev = Catalog(spark, sf_dir).events
    return ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.round(F.col("value") * 0.908, 6).alias("price_eur")
    )


# n2: selection — key/price filter (Nexmark q2).
@query(
    "nexmark_n2_selection",
    """
    SELECT event_id, user_id, round(value, 6) AS price
    FROM events
    WHERE event_type = 'purchase' AND event_id % 123 = 0
    """,
)
def nexmark_n2_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q2 (selection): bids on a sampled set of auction ids —
    stateless filter; both predicates push to the scan."""
    ev = Catalog(spark, sf_dir).events
    return ev.where(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 123 == 0)
    ).select("event_id", "user_id", F.round("value", 6).alias("price"))


# n3: local-item join — stream enriched by a dimension (Nexmark q3).
@query(
    "nexmark_n3_local_join",
    """
    SELECT e.event_id, c.c_name AS bidder, c.c_mktsegment AS segment
    FROM events e JOIN customer c ON e.user_id % 1000 = c.c_custkey
    WHERE e.event_type = 'signup'
      AND c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def nexmark_n3_local_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q3 (local item suggestion): the person dim filtered by
    state/category joined to new auctions — here customer broadcasts
    into the event stream (the streaming twin is a stream-static join,
    which Structured Streaming runs without state)."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.where(F.col("event_type") == "signup")
    c = cat.customer.where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    return ev.join(
        F.broadcast(c), ev.user_id % 1000 == c.c_custkey
    ).select("event_id", F.col("c_name").alias("bidder"),
             F.col("c_mktsegment").alias("segment"))


# n4: average price per category over windows (Nexmark q4 shape).
@query(
    "nexmark_n4_avg_by_category",
    """
    SELECT event_type AS category,
           CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS win_start_ms,
           round(sum(value), 6) AS total_price,
           CAST(count(*) AS BIGINT) AS n_bids
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def nexmark_n4_avg_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q4 (average price per category): windowed aggregate per
    category — the streaming twin is the watermarked tumbling-window
    groupBy; batch spelling uses the same hour truncation. One shuffle
    on (category, window)."""
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy(
        F.col("event_type").alias("category"),
        F.date_trunc("hour", "ts").alias("win"),
    ).agg(
        F.round(F.sum("value"), 6).alias("total_price"),
        F.count("*").alias("n_bids"),
    ).select(
        "category",
        F.unix_millis("win").alias("win_start_ms"),
        "total_price",
        "n_bids",
    )


# n5: hot items — which auction got the most bids per window (Nexmark q5).
@query(
    "nexmark_n5_hot_items",
    """
    WITH per_item AS (
      SELECT date_trunc('hour', ts) AS win, user_id, count(*) AS n
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1, 2),
    ranked AS (
      SELECT win, user_id, n,
             rank() OVER (PARTITION BY win ORDER BY n DESC, user_id) AS rk
      FROM per_item)
    SELECT CAST(epoch_ms(win) AS BIGINT) AS win_start_ms,
           user_id AS hot_user, CAST(n AS BIGINT) AS n_events
    FROM ranked WHERE rk = 1
    """,
)
def nexmark_n5_hot_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q5 (hot items): the most-bid auction per window — window
    count then a per-window rank-1, the aggregate-then-top1 pattern.
    The rank input is the per-window agg (small); one shuffle for the
    count, the window sort rides the agg output."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    per = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(F.date_trunc("hour", "ts").alias("win"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("win").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        per.withColumn("rk", F.rank().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.unix_millis("win").alias("win_start_ms"),
            F.col("user_id").alias("hot_user"),
            F.col("n").cast("long").alias("n_events"),
        )
    )


# n7: highest bid per window, with the bidder joined back (Nexmark q7).
@query(
    "nexmark_n7_highest_bid",
    """
    WITH mx AS (
      SELECT date_trunc('hour', ts) AS win, max(value) AS mv
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1)
    SELECT CAST(epoch_ms(e_win) AS BIGINT) AS win_start_ms,
           round(mv, 6) AS max_price,
           min(user_id) AS bidder
    FROM (SELECT date_trunc('hour', ts) AS e_win, user_id, value
          FROM events WHERE event_type = 'purchase') e
    JOIN mx ON e.e_win = mx.win AND e.value = mx.mv
    GROUP BY e_win, mv
    """,
)
def nexmark_n7_highest_bid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q7 (highest bid): the maximal bid per window joined back
    to recover the bidder (min user id as the deterministic tie-break)
    — the agg + self-join-on-extremum pattern Flink plans as a window
    max plus join; here the max table is tiny and broadcasts."""
    ev = Catalog(spark, sf_dir).events.where(F.col("event_type") == "purchase")
    binned = ev.select(
        F.date_trunc("hour", "ts").alias("win"), "user_id", "value"
    )
    mx = binned.groupBy("win").agg(F.max("value").alias("mv"))
    return (
        binned.join(
            F.broadcast(mx),
            (binned.win == mx.win) & (binned.value == mx.mv),
        )
        .drop(mx.win)
        .groupBy("win", "mv")
        .agg(F.min("user_id").alias("bidder"))
        .select(
            F.unix_millis("win").alias("win_start_ms"),
            F.round("mv", 6).alias("max_price"),
            "bidder",
        )
    )


# n8: monitor new users — two event streams window-joined (Nexmark q8).
@query(
    "nexmark_n8_new_users",
    """
    WITH signups AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS win
      FROM events WHERE event_type = 'signup'),
    purchases AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS win
      FROM events WHERE event_type = 'purchase')
    SELECT s.user_id, CAST(epoch_ms(s.win) AS BIGINT) AS win_start_ms
    FROM signups s JOIN purchases p
      ON s.user_id = p.user_id AND s.win = p.win
    """,
)
def nexmark_n8_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q8 (monitor new users): persons who registered AND sold
    in the same window — two filtered views of the stream window-joined
    on (user, window), Flink's WindowJoin showcase. Both sides reduce
    to distinct (user, window) sets before the join, so the join input
    is bounded by active users per window."""
    ev = Catalog(spark, sf_dir).events
    s = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", F.date_trunc("hour", "ts").alias("win"))
        .distinct()
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("hour", "ts").alias("win"))
        .distinct()
    )
    return s.join(p, ["user_id", "win"]).select(
        "user_id", F.unix_millis("win").alias("win_start_ms")
    )


# n6: average selling price per seller over the last 10 closed
# auctions (Nexmark q6).
@query(
    "nexmark_n6_avg_seller_price",
    """
    WITH b AS (SELECT user_id, ts, event_id, value
               FROM events WHERE event_type = 'purchase'),
    r AS (SELECT user_id, ts, event_id,
                 avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                   AS avg10,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM b)
    SELECT user_id AS seller, round(avg10, 6) AS avg_price_last10
    FROM r WHERE rn = 1
    """,
)
def nexmark_n6_avg_seller_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nexmark q6 (average selling price by seller): per seller, the
    mean price of their last 10 closed auctions. Re-grounded like the
    rest of the suite: each 'purchase' event is a closed auction with
    user_id as the seller and value as the selling price; the answer is
    the rows-bounded running average at each seller's latest sale.

    This is the suite's historically hard query — it needs bounded
    per-key HISTORY (ROWS BETWEEN 9 PRECEDING), the state shape Flink
    serves with its rank-based retention. Plan (audited): ONE exchange
    on user_id feeds both OVER windows as partition-local sorts (asc
    for the frame, desc for keep-last), and Catalyst inserts a
    WindowGroupLimit before the row_number window, pruning each
    seller to its top row pre-sort. Ordering is total (ts, event_id),
    so the frame content — and hence the value hash — is
    engine-independent.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    b = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    latest = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        b.withColumn("avg10", F.avg("value").over(frame))
        .withColumn("rn", F.row_number().over(latest))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("seller"),
            F.round("avg10", 6).alias("avg_price_last10"),
        )
    )


# n9: winning bid per auction (extended Nexmark q9).
@query(
    "nexmark_n9_winning_bids",
    """
    WITH b AS (SELECT user_id, date_trunc('day', ts) AS d, ts,
                      event_id, value
               FROM events WHERE event_type = 'purchase'),
    r AS (SELECT user_id, d, ts, event_id, value,
                 row_number() OVER (PARTITION BY user_id, d
                                    ORDER BY value DESC, ts, event_id)
                   AS rn
          FROM b)
    SELECT user_id AS auction,
           CAST(epoch_ms(d) AS BIGINT) AS day_ms,
           CAST(event_id AS BIGINT) AS winning_bid_id,
           round(value, 6) AS winning_price
    FROM r WHERE rn = 1
    """,
)
def nexmark_n9_winning_bids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q9 (winning bids — the out-of-tree suite's
    auction⋈bid dedup, github.com/nexmark/nexmark q9): the highest bid
    per auction lifetime. Re-grounded on the event stream: each
    (user_id, day) is an auction; the winner is the max-value purchase
    with a TOTAL deterministic tiebreak (value desc, ts, event_id) so
    the hash is engine-independent. Plan: one shuffle on the
    (auction, day) key; Catalyst plans WindowGroupLimit (rank-1
    pushdown) before the sort, so each partition retains one row per
    key pre-sort — the streaming analog is the keep-max dedup the
    stateful tier serves with per-key state."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    b = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("day", "ts").alias("d"),
        "ts", "event_id", "value",
    )
    w = Window.partitionBy("user_id", "d").orderBy(
        F.col("value").desc(), "ts", "event_id"
    )
    return (
        b.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("auction"),
            F.unix_millis("d").alias("day_ms"),
            F.col("event_id").cast("long").alias("winning_bid_id"),
            F.round("value", 6).alias("winning_price"),
        )
    )


# n12: bid count per bidder per tumbling window (extended Nexmark q12).
@query(
    "nexmark_n12_bidder_activity",
    """
    SELECT user_id AS bidder,
           CAST(epoch_ms(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT)
             AS win_start_ms,
           CAST(count(*) AS BIGINT) AS n_bids
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, time_bucket(INTERVAL '10 minutes', ts)
    """,
)
def nexmark_n12_bidder_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q12 (how many bids per bidder per 10-minute
    window — the reference grounds it on processing time; the
    deterministic batch spelling uses event time, the same narrowing
    the suite's other windows use). Map-side-combinable count, one
    shuffle on (bidder, window) — at 100 TB this is the canonical
    partial-agg shape."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_bids"))
        .select(
            F.col("user_id").alias("bidder"),
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            F.col("n_bids").cast("long"),
        )
    )


# n15: bidding statistics per day (extended Nexmark q15).
@query(
    "nexmark_n15_bid_stats",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS total_bids,
           CAST(count(*) FILTER (WHERE value < 100) AS BIGINT) AS rank1_bids,
           CAST(count(*) FILTER (WHERE value >= 100 AND value < 300)
                AS BIGINT) AS rank2_bids,
           CAST(count(*) FILTER (WHERE value >= 300) AS BIGINT) AS rank3_bids,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_bidders,
           CAST(count(DISTINCT user_id) FILTER (WHERE value >= 300)
                AS BIGINT) AS rank3_bidders
    FROM events WHERE event_type = 'purchase'
    GROUP BY date_trunc('day', ts)
    """,
)
def nexmark_n15_bid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q15 (bidding statistics report): per day,
    total/price-banded bid counts plus DISTINCT bidder counts overall
    and in the top band — the mixed count/count-distinct-with-filter
    aggregate the extended suite uses to stress distinct-agg planning.
    Spark plans the two distincts + plain counts with one Expand
    (grouping-id split), partials before the shuffle; day emitted as a
    formatted STRING (the DATE-column cross-engine footgun)."""
    ev = Catalog(spark, sf_dir).events
    p = ev.where(F.col("event_type") == "purchase").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id", "value",
    )
    return p.groupBy("day").agg(
        F.count("*").alias("total_bids"),
        F.count(F.when(F.col("value") < 100, 1)).alias("rank1_bids"),
        F.count(F.when((F.col("value") >= 100) & (F.col("value") < 300), 1))
         .alias("rank2_bids"),
        F.count(F.when(F.col("value") >= 300, 1)).alias("rank3_bids"),
        F.count_distinct("user_id").alias("distinct_bidders"),
        F.count_distinct(
            F.when(F.col("value") >= 300, F.col("user_id"))
        ).alias("rank3_bidders"),
    ).select(
        "day",
        F.col("total_bids").cast("long"),
        F.col("rank1_bids").cast("long"),
        F.col("rank2_bids").cast("long"),
        F.col("rank3_bids").cast("long"),
        F.col("distinct_bidders").cast("long"),
        F.col("rank3_bidders").cast("long"),
    )

# n11: bids per bidder per SESSION (extended Nexmark q11).
@query(
    "nexmark_n11_bid_sessions",
    """
    WITH p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
    s AS (SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
                      THEN 1 ELSE 0 END AS new_s
          FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    g AS (SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM s)
    SELECT user_id AS bidder,
           CAST(epoch_ms(min(ts)) AS BIGINT) AS session_start_ms,
           CAST(epoch_ms(max(ts)) + 21600000 AS BIGINT) AS session_end_ms,
           CAST(count(*) AS BIGINT) AS n_bids
    FROM g GROUP BY user_id, sid
    """,
)
def nexmark_n11_bid_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q11 (how many bids did a user make in each
    SESSION — the suite's session-window showcase): bids grouped per
    bidder into 6-hour-gap sessions. Spark-first spelling is the native
    ``session_window`` aggregate (window.start = first event,
    window.end = last event + gap; events merge while the next bid
    lands strictly inside the previous session's end — the oracle's
    gaps-and-islands spelling uses >= gap for a new session, the same
    boundary). One shuffle on the session key; the streaming twin
    (test_nexmark_stream.py) runs the SAME session_window under a
    watermark, Flink's EventTimeSessionWindows analog
    (flink-streaming-java .../assigners/EventTimeSessionWindows.java).
    At 100 TB sessionization stays a single keyed aggregate — no
    self-join, no per-user collect."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_bids"))
        .select(
            F.col("user_id").alias("bidder"),
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            F.col("n_bids").cast("long"),
        )
    )


# n13: bids enriched through a bounded side input (extended Nexmark q13).
@query(
    "nexmark_n13_side_input_join",
    """
    SELECT e.event_id, e.user_id AS bidder,
           round(e.value, 6) AS price,
           n.n_name AS side_value
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    WHERE e.event_type = 'purchase'
    """,
)
def nexmark_n13_side_input_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q13 (side input join): every bid enriched from
    a BOUNDED side input keyed by a derived key — the suite's
    broadcast-state showcase (Flink serves it with a broadcast stream +
    BroadcastProcessFunction; DataStream.broadcast,
    flink-streaming-java .../datastream/BroadcastStream.java). The
    Spark-first spelling broadcasts the 25-row side table into the
    stream scan — map-side hash join, zero shuffle of the fact side
    (the plan pin the streaming twin relies on: stream-static joins run
    stateless). At 100 TB the bid stream never moves; only the side
    table ships."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.where(F.col("event_type") == "purchase")
    n = cat.nation.select("n_nationkey", "n_name")
    return (
        ev.join(F.broadcast(n), ev.user_id % 25 == n.n_nationkey)
        .select(
            "event_id",
            F.col("user_id").alias("bidder"),
            F.round("value", 6).alias("price"),
            F.col("n_name").alias("side_value"),
        )
    )

# n10: log bids to a date/hour-PARTITIONED filesystem sink, read back
# pruned (extended Nexmark q10).
@query(
    "nexmark_n10_log_partitioned",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
           CAST(extract(hour FROM ts) AS BIGINT) AS hr,
           CAST(count(*) AS BIGINT) AS n_bids
    FROM events
    WHERE event_type = 'purchase'
      AND date_trunc('day', ts) = (SELECT min(date_trunc('day', ts))
                                   FROM events WHERE event_type = 'purchase')
    GROUP BY 1, 2
    """,
)
def nexmark_n10_log_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q10 (log to file system): the bid stream lands
    in a (dt, hr)-partitioned parquet sink — Flink's
    FileSystemTableSink with partition keys — and the report reads it
    BACK through partition pruning (the first day only). The write is
    mode=overwrite into a per-corpus path, so the entry is idempotent
    across driver runs; the read-back filter prunes to the one dt
    partition (directory-level pruning — at 100 TB the report touches
    1/365th of the sink, which is the entire point of partitioned
    logging). Oracle computes the same report from the source table."""
    import hashlib
    import tempfile

    ev = Catalog(spark, sf_dir).events
    bids = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", "ts",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("dt"),
        F.hour("ts").alias("hr"),
    )
    sink = (
        f"{tempfile.gettempdir()}/nexmark_n10_sink_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    bids.write.mode("overwrite").partitionBy("dt", "hr").parquet(sink)
    logged = spark.read.parquet(sink)
    first_day = (
        bids.agg(F.min("dt")).collect()[0][0]  # one tiny scalar collect
    )
    return (
        logged.where(F.col("dt") == first_day)  # partition-pruned read
        .groupBy("dt", "hr")
        .agg(F.count("*").alias("n_bids"))
        # partition-type inference reads the dt directory values back
        # as DATE; emit the string form (the DATE cross-engine footgun)
        .select(F.col("dt").cast("string").alias("dt"),
                F.col("hr").cast("long"),
                F.col("n_bids").cast("long"))
    )


# n14: calculated fields + time-of-day bucketing (extended Nexmark q14).
@query(
    "nexmark_n14_calc_fields",
    """
    SELECT event_id, user_id,
           round(value * 0.908, 6) AS price_eur,
           CASE WHEN extract(hour FROM ts) >= 8
                     AND extract(hour FROM ts) <= 18 THEN 'dayTime'
                WHEN extract(hour FROM ts) <= 6
                     OR extract(hour FROM ts) >= 20 THEN 'nightTime'
                ELSE 'otherTime' END AS bid_time_type,
           CAST(length(props) - length(replace(props, 'c', ''))
                AS BIGINT) AS c_counts
    FROM events
    WHERE event_type = 'purchase' AND value * 0.908 > 100
    """,
)
def nexmark_n14_calc_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q14 (calculation fields): converted price
    filter, a time-of-day bucket CASE, and the suite's countChar
    'UDF' — spelled with built-in length/replace so the hot path stays
    inside whole-stage codegen (the reference ships countChar as a Java
    scalar UDF; a Python engine that per-row-UDF'd this would pay the
    interpreter on every bid — the built-in spelling is the Spark-first
    translation, and the CREATE FUNCTION surface exists for genuinely
    custom bodies). Map-only: filter + projections fuse into the
    scan."""
    ev = Catalog(spark, sf_dir).events
    hr = F.hour("ts")
    return (
        ev.where((F.col("event_type") == "purchase")
                 & (F.col("value") * 0.908 > 100))
        .select(
            "event_id", "user_id",
            F.round(F.col("value") * 0.908, 6).alias("price_eur"),
            F.when((hr >= 8) & (hr <= 18), "dayTime")
             .when((hr <= 6) | (hr >= 20), "nightTime")
             .otherwise("otherTime").alias("bid_time_type"),
            (F.length("props")
             - F.length(F.replace(F.col("props"), F.lit("c"), F.lit("")))
             ).cast("long").alias("c_counts"),
        )
    )
