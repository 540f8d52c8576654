"""Streaming operator tests: drive file-stream queries to completion with
availableNow + memory sink, then assert the emitted rows equal the batch
computation over the same input (micro-batch determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.streaming import core as SC
from flink_spark.streaming import stateful as SS
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumble_agg_matches_batch(spark):
    ev = SC.stream_table(spark, SF_DIR, "events")
    agg = SC.tumble_agg(
        SC.with_bounded_out_of_orderness(ev, "ts", "1 minute"),
        "ts",
        "1 day",
        ["event_type"],
        [F.count("*").alias("n"), F.sum("value").alias("total")],
    )
    SC.run_to_memory(agg, "t_tumble", "append")
    got = spark.sql("SELECT window_start, event_type, n, total FROM t_tumble")

    batch = Catalog(spark, SF_DIR).events
    want = (
        batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    # append mode only emits windows closed by the final watermark; every
    # emitted window must match its batch counterpart, and most windows
    # should have been emitted (all but the last open one).
    got_rows = _sorted_rows(got)
    want_rows = _sorted_rows(want)
    assert len(got_rows) >= len(want_rows) - 10
    assert set(got_rows) <= set(want_rows)


def test_stream_session_agg_runs(spark):
    ev = SC.stream_table(spark, SF_DIR, "events")
    agg = SC.session_agg(
        SC.with_bounded_out_of_orderness(ev, "ts", "1 minute"),
        "ts",
        "1 hour",
        ["user_id"],
        [F.count("*").alias("n")],
    )
    SC.run_to_memory(agg, "t_session", "append")
    got = spark.sql("SELECT * FROM t_session")
    assert got.columns == ["user_id", "n", "window_start", "window_end"]
    # sessions emitted must respect the gap: end - start covers >= 1 event
    assert got.where(F.col("n") < 1).count() == 0


def test_stream_dropduplicates_within_watermark(spark):
    ev = SC.stream_table(spark, SF_DIR, "events")
    dd = (
        SC.with_bounded_out_of_orderness(ev, "ts", "10 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    SC.run_to_memory(dd, "t_dd", "append")
    got = spark.sql("SELECT user_id, event_type, count(*) c FROM t_dd GROUP BY 1,2")
    # within-watermark dedup can keep >1 per key over the whole stream,
    # but per (user, type) far fewer than the raw count
    raw = Catalog(spark, SF_DIR).events.groupBy("user_id", "event_type").count()
    assert got.count() <= raw.count()
    assert got.count() > 0


def test_stream_topn_matches_batch(spark):
    ev = SC.stream_table(spark, SF_DIR, "events").select(
        "user_id", "value", "event_id"
    )
    topn = SS.topn_stream(ev, "user_id", "value", ["event_id"], n=3)
    SC.run_to_memory(topn, "t_topn", "update")
    # last emission per key is the final Top-3
    got = spark.sql(
        """
        SELECT user_id, rn, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, rn
                                       ORDER BY value DESC) dup
          FROM t_topn) WHERE dup = 1
        """
    )
    batch = Catalog(spark, SF_DIR).events
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    want = (
        batch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "rn", "value")
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_dedup_keep_last_matches_batch(spark):
    ev = SC.stream_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    dd = SS.dedup_keep_last_stream(ev, "user_id", "ts", ["event_type"])
    SC.run_to_memory(dd, "t_keep_last", "update")
    got = spark.sql(
        """
        SELECT user_id, ts_ms, event_type FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC) rn
          FROM t_keep_last) WHERE rn = 1
        """
    )
    batch = Catalog(spark, SF_DIR).events
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = (
        batch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.unix_millis("ts").alias("ts_ms"), "event_type")
    )
    # ts_ms must agree; event_type may differ when two events share the
    # max timestamp (stream uses arrival order on ties)
    assert _sorted_rows(got.select("user_id", "ts_ms")) == _sorted_rows(
        want.select("user_id", "ts_ms")
    )


def _micro_batched_events(spark, tmpdir, n_batches=3):
    """Write the events table as n time-ordered parquet files so the
    file-stream source (maxFilesPerTrigger=1) replays them as separate
    micro-batches — the operator-harness analogue of pushing elements
    + watermarks (OneInputStreamOperatorTestHarness)."""
    import os
    import time

    ev = (
        Catalog(spark, SF_DIR).events
        # collapse to unique (user_id, millisecond) so batch/stream
        # tie-breaks and RANGE peer-row semantics can't differ
        .groupBy(
            "user_id",
            F.timestamp_millis(F.unix_millis("ts")).alias("ts"),
        )
        .agg(F.sum("value").alias("value"))
    )
    rows = ev.orderBy("ts").collect()
    cut = len(rows) // n_batches + 1
    schema = ev.schema
    for i in range(n_batches):
        chunk = rows[i * cut : (i + 1) * cut]
        if not chunk:
            continue
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(tmpdir, "in"))
        time.sleep(1.05)  # distinct mtimes → deterministic replay order
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(tmpdir, "in")),
        ev,
    )


def test_stream_over_unbounded_matches_batch(spark, tmp_path):
    """Streaming OVER (UNBOUNDED PRECEDING): per-row running aggregates
    across micro-batch boundaries must equal the batch window plan
    (StreamExecOverAggregate.java:92 semantics)."""
    stream, batch = _micro_batched_events(spark, str(tmp_path))
    out = SS.over_unbounded_preceding_stream(stream, "user_id", "ts", "value")
    SC.run_to_memory(out, "t_over_unb", "append")
    got = spark.sql(
        "SELECT user_id, ts_ms, run_sum, run_cnt, run_min, run_max FROM t_over_unb"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = batch.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.sum("value").over(w).alias("run_sum"),
        F.count("*").over(w).alias("run_cnt"),
        F.min("value").over(w).alias("run_min"),
        F.max("value").over(w).alias("run_max"),
    )
    got_rows = sorted(
        (r[0], r[1], round(r[2], 6), r[3], round(r[4], 6), round(r[5], 6))
        for r in got.collect()
    )
    want_rows = sorted(
        (r[0], r[1], round(r[2], 6), r[3], round(r[4], 6), round(r[5], 6))
        for r in want.collect()
    )
    assert got_rows == want_rows


def test_stream_over_range_bounded_matches_batch(spark, tmp_path):
    """Streaming OVER with a 1-hour RANGE frame: expired rows are
    retracted as the frame slides (RowTimeRangeBoundedPrecedingFunction
    semantics); result must equal the batch rangeBetween plan."""
    stream, batch = _micro_batched_events(spark, str(tmp_path))
    out = SS.over_range_bounded_stream(
        stream, "user_id", "ts", "value", range_ms=3_600_000
    )
    SC.run_to_memory(out, "t_over_rng", "append")
    got = spark.sql("SELECT user_id, ts_ms, frame_sum, frame_cnt FROM t_over_rng")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    want = batch.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.sum("value").over(w).alias("frame_sum"),
        F.count("*").over(w).alias("frame_cnt"),
    )
    got_rows = sorted(
        (r[0], r[1], round(r[2], 6), r[3]) for r in got.collect()
    )
    want_rows = sorted(
        (r[0], r[1], round(r[2], 6), r[3]) for r in want.collect()
    )
    assert got_rows == want_rows


def test_stream_temporal_join_matches_batch_asof(spark):
    ev = SC.stream_table(spark, SF_DIR, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").cast("string").alias("event_id")
    )
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").cast("string").alias("value")
    )
    joined = SS.temporal_join_stream(
        left, right, "user_id", "ts", ["event_id"], ["value"]
    )
    SC.run_to_memory(joined, "t_temporal", "append")
    got = spark.sql(
        "SELECT CAST(event_id AS LONG) event_id, CAST(value AS DOUBLE) value FROM t_temporal"
    )

    from flink_spark.operators.joins import asof_join

    batch = Catalog(spark, SF_DIR).events
    purchases = batch.where(F.col("event_type") == "purchase")
    clicks = (
        batch.where(F.col("event_type") == "click")
        .select("user_id", "ts", "value", "event_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    want = asof_join(
        purchases.select("event_id", "user_id", "ts"),
        clicks,
        key="user_id",
        ts_left="ts",
        ts_right="ts",
        payload={"value": "value"},
    ).select("event_id", "value")
    assert _sorted_rows(got) == _sorted_rows(want)
