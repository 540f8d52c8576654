"""Per-window triggers and evictors — the escape-hatch layer.

Reference: flink-streaming-java/.../windowing/triggers/ (CountTrigger,
ContinuousEventTimeTrigger, …, 10 files) and .../windowing/evictors/
(CountEvictor, TimeEvictor, DeltaEvictor). Spark has no per-window
trigger API (only query-level Trigger.ProcessingTime/AvailableNow), so:

- **Evictors** are expressed declaratively: "evict all but the last N
  rows / the last T ms before firing" is a rank-or-filter over the
  window's rows, which Catalyst runs as an ordinary window function —
  batch and micro-batch alike, and SQL-oracle-checkable.
- **CountTrigger early firing** needs state (fire every N elements
  *across* micro-batches), so it runs on ``applyInPandasWithState``
  keyed by (key, window_start) — each firing emits the running
  aggregate with its element count, the same intermediate-results
  contract as Flink's non-purging CountTrigger.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def count_evictor_window_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: str,
    keep_last_n: int,
    order_col: str | None = None,
) -> DataFrame:
    """CountEvictor(keep_last_n) + sum/count aggregate per tumbling window.

    Only the last N rows (by event time, tie-broken by ``order_col``) of
    each (key, window) contribute to the aggregate — everything earlier
    is evicted before firing (CountEvictor.evictBefore semantics).
    Declarative plan: window rank desc → filter ≤ N → agg; one shuffle.
    """
    tie = order_col or value_col
    w = Window.partitionBy(key, "window_start").orderBy(
        F.col(ts_col).desc(), F.col(tie).desc()
    )
    return (
        df.withColumn("window_start", F.window(ts_col, size).start)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= keep_last_n)
        .groupBy(key, "window_start")
        .agg(
            F.sum(value_col).alias("agg_sum"),
            F.count("*").alias("agg_cnt"),
        )
    )


def time_evictor_window_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: str,
    keep_ms: int,
) -> DataFrame:
    """TimeEvictor(keep_ms): rows older than (window max ts - keep_ms)
    are evicted before the aggregate fires."""
    wmax = Window.partitionBy(key, "window_start")
    return (
        df.withColumn("window_start", F.window(ts_col, size).start)
        .withColumn("_tms", F.unix_millis(F.col(ts_col)))
        .withColumn("_max", F.max("_tms").over(wmax))
        .where(F.col("_tms") > F.col("_max") - keep_ms)
        .groupBy(key, "window_start")
        .agg(
            F.sum(value_col).alias("agg_sum"),
            F.count("*").alias("agg_cnt"),
        )
    )


def count_trigger_window_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: str,
    fire_every: int,
) -> DataFrame:
    """Tumbling-window sum/count with CountTrigger(fire_every) early
    firing: an intermediate result row is emitted each time the window
    has accumulated ``fire_every`` more elements (across micro-batches —
    the trigger count lives in state), without purging the window.

    Output: (key, window_start_ms, n_elements, run_sum) — one row per
    firing, n_elements ∈ {N, 2N, 3N, …} plus a final batch-end firing
    when new elements arrived since the last count fire (the micro-batch
    boundary plays the watermark's role for observability).
    """
    key_type = df.schema[key].dataType.simpleString()
    tagged = df.select(
        F.col(key),
        F.unix_millis(F.window(ts_col, size).start).alias("w_start"),
        F.unix_millis(F.col(ts_col)).alias("tms"),
        F.col(value_col).cast("double").alias("v"),
    )
    out_fields = (
        f"{key} {key_type}, window_start_ms long, n_elements long, "
        "run_sum double"
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            cnt, s, since_fire = st["cnt"], st["sum"], st["since"]
        else:
            cnt, s, since_fire = 0, 0.0, 0
        rows = []
        for pdf in pdfs:
            rows.extend(pdf[["tms", "v"]].itertuples(index=False))
        rows.sort()
        fires = []
        for _tms, v in rows:
            cnt += 1
            s += float(v)
            since_fire += 1
            if since_fire >= fire_every:
                fires.append((k[0], k[1], cnt, s))
                since_fire = 0
        if since_fire > 0:
            # batch-end firing for the tail (micro-batch = watermark tick)
            fires.append((k[0], k[1], cnt, s))
        state.update(
            (json.dumps({"cnt": cnt, "sum": s, "since": since_fire}),)
        )
        yield pd.DataFrame(
            fires, columns=[key, "window_start_ms", "n_elements", "run_sum"]
        )

    return tagged.groupBy(key, "w_start").applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="st string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def delta_trigger_window_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: str,
    delta: float,
) -> DataFrame:
    """DeltaTrigger(threshold) (windowing/triggers/DeltaTrigger.java):
    the window fires each time the current element's value deviates from
    the value at the LAST FIRING by more than ``delta`` (here the delta
    function is abs difference — the reference takes a user
    DeltaFunction; pass a preprocessed column for custom deltas).

    Emits one row per firing: (key, window_start_ms, n_elements,
    run_sum, fire_value). State per (key, window) is O(1): the running
    accumulator and the last-fire value, exactly the reference's
    ValueState layout.
    """
    key_type = df.schema[key].dataType.simpleString()
    tagged = df.select(
        F.col(key),
        F.unix_millis(F.window(ts_col, size).start).alias("w_start"),
        F.unix_millis(F.col(ts_col)).alias("tms"),
        F.col(value_col).cast("double").alias("v"),
    )
    out_fields = (
        f"{key} {key_type}, window_start_ms long, n_elements long, "
        "run_sum double, fire_value double"
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            cnt, s, last_fire = st["cnt"], st["sum"], st["last"]
        else:
            cnt, s, last_fire = 0, 0.0, None
        rows = []
        for pdf in pdfs:
            rows.extend(pdf[["tms", "v"]].itertuples(index=False))
        rows.sort()
        fires = []
        for _tms, v in rows:
            cnt += 1
            s += float(v)
            if last_fire is None:
                last_fire = float(v)  # first element arms the trigger
            elif abs(float(v) - last_fire) > delta:
                fires.append((k[0], k[1], cnt, s, float(v)))
                last_fire = float(v)
        state.update((json.dumps({"cnt": cnt, "sum": s, "last": last_fire}),))
        yield pd.DataFrame(
            fires,
            columns=[key, "window_start_ms", "n_elements", "run_sum",
                     "fire_value"],
        )

    return tagged.groupBy(key, "w_start").applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="st string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def continuous_event_time_trigger_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    size: str,
    interval_ms: int,
) -> DataFrame:
    """ContinuousEventTimeTrigger(interval)
    (windowing/triggers/ContinuousEventTimeTrigger.java): inside each
    window, an early (non-purging) result fires every ``interval_ms`` of
    EVENT time — the firing grid is aligned to the interval, and each
    firing reflects all elements at-or-before the grid point.

    Emits (key, window_start_ms, fire_time_ms, n_elements, run_sum) —
    one row per grid firing plus the final batch-end firing (the
    micro-batch boundary standing in for the closing watermark, as in
    count_trigger_window_agg). State per (key, window) is the
    accumulator and the next grid deadline, the reference's
    ReducingState<Long> fire timestamp.
    """
    key_type = df.schema[key].dataType.simpleString()
    tagged = df.select(
        F.col(key),
        F.unix_millis(F.window(ts_col, size).start).alias("w_start"),
        F.unix_millis(F.col(ts_col)).alias("tms"),
        F.col(value_col).cast("double").alias("v"),
    )
    out_fields = (
        f"{key} {key_type}, window_start_ms long, fire_time_ms long, "
        "n_elements long, run_sum double"
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            cnt, s, next_fire = st["cnt"], st["sum"], st["next"]
        else:
            cnt, s, next_fire = 0, 0.0, None
        rows = []
        for pdf in pdfs:
            rows.extend(pdf[["tms", "v"]].itertuples(index=False))
        rows.sort()
        fires = []
        emitted_at = None
        for tms, v in rows:
            if next_fire is None:
                # align the first deadline to the interval grid
                next_fire = (tms // interval_ms + 1) * interval_ms
            # strict >: an element exactly at the grid point is part of
            # that firing (the watermark reaching T covers ts <= T)
            while tms > next_fire:
                fires.append((k[0], k[1], next_fire, cnt, s))
                emitted_at = next_fire
                next_fire += interval_ms
            cnt += 1
            s += float(v)
        if rows and emitted_at != rows[-1][0]:
            # batch-end firing with everything seen so far
            fires.append((k[0], k[1], rows[-1][0], cnt, s))
        state.update(
            (json.dumps({"cnt": cnt, "sum": s, "next": next_fire}),)
        )
        yield pd.DataFrame(
            fires,
            columns=[key, "window_start_ms", "fire_time_ms", "n_elements",
                     "run_sum"],
        )

    return tagged.groupBy(key, "w_start").applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="st string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
