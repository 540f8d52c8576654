"""Window table-valued functions: TUMBLE / HOP / CUMULATE / SESSION.

Reference: StreamExecWindowAggregate.java:86 with slice assigners
SliceAssigners.java:44 (tumbling:61, hopping:77, cumulative:94) and the
SQL TVFs TUMBLE/HOP/CUMULATE (FlinkSqlOperatorTable.java:1218-1221).

TUMBLE and HOP are Spark's built-in `window()`; SESSION is
`session_window()`. CUMULATE has no Spark built-in — it is composed as
a generated explode of slice-ends followed by a normal aggregation,
which is exactly the expanding-windows semantics: a row with timestamp
t in the tumble window [W, W+max) belongs to every window
[W, W+k*step) whose end exceeds t.

Scale note: the CUMULATE explode multiplies rows by at most
(max_size/step) before the shuffle — same blow-up Flink avoids with
slice sharing. For large fan-outs pre-aggregate per (slice, key) first
(partial agg below) so the shuffle carries slices, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(df: DataFrame, ts: str, size: str) -> DataFrame:
    """TUMBLE TVF: fixed non-overlapping windows → window_start/window_end cols."""
    return (
        df.withColumn("__w", F.window(ts, size))
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def hop(df: DataFrame, ts: str, size: str, slide: str) -> DataFrame:
    """HOP TVF: overlapping windows — each row lands in size/slide windows."""
    return (
        df.withColumn("__w", F.window(ts, size, slide))
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def cumulate(df: DataFrame, ts: str, step: str, max_size: str) -> DataFrame:
    """CUMULATE TVF (SliceAssigners.java:94): expanding windows anchored at
    each `max_size` boundary, ends at k*step for k=1..max_size/step; a row
    belongs to every window whose end is after its timestamp.

    Emits one output row per (input row, covering window) with
    window_start/window_end columns, like the Flink TVF.
    """
    anchored = df.withColumn("window_start", F.window(ts, max_size)["start"])
    ends = F.sequence(
        F.col("window_start") + F.expr(f"INTERVAL {step}"),
        F.col("window_start") + F.expr(f"INTERVAL {max_size}"),
        F.expr(f"INTERVAL {step}"),
    )
    return anchored.withColumn("window_end", F.explode(ends)).where(
        F.col("window_end") > F.col(ts)
    )


def session(df: DataFrame, ts: str, gap: str, *keys: str) -> DataFrame:
    """SESSION windows in batch: gap-based sessionization per key via
    lag + cumulative-sum (single shuffle on keys, per-partition sort).
    Streaming uses Spark's built-in session_window() instead.

    Adds a `session_id` column (0-based per key).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(ts))
    prev = F.lag(ts).over(w)
    new_session = (
        F.when(prev.isNull(), F.lit(1))
        .when(F.col(ts) > prev + F.expr(f"INTERVAL {gap}"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1,
    )


def session_dynamic(
    df: DataFrame,
    ts: str,
    gap_ms_col: str,
    *keys: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Dynamic-gap SESSION windows (DynamicEventTimeSessionWindows.java:44,
    flink-streaming-java/.../windowing/assigners/): each element carries
    its own gap — an element at t opens/extends a session to t+gap(t),
    and session windows that overlap merge (MergingWindowAssigner).

    The merge fixpoint is equivalent to a single ordered scan: a new
    session starts exactly when an element's time exceeds the running
    max of (time + gap) over all earlier elements of the key. That is a
    declarative running-max window (one shuffle on the key, one
    per-partition sort) — identical asymptotics to the reference's
    merging window state, and SQL-oracle-expressible.

    ``gap_ms_col`` is a per-row gap in milliseconds (the reference's
    SessionWindowTimeGapExtractor.extract). Adds `session_id` (0-based
    per key).
    """
    from pyspark.sql import Window as W

    order = [F.col(ts)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    tms = F.unix_millis(F.col(ts))
    prev_end = F.max(tms + F.col(gap_ms_col)).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    new_session = (
        F.when(prev_end.isNull(), F.lit(1))
        .when(tms > prev_end, F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1,
    )
