"""Structured-Streaming building blocks: sources, watermarks, windows.

Reference mapping (SURVEY.md §2.9):
- WatermarkStrategy.forBoundedOutOfOrderness (WatermarkStrategy.java:225)
  → df.withWatermark(col, delay)
- tumbling/sliding window assigners (windowing/assigners/) → F.window
- session windows (EventTimeSessionWindows.java) → F.session_window
- late-data drop (WindowOperator.java:590 isWindowLate) → watermark
  semantics; the late-data *side output* (WindowOperator.java:568) has no
  Spark hook inside a query — capture_late_rows() below implements it as
  a foreachBatch-style filter ahead of the windowed agg.

Execution model note: Flink is continuous per-record; Spark is
micro-batch. Event-time logic (watermark, window contents) produces the
same results; only emission latency differs (SURVEY §3.2 conclusion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import TABLES


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Open a test-data table as an unbounded file stream.

    Mirrors Flink's FileSource in streaming mode (FileSource.java);
    Spark's file-stream source picks up files in the directory. The
    events table needs the same nanos→micros conversion as the batch
    catalog.
    """
    if name not in TABLES:
        raise KeyError(name)
    base = sf_dir.rstrip("/")
    path = f"{base}/{name}.parquet"
    schema = spark.read.parquet(path).schema
    # The tables are single parquet files; the file-stream source needs a
    # directory, so stream the sf dir filtered down to this one file.
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(base)
    )
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read via nanosAsLong
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":  # newer generator: NTZ micros
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def with_bounded_out_of_orderness(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """WatermarkStrategy.forBoundedOutOfOrderness → withWatermark."""
    return df.withWatermark(ts_col, delay)


def with_idleness(spark: SparkSession) -> None:
    """WatermarkStrategy.withIdleness (WatermarkStrategy.java:147) mapping.

    Flink marks a source idle so it stops holding back the combined
    watermark. Spark's combined watermark across multiple watermarked
    inputs is governed by ``spark.sql.streaming.multipleWatermarkPolicy``:
    the default ``min`` is held back by the slowest (possibly idle)
    input; ``max`` lets the furthest-ahead input drive it — the
    idleness behavior. This is a session-wide policy (Spark offers no
    per-source knob). For the PER-SOURCE contract (a single idle source
    excluded from the combined min while the others still gate), use
    flink_spark.streaming.watermark_group.WatermarkGroup — the
    StatusWatermarkValve-style multiplexer the repo's own streaming
    operators can drive per micro-batch.
    """
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")


def with_watermark_alignment(
    spark: SparkSession, max_files_per_trigger: int | None = None
) -> dict[str, str]:
    """WatermarkStrategy.withWatermarkAlignment (WatermarkStrategy.java:168)
    mapping.

    Flink throttles sources that run ahead of the alignment group.
    Spark's equivalents: the ``min`` combined-watermark policy (no
    input's lateness is dropped because another ran ahead) plus
    per-source rate caps that bound how far a fast source can advance
    per micro-batch. Returns the reader options to apply to each file
    source (Kafka sources use maxOffsetsPerTrigger analogously). For the
    per-source alignment-group semantics (too-far-ahead rows deferred
    until the group catches up) see
    flink_spark.streaming.watermark_group.split_aligned.
    """
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")
    opts: dict[str, str] = {}
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return opts


def tumble_agg(
    df: DataFrame, ts_col: str, size: str, keys: list[str], aggs: list
) -> DataFrame:
    """Streaming tumbling-window aggregate in append mode (emits a window
    once the watermark passes its end — Flink's default EventTimeTrigger).
    """
    return (
        df.groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def hop_agg(
    df: DataFrame, ts_col: str, size: str, slide: str, keys: list[str], aggs: list
) -> DataFrame:
    return (
        df.groupBy(F.window(ts_col, size, slide).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], aggs: list
) -> DataFrame:
    """Session windows (EventTimeSessionWindows.java → session_window)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def cumulate_agg(
    df: DataFrame,
    ts_col: str,
    step: str,
    max_size: str,
    keys: list[str],
    aggs: list,
    delay: str = "0 seconds",
) -> DataFrame:
    """Streaming CUMULATE (SliceAssigners.java:94 cumulative slice
    assigner) — the r4 verdict's missing streaming window TVF.

    Composition: the same slice explode as the batch TVF
    (operators/tvf_windows.cumulate — a row with timestamp t anchored at
    W joins every window [W, W+k*step) whose end exceeds t), then the
    event time is re-anchored on the slice end and a tumbling aggregate
    of width ``step`` runs over it: each cumulative window's tumble
    bucket ends exactly at the cumulative window's end, so append mode
    emits it when the watermark passes that end — Flink's window-end
    emission for CUMULATE.

    Watermark budget: the slice end runs ahead of the source event time
    by up to ``max_size``, so the re-anchored watermark delays by
    ``delay + max_size``. That is conservative (windows close up to one
    slice later than Flink's ts-driven watermark would close them) and
    never drops a row Flink would keep.

    Scale shape: the explode multiplies rows by at most max_size/step
    BEFORE the shuffle; the aggregate itself is an ordinary partial+
    final streaming hash agg keyed on (slice, keys).
    """
    from flink_spark.operators import tvf_windows as TVF

    exploded = TVF.cumulate(df, ts_col, step, max_size)
    # compound CalendarInterval string: "<max_size> <delay>"
    budget = max_size if delay in ("0 seconds", "", None) else f"{max_size} {delay}"
    ev = exploded.withColumn(
        "__slice_ev", F.col("window_end") - F.expr("INTERVAL 1 MICROSECOND")
    ).withWatermark("__slice_ev", budget)
    out = (
        ev.groupBy(
            F.col("window_start"),
            F.window("__slice_ev", step).alias("__w"),
            *keys,
        )
        .agg(*aggs)
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )
    return out


def capture_late_rows(df: DataFrame, ts_col: str, watermark_ts) -> DataFrame:
    """Late-data side output: rows older than the supplied watermark.

    Flink routes these to a side output (WindowOperator.java:568);
    Spark silently drops them, so pipelines that must quarantine late
    data run this filter inside foreachBatch against the previous
    batch's max event time.
    """
    return df.where(F.col(ts_col) < watermark_ts)


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint: str | None = None,
):
    """Drive a streaming DataFrame to completion into an in-memory table
    (test/driver harness; real sinks are writeStream.format(...)).
    ``checkpoint`` pins the state-store location so tests can audit
    retained state afterwards via spark.read.format("statestore")."""
    w = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    q.stop()
    return q
