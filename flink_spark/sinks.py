"""Sinks: §2.1's sink surface, including an exactly-once file sink.

Reference analogues:
- DataStream sinks print:934 / writeAsText:1002 / writeAsCsv:1041 /
  addSink:1232 / sinkTo:1285 / executeAndCollect:1319
  (flink-streaming-java/.../datastream/DataStream.java) → ``df.show`` /
  ``df.write`` / ``writeStream``.
- Sink V2 two-phase commit (flink-core/src/main/java/org/apache/flink/
  api/connector/sink2/Sink.java, TwoPhaseCommittingSink.java): Flink
  stages writes per checkpoint and commits on checkpoint-complete. The
  Spark-native equivalent is ``foreachBatch`` + an idempotent commit
  keyed by ``batchId`` — the streaming checkpoint replays a batch with
  the SAME id after failure, so a batch-id ledger makes the sink
  effectively exactly-once (same contract as Flink's
  GlobalCommitter dedup).

Scale note: `exactly_once_file_sink` writes each micro-batch as its own
subdirectory (parallel executor writes, no driver data movement) and the
ledger holds one tiny marker file per batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class _LedgerFs:
    """Marker-file ledger on the Hadoop FileSystem of the ledger path.

    Using Hadoop's FS (via the session JVM) instead of ``os`` keeps the
    two-phase contract when ``out_dir`` is ``s3a://``/``hdfs://`` — the
    markers land next to the data, visible to every driver that might
    resume the query, not on one machine's local disk.
    """

    def __init__(self, spark, ledger_dir: str):
        jvm = spark._jvm
        self._path_cls = jvm.org.apache.hadoop.fs.Path
        ledger_path = self._path_cls(ledger_dir)
        self._fs = ledger_path.getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        self._dir = ledger_path
        self._fs.mkdirs(ledger_path)

    def _marker(self, batch_id: int):
        return self._path_cls(self._dir, str(batch_id))

    def committed(self, batch_id: int) -> bool:
        return bool(self._fs.exists(self._marker(batch_id)))

    def commit(self, batch_id: int) -> None:
        # createNewFile is atomic on HDFS; on object stores it is a
        # single PUT — either way the marker appears all-or-nothing.
        out = self._fs.create(self._marker(batch_id), True)
        out.write(bytearray(b"committed"))
        out.close()


def print_sink(df: DataFrame, n: int = 20) -> None:
    """DataStream.print:934."""
    df.show(n, truncate=False)


def write_as_text(df: DataFrame, path: str, mode: str = "error") -> None:
    """writeAsText:1002 — single string column per row."""
    cols = df.columns
    out = df if cols == ["value"] else df.selectExpr(
        "concat_ws(',', " + ", ".join(f"cast({c} as string)" for c in cols) + ") AS value"
    )
    out.write.mode(mode).text(path)


def write_as_csv(df: DataFrame, path: str, mode: str = "error", **options: str) -> None:
    """writeAsCsv:1041 → csv writer (header on by default here)."""
    df.write.mode(mode).options(header="true", **options).csv(path)


def write_file(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "error",
               partition_by: list[str] | None = None, **options: str) -> None:
    """FileSink bulk/row formats → ``df.write.format(fmt)``.

    ``partition_by`` maps Flink's bucket assigner (date/hour directory
    layout) to Spark partitioned layout — the thing that makes 100 TB
    re-reads prunable."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save(path)


def memory_sink(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """executeAndCollect:1319 for streams — results land in an in-memory
    table ``name`` (test harness only, like Flink's TestSink)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def foreach_batch_sink(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    *,
    checkpoint_dir: str,
    output_mode: str = "update",
    available_now: bool = False,
) -> StreamingQuery:
    """addSink:1232 / sinkTo:1285 → foreachBatch with checkpointing.

    ``fn(batch_df, batch_id)`` runs once per micro-batch; exactly-once
    requires fn to be idempotent in ``batch_id`` (see
    exactly_once_file_sink)."""
    writer = (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def exactly_once_file_sink(
    df: DataFrame,
    out_dir: str,
    *,
    checkpoint_dir: str,
    fmt: str = "parquet",
    available_now: bool = True,
) -> StreamingQuery:
    """Two-phase-commit file sink (TwoPhaseCommittingSink.java analogue).

    Stage: write batch ``i`` to ``out_dir/batch_id=i`` (executors write in
    parallel). Commit: create ``_ledger/i`` marker. On failure-replay the
    batch id repeats → the marker short-circuits the write, so downstream
    readers of committed markers see each batch exactly once. The ledger
    lives on ``out_dir``'s own FileSystem (Hadoop FS API), so the
    contract holds for s3a://, hdfs://, and file:// alike.
    """
    ledger_dir = out_dir.rstrip("/") + "/_ledger"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        ledger = _LedgerFs(batch_df.sparkSession, ledger_dir)
        if ledger.committed(batch_id):  # replayed batch — already committed
            return
        batch_df.write.mode("overwrite").format(fmt).save(
            out_dir.rstrip("/") + f"/batch_id={batch_id}"
        )
        ledger.commit(batch_id)

    return foreach_batch_sink(
        df,
        commit_batch,
        checkpoint_dir=checkpoint_dir,
        output_mode="append",
        available_now=available_now,
    )


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int | None = None,
    **properties: str,
) -> None:
    """JDBC sink (flink-connectors/flink-connector-jdbc JdbcSink.sink,
    JdbcOutputFormat) → ``df.write.jdbc``.

    Spark opens one connection per partition and writes executor-side
    in ``batchsize``-row JDBC batches (JdbcUtils.savePartition) — the
    same per-subtask batched-statement model as Flink's
    JdbcBatchingOutputFormat; no data moves through the driver.
    Exactly-once (Flink's JdbcXaSinkFunction) is out of scope: Spark's
    JDBC writer is at-least-once under task retry, same as Flink's
    non-XA sink.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if batch_size is not None:
        writer = writer.option("batchsize", str(batch_size))
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
