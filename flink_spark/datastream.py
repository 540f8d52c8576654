"""DataStream-API compat layer over Spark DataFrames.

Mirrors the user surface of flink-streaming-java/.../datastream/
DataStream.java (map:572, flatMap:608, filter:695, union:227,
connect:253, broadcast:419, keyBy:290, partitioning :448-503, side
outputs via OutputTag) and KeyedStream.java (rolling reduce/sum/min/
max:771-1038), re-expressed declaratively:

- Column-expression ``map``/``filter`` stay JVM-side (Catalyst projects/
  filters — the fast path). Arbitrary Python callables go through
  Arrow-batched ``mapInPandas`` (the documented slow path, ~10-100×
  cheaper than row-at-a-time UDFs).
- ``key_by`` produces a KeyedStream whose rolling aggregates are
  event-order window functions (batch) — the per-record running emission
  of Flink's rolling reduce.
- ``connect`` normalizes both schemas and tags the origin — the
  CoMap/CoFlatMap pattern without a second type system.
- Side outputs (OutputTag) become one filtered DataFrame per tag from a
  single pass; Catalyst reuses the scan via column pruning.

Works identically for batch and streaming DataFrames except where noted
(rolling aggs need ``transformWithStateInPandas`` in streaming — see
flink_spark.streaming.stateful).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class StreamExecutionEnvironment:
    """StreamExecutionEnvironment.java surface (get_execution_environment,
    from_collection:1210, socket_text_stream:1671, read_text_file:1379)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @staticmethod
    def get_execution_environment(
        spark: SparkSession | None = None,
    ) -> "StreamExecutionEnvironment":
        if spark is None:
            from flink_spark.session import get_spark

            spark = get_spark("datastream_env")
        return StreamExecutionEnvironment(spark)

    def from_collection(self, rows: Iterable, schema=None) -> "DataStream":
        return DataStream(self.spark.createDataFrame(list(rows), schema=schema))

    def from_sequence(self, start: int, end: int) -> "DataStream":
        from flink_spark import sources

        return DataStream(sources.from_sequence(self.spark, start, end))

    def from_source(self, df: DataFrame) -> "DataStream":
        return DataStream(df)

    def read_text_file(self, path: str) -> "DataStream":
        return DataStream(self.spark.read.text(path))

    def socket_text_stream(self, host: str, port: int) -> "DataStream":
        from flink_spark import sources

        return DataStream(sources.socket_text_stream(self.spark, host, port))


class DataStream:
    """DataStream.java fluent surface over a DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- row-level ops (map:572 / flatMap:608 / filter:695 / process:647) ---
    def map(self, fn, output_type: str | None = None) -> "DataStream":
        """Column-expression list → select (fast); Python callable over
        pandas batches → mapInPandas with ``output_type`` DDL schema."""
        if callable(fn) and not isinstance(fn, Column):
            if output_type is None:
                raise ValueError("python-callable map needs output_type DDL")

            def run(batches):
                for pdf in batches:
                    yield fn(pdf)

            return DataStream(self.df.mapInPandas(run, schema=output_type))
        exprs = fn if isinstance(fn, (list, tuple)) else [fn]
        cols = [e if isinstance(e, Column) else F.expr(e) for e in exprs]
        return DataStream(self.df.select(*cols))

    def flat_map(self, expr: str | Column) -> "DataStream":
        """UDTF-style: the expression must produce an array; each element
        becomes a row (explode — Catalyst Generate, codegen'd)."""
        c = expr if isinstance(expr, Column) else F.expr(expr)
        return DataStream(self.df.select(F.explode(c).alias("value")))

    def filter(self, pred: str | Column) -> "DataStream":
        return DataStream(self.df.filter(pred))

    def process(self, fn: Callable, output_type: str) -> "DataStream":
        """process:647 — arbitrary per-batch logic via mapInPandas."""
        return DataStream(self.df.mapInPandas(fn, schema=output_type))

    def project(self, *field_positions: int) -> "DataStream":
        """project:712 (tuple projection by position)."""
        cols = self.df.columns
        return DataStream(self.df.select(*[cols[i] for i in field_positions]))

    # -- multi-stream (union:227 / connect:253 / broadcast:434) -------------
    def union(self, *others: "DataStream") -> "DataStream":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return DataStream(out)

    def connect(self, other: "DataStream") -> "ConnectedStreams":
        return ConnectedStreams(self, other)

    def connect_broadcast(self, control: "DataStream") -> "BroadcastConnectedStream":
        """DataStream.connect(BroadcastStream) (DataStream.java:300 →
        BroadcastConnectedStream.java): the broadcast state pattern —
        a small control/rules stream replicated to every parallel
        instance of the main stream."""
        return BroadcastConnectedStream(self, control)

    def co_group(
        self,
        other: "DataStream",
        key: str,
        ts_col: str,
        window_size: str,
        fn: Callable,
        output_type: str,
    ) -> "DataStream":
        """Windowed coGroup (DataStream.coGroup:720, CoGroupedStreams.java):
        per (window, key), BOTH sides' full row bags are handed to
        ``fn(left_pdf, right_pdf) -> pdf`` — unlike a join, the function
        also sees keys present on only one side (the other bag arrives
        empty), which is what makes coGroup strictly more general.

        Spark mapping: ``groupBy(window, key).cogroup(...).applyInPandas``
        — the cogroup shuffle co-locates both sides on (window, key), one
        shuffle per side, same as the reference's tagged-union window
        operator. Each pdf carries a ``window_start`` column (the window
        struct is flattened so pandas sees a plain timestamp).
        """
        def prep(df):
            return df.withColumn(
                "window_start", F.window(ts_col, window_size).start
            )

        lg = prep(self.df).groupBy("window_start", key)
        rg = prep(other.df).groupBy("window_start", key)
        return DataStream(lg.cogroup(rg).applyInPandas(fn, schema=output_type))

    def broadcast(self) -> "DataStream":
        """broadcast:419 — mark for broadcast distribution (the consumer
        join will replicate this side to every task)."""
        return DataStream(F.broadcast(self.df))

    # -- side outputs (OutputTag / SideOutputDataStream.java) ---------------
    def split_by_tags(
        self, tags: dict[str, str | Column], keep_main: str | Column | None = None
    ) -> tuple["DataStream", dict[str, "DataStream"]]:
        """One pass → (main, {tag: stream}). Each side output is a
        filtered view; Catalyst shares the scan."""
        sides = {name: DataStream(self.df.filter(cond)) for name, cond in tags.items()}
        main = self.df if keep_main is None else self.df.filter(keep_main)
        return DataStream(main), sides

    # -- partitioning (:360-503) -------------------------------------------
    def shuffle(self, n: int | None = None) -> "DataStream":
        return DataStream(self.df.repartition(n) if n else self.df.repartition())

    rebalance = shuffle

    def rescale(self, n: int) -> "DataStream":
        return DataStream(self.df.coalesce(n))

    def global_(self) -> "DataStream":
        return DataStream(self.df.repartition(1))

    def sort_partition(self, *cols: str | Column, ascending: bool = True) -> "DataStream":
        """DataSet.sortPartition (flink-java/.../DataSet.java) →
        sortWithinPartitions: a partition-local sort, no shuffle — the
        cheap pre-ordering used before merge-joins or ordered sinks."""
        cs = [F.col(c) if isinstance(c, str) else c for c in cols]
        if not ascending:
            cs = [c.desc() for c in cs]
        return DataStream(self.df.sortWithinPartitions(*cs))

    def partition_custom(self, *cols: str) -> "DataStream":
        """partitionCustom:360 → hash-partition on expressions (Spark's
        shuffle hash replaces the user Partitioner object)."""
        return DataStream(self.df.repartition(*[F.col(c) for c in cols]))

    # -- event time ---------------------------------------------------------
    def assign_timestamps_and_watermarks(
        self, ts_col: str, delay: str
    ) -> "DataStream":
        """WatermarkStrategy.forBoundedOutOfOrderness:225 →
        withWatermark (streaming only; no-op marker in batch)."""
        if self.df.isStreaming:
            return DataStream(self.df.withWatermark(ts_col, delay))
        return self

    def key_by(self, *cols: str) -> "KeyedStream":
        return KeyedStream(self.df, list(cols))

    # -- sinks --------------------------------------------------------------
    # Audited against the reference's full DataStream sink surface
    # (flink-streaming-java/.../datastream/DataStream.java:934-1319):
    # print/printToErr (+identifier), writeAsText/writeAsCsv (+WriteMode
    # overloads), writeToSocket, writeUsingOutputFormat, addSink, sinkTo.

    def print(self, n: int = 20, sink_identifier: str | None = None) -> None:
        """DataStream.java:934,967 — print [with a prefixed identifier]."""
        if sink_identifier:
            print(f"== {sink_identifier} ==")
        self.df.show(n, truncate=False)

    def print_to_err(self, n: int = 20,
                     sink_identifier: str | None = None) -> None:
        """DataStream.java:950,984 — same report on stderr."""
        import contextlib
        import sys as _sys

        with contextlib.redirect_stdout(_sys.stderr):
            self.print(n, sink_identifier)

    def write_as_text(self, path: str, write_mode: str = "error") -> None:
        """DataStream.java:1002,1021 — WriteMode NO_OVERWRITE (default)
        / OVERWRITE map onto Spark save modes error/overwrite."""
        from flink_spark import sinks

        sinks.write_as_text(self.df, path, mode=write_mode)

    def write_as_csv(self, path: str, write_mode: str = "error",
                     **options: str) -> None:
        """DataStream.java:1041-1093 (incl. the row/field-delimiter
        overload — pass sep=.../lineSep=... options)."""
        from flink_spark import sinks

        sinks.write_as_csv(self.df, path, mode=write_mode, **options)

    def write_to_socket(self, host: str, port: int,
                        serializer: Callable[[tuple], bytes] | None = None,
                        ) -> None:
        """DataStream.java:1118 — every partition opens a client socket
        to host:port and streams its rows through the serialization
        schema, exactly Flink's per-subtask socket client. Executed
        distributed via foreachPartition — rows never collect to the
        driver."""
        ser = serializer or (lambda row: (",".join(
            "" if v is None else str(v) for v in row) + "\n").encode())

        def send(rows):
            import socket as _socket

            with _socket.create_connection((host, port)) as s:
                for r in rows:
                    s.sendall(ser(tuple(r)))

        self.df.foreachPartition(send)

    def write_using_output_format(self, open_fn: Callable,
                                  write_fn: Callable,
                                  close_fn: Callable | None = None) -> None:
        """DataStream.java:1142 — OutputFormat's open/writeRecord/close
        lifecycle, run once per partition (Flink runs it once per
        subtask)."""
        def run(rows):
            ctx = open_fn()
            try:
                for r in rows:
                    write_fn(ctx, tuple(r))
            finally:
                if close_fn is not None:
                    close_fn(ctx)

        self.df.foreachPartition(run)

    def add_sink(self, invoke: Callable) -> None:
        """DataStream.java:1232 — SinkFunction.invoke(value) per record,
        executed on the executors (df.foreach), never driver-side."""
        self.df.foreach(lambda row: invoke(tuple(row)))

    def sink_to(self, path: str, fmt: str = "parquet", mode: str = "error") -> None:
        """DataStream.java:1285 — the unified Sink V2 entry; file sinks
        map onto Spark's native writers."""
        from flink_spark import sinks

        sinks.write_file(self.df, path, fmt=fmt, mode=mode)

    def execute_and_collect(self, limit: int | None = None):
        df = self.df.limit(limit) if limit else self.df
        return df.collect()


class BroadcastConnectedStream:
    """Broadcast state pattern (BroadcastConnectedStream.java +
    co/BroadcastProcessFunction.java): the control side is snapshotted
    and replicated to every task; the main stream is processed against
    it with read-only access — Flink's read-only broadcast state view.

    The control snapshot is collected driver-side and shipped as a Spark
    broadcast variable: the reference has the identical contract (the
    broadcast MapState must fit in each task's memory,
    BroadcastProcessFunction works on a per-instance copy). For a
    *changing* control stream, re-invoke per micro-batch inside
    ``foreachBatch`` — the micro-batch boundary is the state-update
    point, matching processBroadcastElement-then-processElement ordering
    at batch granularity.
    """

    def __init__(self, main: "DataStream", control: "DataStream"):
        self.main = main
        self.control = control

    def process(self, fn: Callable, output_type: str) -> "DataStream":
        """fn(main_pdf, control_rows: list[dict]) -> pdf, applied per
        Arrow batch of the main stream with the full control snapshot."""
        rows = [r.asDict() for r in self.control.df.collect()]
        bc = self.main.df.sparkSession.sparkContext.broadcast(rows)

        def run(batches):
            state = bc.value
            for pdf in batches:
                yield fn(pdf, state)

        return DataStream(self.main.df.mapInPandas(run, schema=output_type))


class ConnectedStreams:
    """ConnectedStreams.java — two differently-typed streams, one
    operator. Normalization: ``co_map(left_exprs, right_exprs)`` projects
    both sides to a common schema and unions with an origin tag."""

    def __init__(self, left: DataStream, right: DataStream):
        self.left, self.right = left, right

    def co_map(
        self, left_exprs: list[str | Column], right_exprs: list[str | Column]
    ) -> DataStream:
        l_df = self.left.df.select(
            *[e if isinstance(e, Column) else F.expr(e) for e in left_exprs]
        ).withColumn("_origin", F.lit("left"))
        r_df = self.right.df.select(
            *[e if isinstance(e, Column) else F.expr(e) for e in right_exprs]
        ).withColumn("_origin", F.lit("right"))
        return DataStream(l_df.unionByName(r_df))


class KeyedStream:
    """KeyedStream.java — keyed rolling aggregates and process fn.

    Batch semantics: the rolling ops emit one row per input record with
    the running value up to that record in ``order_col`` order — exactly
    Flink's per-record continuous emission (KeyedStream.java:771-1038).
    """

    def __init__(self, df: DataFrame, keys: list[str]):
        self.df, self.keys = df, keys

    def _running(self, agg: Column, name: str, order_col: str) -> DataStream:
        w = (
            Window.partitionBy(*self.keys)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return DataStream(self.df.withColumn(name, agg.over(w)))

    def sum(self, col: str, order_col: str) -> DataStream:
        return self._running(F.sum(col), f"sum_{col}", order_col)

    def min(self, col: str, order_col: str) -> DataStream:
        return self._running(F.min(col), f"min_{col}", order_col)

    def max(self, col: str, order_col: str) -> DataStream:
        return self._running(F.max(col), f"max_{col}", order_col)

    def min_by(self, col: str, order_col: str) -> DataStream:
        """minBy: the full record whose ``col`` is the running minimum."""
        w = (
            Window.partitionBy(*self.keys)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        payload = F.struct(*[F.col(c) for c in self.df.columns])
        return DataStream(
            self.df.withColumn("_best", F.min_by(payload, F.col(col)).over(w)).select(
                "_best.*"
            )
        )

    def max_by(self, col: str, order_col: str) -> DataStream:
        w = (
            Window.partitionBy(*self.keys)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        payload = F.struct(*[F.col(c) for c in self.df.columns])
        return DataStream(
            self.df.withColumn("_best", F.max_by(payload, F.col(col)).over(w)).select(
                "_best.*"
            )
        )

    def reduce(
        self, fn: Callable, order_col: str, output_type: str | None = None
    ) -> DataStream:
        """Rolling reduce (KeyedStream.reduce:771): ``fn(acc, row) → acc``
        over plain row dicts, emitting the accumulator after every input
        row. Runs per key via applyInPandas; rows travel as dicts, not
        row-at-a-time pandas Series (iterrows is the slow path)."""
        schema = output_type or self.df.schema

        def per_key(pdf):
            pdf = pdf.sort_values(order_col)
            out = []
            acc = None
            for row in pdf.to_dict("records"):
                acc = row if acc is None else fn(acc, row)
                out.append(acc)
            import pandas as pd

            return pd.DataFrame(out)

        return DataStream(
            self.df.groupBy(*self.keys).applyInPandas(
                lambda _, pdf: per_key(pdf), schema=schema
            )
        )

    def window_tumble(self, ts: str, size: str) -> DataFrame:
        """WindowedStream entry: groupBy(window) handle for .agg."""
        return self.df.groupBy(F.window(ts, size), *self.keys)

    def window_apply(
        self, ts: str, size: str, fn: Callable, output_type: str
    ) -> DataStream:
        """WindowedStream.apply / ProcessWindowFunction
        (WindowedStream.java apply, ProcessWindowFunction.java): the full
        row bag of each (key, tumbling window) is handed to
        ``fn(key_tuple, pdf) -> pdf``; the key tuple is
        (*key_values, window_start). Output schema must include whatever
        window/key columns the function emits — the reference's Context
        (window bounds) is the window_start element of the key."""
        tagged = self.df.withColumn("__w_start", F.window(ts, size).start)

        def run(key, pdf):
            return fn(key, pdf.drop(columns=["__w_start"]))

        return DataStream(
            tagged.groupBy(*self.keys, "__w_start").applyInPandas(
                run, schema=output_type
            )
        )

    def process(self, fn: Callable, output_type: str) -> DataStream:
        """KeyedProcessFunction (KeyedStream.process:326) batch analogue:
        per-key pandas group apply."""
        return DataStream(
            self.df.groupBy(*self.keys).applyInPandas(fn, schema=output_type)
        )
