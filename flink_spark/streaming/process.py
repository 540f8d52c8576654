"""Keyed process functions with REAL timers — transformWithStateInPandas.

Reference: KeyedProcessFunction (flink-streaming-java/.../functions/
KeyedProcessFunction.java, registered via KeyedStream.process:326) with
per-key event-time timers (`Context.timerService().
registerEventTimeTimer`) and keyed ValueState. The older operators in
stateful.py use applyInPandasWithState (GroupState + timeout — no true
timers); this module maps the full timer contract onto Spark 4's
`transformWithStateInPandas` (StatefulProcessor + StatefulProcessorHandle
.registerTimer / handleExpiredTimer), which requires the RocksDB state
store provider (`ensure_rocksdb_state_store`).

Timer semantics match the reference: an event-time timer fires when the
watermark passes its timestamp; re-registering replaces the pending
timer (delete + register, as KeyedProcessFunction users do manually).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def timers_available() -> bool:
    """True when transformWithState's Python state protocol can run:
    it speaks protobuf to the JVM state server
    (pyspark/sql/streaming/proto/StateMessage_pb2), so the
    ``google.protobuf`` package must be importable — either a real
    installation or the pure-Python runtime vendored under
    flink_spark/_vendor (r7; activation is a no-op when real protobuf
    exists). Same construct-time gating policy as Avro/Kafka."""
    from flink_spark._vendor import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _require_timers() -> None:
    if not timers_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the python protobuf package "
            "(google.protobuf) for its state-server protocol; install "
            "`protobuf` to enable timer-based operators"
        )


def ensure_rocksdb_state_store(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store (the HDFS-
    backed default does not implement the new state API) — the direct
    analogue of picking EmbeddedRocksDBStateBackend in the reference."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    # If the session was created OUTSIDE flink_spark.session.get_spark,
    # the JVM captured its env before ensure_protobuf's PYTHONPATH
    # export — push the vendored runtime to workers via sc.environment /
    # addPyFile so the driver-side gate and worker-side reality agree.
    from flink_spark._vendor import propagate_to_workers

    propagate_to_workers(spark)


def inactivity_session_end(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    gap_ms: int,
    delay: str = "1 minute",
) -> DataFrame:
    """Session-end detection via per-key event-time timers: when a key
    receives no event for ``gap_ms`` of event time, one summary row
    (key, session_end_ms, n_events, total) is emitted and the session
    state cleared — the canonical KeyedProcessFunction timer example
    (and the semantics of the reference's session-window trigger).

    Each input batch advances the key's pending timer to
    (max event time seen + gap_ms); the timer fires when the WATERMARK
    passes it, exactly Flink's onTimer contract.
    """
    _require_timers()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ensure_rocksdb_state_store(df.sparkSession)
    key_type = df.schema[key].dataType.simpleString()
    key_col = key  # the callbacks' `key` param is the grouping tuple

    class Inactivity(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "last_ms long, n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            last_ms, n, total = (
                self._sess.get() if self._sess.exists() else (None, 0, 0.0)
            )
            for pdf in rows:
                ms = (
                    pdf[ts_col].astype("datetime64[ns]").astype("int64")
                    // 1_000_000
                )
                n += len(pdf)
                total += float(pdf[value_col].sum())
                mx = int(ms.max())
                last_ms = mx if last_ms is None else max(last_ms, mx)
            self._sess.update((last_ms, n, total))
            # slide the inactivity timer: replace any pending one
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ms + gap_ms)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._sess.exists():
                last_ms, n, total = self._sess.get()
                self._sess.clear()
                yield pd.DataFrame(
                    {
                        key_col: [key[0]],
                        "session_end_ms": [
                            expiredTimerInfo.getExpiryTimeInMs()
                        ],
                        "n_events": [n],
                        "total": [total],
                    }
                )

        def close(self) -> None:
            pass

    out_schema = (
        f"{key} {key_type}, session_end_ms long, n_events long, total double"
    )
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(key)
        .transformWithStateInPandas(
            Inactivity(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def topn_ttl_stream(
    df: DataFrame,
    key: str,
    ts_col: str,
    order_col: str,
    payload_cols: list[str],
    n: int,
    ttl_ms: int,
    ascending: bool = False,
    delay: str = "0 seconds",
) -> DataFrame:
    """Streaming Top-N whose idle-key state eviction runs on a REAL
    per-key event-time timer (r8, VERDICT r7 task #7) — the reference's
    updatable rank (StreamExecRank + StateTtlConfig) where expired rank
    state is dropped by the timer service, not by the key's next input.

    ``stateful.topn_stream`` (the applyInPandasWithState fallback, kept)
    can only evict when Spark re-invokes the function for the key —
    GroupStateTimeout blurs WHEN that happens. Here the timer fires as
    soon as the WATERMARK (driven by any key's input) passes
    last_event_ms + ttl_ms: the evicted key emits its retraction row
    (rn = 0, evicted = true) in a micro-batch where it received no
    input — the semantic the emulation cannot express, pinned by
    test_streaming ITCase.

    Output: per input batch, the key's full current Top-N
    (rn = 1..n, evicted = false); on timer expiry one row
    (rn = 0, evicted = true) witnessing the state drop.
    """
    import json

    _require_timers()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ensure_rocksdb_state_store(df.sparkSession)
    key_type = df.schema[key].dataType.simpleString()
    key_col = key
    cols = [order_col] + payload_cols

    class TopNTtl(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._buf = handle.getValueState("buf", "rows string")

        def _emit(self, k, buf, evicted: bool) -> pd.DataFrame:
            if evicted:
                return pd.DataFrame(
                    {
                        key_col: [k],
                        "rn": [0],
                        order_col: [None],
                        **{c: [None] for c in payload_cols},
                        "evicted": [True],
                    }
                )
            return pd.DataFrame(
                {
                    key_col: [k] * len(buf),
                    "rn": list(range(1, len(buf) + 1)),
                    order_col: [r[0] for r in buf],
                    **{
                        c: [r[1 + i] for r in buf]
                        for i, c in enumerate(payload_cols)
                    },
                    "evicted": [False] * len(buf),
                }
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            buf = (
                json.loads(self._buf.get()[0]) if self._buf.exists() else []
            )
            last_ms = 0
            for pdf in rows:
                ms = (
                    pdf[ts_col].astype("datetime64[ns]").astype("int64")
                    // 1_000_000
                )
                last_ms = max(last_ms, int(ms.max()))
                for row in pdf[cols].itertuples(index=False):
                    buf.append([float(row[0])] + [str(v) for v in row[1:]])
            buf.sort(key=lambda r: r[0], reverse=not ascending)
            buf = buf[:n]
            self._buf.update((json.dumps(buf),))
            # slide the TTL timer: replace any pending one (delete +
            # register — Flink KeyedProcessFunction users do the same)
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ms + ttl_ms)
            yield self._emit(key[0], buf, evicted=False)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._buf.exists():
                self._buf.clear()
                yield self._emit(key[0], [], evicted=True)

        def close(self) -> None:
            pass

    out_schema = ", ".join(
        [f"{key} {key_type}", "rn integer", f"{order_col} double"]
        + [f"{c} string" for c in payload_cols]
        + ["evicted boolean"]
    )
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(key)
        .transformWithStateInPandas(
            TopNTtl(),
            outputStructType=out_schema,
            outputMode="update",
            timeMode="eventTime",
        )
    )


def running_total_with_initial_state(
    df: DataFrame,
    key: str,
    value_col: str,
    initial_state: DataFrame,
) -> DataFrame:
    """Keyed running total whose state is SEEDED from a batch table —
    Spark 4's first-class ``transformWithStateInPandas(initialState=)``
    surface (StatefulProcessor.handleInitialState), the direct analog
    of Flink's SavepointWriter bootstrap-then-run flow
    (flink-libraries/flink-state-processor-api/.../SavepointWriter.java):
    the batch rows become each key's initial state before the first
    micro-batch, no seed-replay files needed (state_reader.
    bootstrap_keyed_state remains the protobuf-free fallback).

    ``initial_state`` must have columns (key, total); output rows are
    (key, total) after each input batch per key.
    """
    _require_timers()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ensure_rocksdb_state_store(df.sparkSession)
    key_type = df.schema[key].dataType.simpleString()
    key_col = key  # the callbacks' `key` param is the grouping tuple

    class SeededTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("total", "total double")

        def handleInitialState(self, key, initialState, timerValues) -> None:
            self._tot.update((float(initialState["total"].iloc[0]),))

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            total = self._tot.get()[0] if self._tot.exists() else 0.0
            for pdf in rows:
                total += float(pdf[value_col].sum())
            self._tot.update((total,))
            yield pd.DataFrame({key_col: [key[0]], "total": [total]})

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        SeededTotal(),
        outputStructType=f"{key} {key_type}, total double",
        outputMode="update",
        timeMode="none",
        initialState=initial_state.groupBy(key),
    )
