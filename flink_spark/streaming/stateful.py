"""Custom stateful streaming operators (SURVEY.md M3).

Spark has no declarative equivalent for these Flink operators; each is
built on applyInPandasWithState (GroupState + Arrow batches):

- streaming Top-N       ← StreamExecRank.java:83 /
                          AppendOnlyTopNFunction.java:52
- dedup keep-last       ← StreamExecDeduplicate.java:85 /
                          deduplicate/ keep-last functions
- temporal (as-of) join ← StreamExecTemporalJoin.java:77 /
                          TemporalRowTimeJoinOperator.java:78
- streaming OVER agg    ← StreamExecOverAggregate.java:92 /
                          ProcTimeUnboundedPrecedingFunction.java,
                          RowTimeRangeBoundedPrecedingFunction.java

State layout: small per-key buffers serialized as JSON-string arrays —
the per-key state is O(N) for Top-N, O(1) for dedup, O(versions) for
the temporal join (the reference keeps the same asymptotics in its
state backends). At scale the state store shards by the grouping key,
exactly like Flink's keyed state.

All emission is per-micro-batch in update semantics: each batch emits
the keys whose result changed. Flink's continuous operator emits
per-record retract/insert pairs instead; under the changelog layer
(flink_spark/changelog.py) the update stream is equivalent.
"""

from __future__ import annotations

import json
from collections import deque
from collections.abc import Iterator
from itertools import groupby

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _key_type(df: DataFrame, key: str) -> str:
    """Key field's Spark SQL type, taken from the input schema — the
    output/state schemas must not hardcode ``long`` (a string key would
    otherwise fail at runtime)."""
    return df.schema[key].dataType.simpleString()


def topn_stream(
    df: DataFrame,
    key: str,
    order_col: str,
    payload_cols: list[str],
    n: int,
    ascending: bool = False,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuous Top-N per key over an append stream.

    Emits, per micro-batch, the full current Top-N for every key that
    received input — the same contract as Flink's updatable rank with
    row_number materialization.

    ``ttl_ms`` bounds state lifetime (StateTtlConfig.java analogue): a
    key idle for that long has its Top-N state dropped via a
    processing-time timeout instead of growing the store forever.
    """
    out_fields = ", ".join(
        [f"{key} {_key_type(df, key)}", "rn integer", f"{order_col} double"]
        + [f"{c} string" for c in payload_cols]
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # idle-key TTL eviction
            yield pd.DataFrame(
                columns=[key, "rn", order_col] + payload_cols
            )
            return
        buf: list[list] = (
            [json.loads(r) for r in state.get[0]] if state.exists else []
        )
        cols = [order_col] + payload_cols
        for pdf in pdfs:
            for row in pdf[cols].itertuples(index=False):
                buf.append([float(row[0])] + [str(v) for v in row[1:]])
        buf.sort(key=lambda r: r[0], reverse=not ascending)
        buf = buf[:n]
        state.update(([json.dumps(r) for r in buf],))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = pd.DataFrame(
            {
                key: [k[0]] * len(buf),
                "rn": list(range(1, len(buf) + 1)),
                order_col: [r[0] for r in buf],
                **{
                    c: [r[1 + i] for r in buf]
                    for i, c in enumerate(payload_cols)
                },
            }
        )
        yield out

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="buf array<string>",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def dedup_keep_last_stream(
    df: DataFrame,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Keep-last deduplication over an append stream: per key, the row
    with the greatest event time seen so far (ties: later arrival wins,
    matching Flink's proc-time tie-break).

    ``ttl_ms`` drops an idle key's state after that processing-time
    interval (StateTtlConfig.java analogue)."""
    out_fields = ", ".join(
        [f"{key} {_key_type(df, key)}", "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[key, "ts_ms"] + payload_cols)
            return
        best_ts, best_payload = (
            (state.get[0], json.loads(state.get[1])) if state.exists else (None, None)
        )
        cols = [ts_col] + payload_cols
        for pdf in pdfs:
            for row in pdf[cols].itertuples(index=False):
                t = int(pd.Timestamp(row[0]).value // 1_000_000)
                if best_ts is None or t >= best_ts:
                    best_ts = t
                    best_payload = [str(v) for v in row[1:]]
        state.update((best_ts, json.dumps(best_payload)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                key: [k[0]],
                "ts_ms": [best_ts],
                **{c: [best_payload[i]] for i, c in enumerate(payload_cols)},
            }
        )

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="ts_ms long, payload string",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def temporal_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    left_cols: list[str],
    right_payload: list[str],
    state_bound_ms: int | None = None,
    emit_state_size: bool = False,
) -> DataFrame:
    """Streaming temporal join: each left row joins the newest right-side
    version with version.ts <= left.ts for its key.

    Implementation: tag+union the two streams into one keyed stream
    (Spark stateful ops take a single input); per key the state holds
    the version history [(ts, payload)...]. Within a micro-batch rows
    are processed in event-time order with right-before-left on ties —
    identical to TemporalRowTimeJoinOperator's ordered emission.

    ``state_bound_ms`` enables the reference's watermark-driven cleanup
    (TemporalRowTimeJoinOperator.java:78 registers a timer per version;
    cleanUpState drops versions below the watermark keeping the newest
    one at-or-below it): the per-key low watermark is the max event time
    seen minus the bound; every version except the newest one at-or-below
    that watermark is evicted, so state is O(versions inside the bound)
    instead of unbounded.

    ``emit_state_size`` appends an ``n_versions`` column (version count
    after the batch) to left-row output — the state-size probe used by
    the bounded-state tests.
    """
    lsel = left.select(
        F.col(key), F.col(ts_col), F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast("string").alias(f"__r_{c}") for c in right_payload],
    )
    rsel = right.select(
        F.col(key), F.col(ts_col), F.lit(0).alias("__side"),
        *[F.lit(None).cast("string").alias(c) for c in left_cols],
        *[F.col(c).cast("string").alias(f"__r_{c}") for c in right_payload],
    )
    unioned = lsel.unionByName(rsel)

    out_fields = ", ".join(
        [f"{key} {_key_type(left, key)}", "ts_ms long"]
        + [f"{c} string" for c in left_cols]
        + [f"{c} string" for c in right_payload]
        + (["n_versions long"] if emit_state_size else [])
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        versions: list[list]
        wm: int
        if state.exists:
            versions = [json.loads(v) for v in state.get[0]]
            wm = state.get[1]
        else:
            versions, wm = [], -(2**62)
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        rows.sort(
            key=lambda r: (pd.Timestamp(r[ts_col]).value, r["__side"])
        )
        out_rows = []
        for r in rows:
            t_ms = int(pd.Timestamp(r[ts_col]).value // 1_000_000)
            wm = max(wm, t_ms)
            if r["__side"] == 0:
                versions.append([t_ms, [r[f"__r_{c}"] for c in right_payload]])
            else:
                match = None
                for v in versions:
                    if v[0] <= t_ms:
                        match = v
                    else:
                        break
                out_rows.append(
                    [k[0], t_ms]
                    + [str(r[c]) for c in left_cols]
                    + (list(match[1]) if match else [None] * len(right_payload))
                )
        versions.sort(key=lambda v: v[0])
        if state_bound_ms is not None:
            # Watermark cleanup (TemporalRowTimeJoinOperator cleanUpState):
            # a future left row has ts >= low, so among versions <= low
            # only the newest can ever match again — drop the rest.
            low = wm - state_bound_ms
            keep_from = 0
            for i, v in enumerate(versions):
                if v[0] <= low:
                    keep_from = i
                else:
                    break
            versions = versions[keep_from:]
        state.update(([json.dumps(v) for v in versions], wm))
        cols = [key, "ts_ms"] + left_cols + right_payload
        if emit_state_size:
            cols = cols + ["n_versions"]
            out_rows = [r + [len(versions)] for r in out_rows]
        yield pd.DataFrame(out_rows, columns=cols)

    return unioned.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="versions array<string>, wm long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def temporal_sort_stream(
    df: DataFrame,
    ts_col: str,
    payload_cols: list[str],
    delay_ms: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Streaming temporal sort: rows are emitted in event-time order once
    the watermark passes them (StreamExecTemporalSort.java:64 →
    RowTimeSortOperator.java:43).

    The reference buffers rows keyed by timestamp and flushes, sorted, on
    each watermark advance; rows at-or-below the last emitted watermark
    are late and dropped. Here the micro-batch boundary is the watermark
    tick: the per-partition watermark is (max event time seen −
    ``delay_ms``); each batch releases every buffered row at-or-below it,
    sorted, and holds the rest in state. Because later batches only move
    the watermark forward, the emitted sequence is globally event-time
    ordered within each sort partition (``emit_seq`` is the order probe).

    ``partition_col`` None gives the total order Flink's ORDER BY rowtime
    produces at parallelism 1 (a single sort task — the only way any
    engine yields a total order); set it to shard the sort per key, the
    parallel per-subtask order of the reference. State is O(rows inside
    the delay window) per partition.
    """
    if partition_col is None:
        df = df.withColumn("__sortpart", F.lit(0))
        partition_col = "__sortpart"
    out_fields = ", ".join(
        [f"{partition_col} {_key_type(df, partition_col)}",
         "emit_seq long", "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf = [json.loads(r) for r in state.get[0]]
            wm, seq = state.get[1], state.get[2]
        else:
            buf, wm, seq = [], -(2**62), 0
        # Lateness is judged against the watermark as of the previous
        # batch — the watermark tick comes after the batch's rows, so
        # in-batch disorder never drops a row the reference would keep.
        wm_prev = wm
        for pdf in pdfs:
            for row in pdf[[ts_col, *payload_cols]].itertuples(index=False):
                t_ms = int(pd.Timestamp(row[0]).value // 1_000_000)
                if t_ms <= wm_prev:
                    continue  # late row: below the emitted watermark → drop
                buf.append([t_ms, [str(v) for v in row[1:]]])
                wm = max(wm, t_ms - delay_ms)
        buf.sort(key=lambda r: r[0])
        cut = 0
        while cut < len(buf) and buf[cut][0] <= wm:
            cut += 1
        emit, buf = buf[:cut], buf[cut:]
        out = []
        for t_ms, payload in emit:
            seq += 1
            out.append([k[0], seq, t_ms] + payload)
        state.update(([json.dumps(r) for r in buf], wm, seq))
        yield pd.DataFrame(
            out, columns=[partition_col, "emit_seq", "ts_ms"] + payload_cols
        )

    return df.groupBy(partition_col).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="buf array<string>, wm long, seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def over_unbounded_preceding_stream(
    df: DataFrame, key: str, ts_col: str, value_col: str
) -> DataFrame:
    """Streaming OVER aggregate, frame ROWS/RANGE UNBOUNDED PRECEDING →
    CURRENT ROW: every input row is emitted extended with the running
    sum/count/avg/min/max of `value_col` for its key, ordered by event
    time (StreamExecOverAggregate.java:92 →
    ProcTimeUnboundedPrecedingFunction / RowTimeUnboundedPrecedingOver).

    State is O(1) per key (the accumulators), exactly the reference's
    state layout. Rows inside a micro-batch are processed in event-time
    order; cross-batch disorder is the caller's watermark concern (the
    reference buffers until watermark — at micro-batch granularity the
    batch boundary is the watermark).
    """
    out_fields = (
        f"{key} {_key_type(df, key)}, ts_ms long, {value_col} double, "
        "run_sum double, run_cnt long, run_avg double, run_min double, "
        "run_max double"
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s, cnt, mn, mx = (
            state.get if state.exists else (0.0, 0, None, None)
        )
        rows = []
        for pdf in pdfs:
            for row in pdf[[ts_col, value_col]].itertuples(index=False):
                rows.append((int(pd.Timestamp(row[0]).value // 1_000_000),
                             float(row[1])))
        rows.sort()
        out = []
        for t_ms, v in rows:
            s += v
            cnt += 1
            mn = v if mn is None else min(mn, v)
            mx = v if mx is None else max(mx, v)
            out.append((k[0], t_ms, v, s, cnt, s / cnt, mn, mx))
        state.update((s, cnt, mn, mx))
        yield pd.DataFrame(
            out,
            columns=[key, "ts_ms", value_col, "run_sum", "run_cnt",
                     "run_avg", "run_min", "run_max"],
        )

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="s double, cnt long, mn double, mx double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def over_range_bounded_stream(
    df: DataFrame, key: str, ts_col: str, value_col: str, range_ms: int
) -> DataFrame:
    """Streaming OVER aggregate with a time-range frame:
    RANGE BETWEEN <range_ms> PRECEDING AND CURRENT ROW on event time
    (RowTimeRangeBoundedPrecedingFunction.java semantics: expired rows
    are retracted from the accumulator as the frame slides).

    State per key is the in-frame buffer [(ts_ms, value)…] — O(rows in
    range), the same asymptotics as the reference's `inputState` map.
    Eviction is monotone (deque popleft) because rows are processed in
    event-time order.

    Same-timestamp rows are RANGE-frame peers: the whole timestamp group
    enters the buffer before any of its rows is emitted, so every peer
    sees the identical aggregate — matching both the batch anchor
    (over_range_time_frame) and the reference's per-timestamp onTimer
    emission in RowTimeRangeBoundedPrecedingFunction.
    """
    out_fields = (
        f"{key} {_key_type(df, key)}, ts_ms long, {value_col} double, "
        "frame_sum double, frame_cnt long, frame_avg double"
    )

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: deque[list] = deque(
            [json.loads(r) for r in state.get[0]] if state.exists else []
        )
        rows = []
        for pdf in pdfs:
            for row in pdf[[ts_col, value_col]].itertuples(index=False):
                rows.append((int(pd.Timestamp(row[0]).value // 1_000_000),
                             float(row[1])))
        rows.sort()
        out = []
        for t_ms, group in groupby(rows, key=lambda r: r[0]):
            peers = [v for _, v in group]
            for v in peers:
                buf.append([t_ms, v])
            lo = t_ms - range_ms
            # retract expired rows (reference: onTimer cleanup loop)
            while buf and buf[0][0] < lo:
                buf.popleft()
            fs = sum(b[1] for b in buf)
            fc = len(buf)
            for v in peers:
                out.append((k[0], t_ms, v, fs, fc, fs / fc))
        state.update(([json.dumps(b) for b in buf],))
        yield pd.DataFrame(
            out,
            columns=[key, "ts_ms", value_col, "frame_sum", "frame_cnt",
                     "frame_avg"],
        )

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="buf array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
