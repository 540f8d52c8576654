"""Streaming CEP: the keyed NFA driven by watermark advancement.

Reference: CepOperator.java:82 — events buffer in keyed state ordered by
event time; as the watermark advances, the NFA processes every event at
or below it, emitting completed matches and pruning expired computation
states. The batch `pattern_match` (flink_spark/cep.py) applies the same
NFA to a complete, static event list.

Micro-batch mapping (requires ``within()`` — the reference needs it for
state cleanup too, or state is unbounded):

- per key, buffered events are kept in state as (ts_ms, seq, payload);
- the per-key watermark is max-event-time-seen − ``delay_ms`` (the
  bounded-out-of-orderness contract; late rows below the watermark are
  dropped exactly like the reference's late-event path);
- an anchor (potential match start) is CLOSED once
  ``anchor_ts + within_ms <= watermark``: no future event can extend any
  match anchored there (every future event has ts > watermark). Matches
  from closed anchors are final → emitted, in start order, with the
  after-match skip floor carried in state so pruning works across
  batches. Anchors close in start order, so emitted matches never race
  an open earlier-start anchor;
- events below ``watermark − within_ms`` can no longer participate in
  any OPEN anchor's window and are evicted — state is O(events inside
  one within-window per key), the reference's NFA state bound.

Emitted matches are exactly the batch `find_matches` output restricted
to closed anchors; the equivalence test feeds the same rows in three
micro-batches and compares against the batch operator. The SQL surface
(`match_recognize_stream` in flink_spark/match_recognize.py) shares the
closure/floor machinery below — the StreamExecMatch analogue.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_spark.cep import Pattern, find_matches
from flink_spark.streaming.stateful import _key_type


def ingest_batch(
    buf: list, wm: int, seq: int, pdfs, ts_col: str,
    payload_cols: list[str], delay_ms: int,
) -> tuple[list, int, int]:
    """Append a micro-batch's rows to the per-key buffer (dropping rows
    at-or-below the previous watermark) and advance the watermark."""
    wm_prev = wm
    for pdf in pdfs:
        for row in pdf[[ts_col, *payload_cols]].itertuples(index=False):
            t_ms = int(
                pd.Series([row[0]])
                .astype("datetime64[ns]")
                .astype("int64")
                .iloc[0]
                // 1_000_000
            )
            if t_ms <= wm_prev:
                continue  # late beyond the watermark: dropped
            seq += 1
            buf.append([t_ms, seq, [str(v) for v in row[1:]]])
            wm = max(wm, t_ms - delay_ms)
    buf.sort(key=lambda r: (r[0], r[1]))
    return buf, wm, seq


def closed_matches(
    events: list[dict], pattern: Pattern, wm: int, floor_key
) -> tuple[list, list | None]:
    """Final (conclusively closed) matches at watermark ``wm`` plus the
    updated cross-batch after-match floor. Events need __ts_ms/__seq."""
    within = pattern.within_ms
    finals = []
    for m in find_matches(events, pattern, "__ts_ms"):
        anchor = m[0][1]
        if anchor["__ts_ms"] + within > wm:
            continue  # window still open — not final yet
        mkey = [anchor["__ts_ms"], anchor["__seq"]]
        if floor_key is not None and mkey < list(floor_key):
            continue  # pruned by a previous batch's emitted match
        finals.append(m)
        last = m[-1][1]
        if pattern.after_match == "skip_to_next":
            floor_key = [anchor["__ts_ms"], anchor["__seq"] + 1]
        elif pattern.after_match == "skip_past_last":
            floor_key = [last["__ts_ms"], last["__seq"] + 1]
        elif pattern.after_match in ("skip_to_first", "skip_to_last"):
            bound = [ev for name, ev in m if name == pattern.skip_to_step]
            if bound:
                tgt = (
                    bound[0]
                    if pattern.after_match == "skip_to_first"
                    else bound[-1]
                )
                cand = [tgt["__ts_ms"], tgt["__seq"]]
                if floor_key is None or cand > list(floor_key):
                    floor_key = cand
    return finals, floor_key


CEP_STATE_SCHEMA = (
    "buf array<string>, wm long, next_id long, floor string, seq long"
)


def pattern_match_stream(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    delay_ms: int = 0,
) -> DataFrame:
    """Streaming pattern_match. Output rows:
    (key, match_id, step, ts_ms, <payload_cols as strings>) — the batch
    operator's schema; match_id numbers matches per key in emission
    (start) order across the whole stream."""
    if pattern.within_ms is None:
        raise ValueError(
            "pattern_match_stream requires within() — without a window "
            "bound no anchor ever conclusively closes (and the "
            "reference's NFA state would be unbounded too)"
        )
    within = pattern.within_ms
    out_fields = ", ".join(
        [f"{key} {_key_type(df, key)}", "match_id long", "step string",
         "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )
    out_cols = [key, "match_id", "step", "ts_ms"] + payload_cols

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf = [json.loads(r) for r in state.get[0]]
            wm, next_id, floor_key, seq = (
                state.get[1], state.get[2],
                json.loads(state.get[3]), state.get[4],
            )
        else:
            buf, wm, next_id, floor_key, seq = [], -(2 ** 62), 0, None, 0
        buf, wm, seq = ingest_batch(
            buf, wm, seq, pdfs, ts_col, payload_cols, delay_ms
        )
        events = []
        for t_ms, sq, payload in buf:
            d = dict(zip(payload_cols, payload))
            d["__ts_ms"] = t_ms
            d["__seq"] = sq
            events.append(d)
        finals, floor_key = closed_matches(events, pattern, wm, floor_key)
        out = []
        for m in finals:
            for step_name, ev in m:
                out.append(
                    [k[0], next_id, step_name, ev["__ts_ms"]]
                    + [ev[c] for c in payload_cols]
                )
            next_id += 1
        # evict events that can no longer join any OPEN anchor's window
        # STRICT bound: an event at exactly wm - within can only belong
        # to matches anchored at ts <= wm - within, all of which are
        # closed (already emitted) — keeping it would re-emit them
        # on the next batch under no_skip
        buf = [r for r in buf if r[0] > wm - within]
        state.update(
            (
                [json.dumps(r) for r in buf],
                wm,
                next_id,
                json.dumps(floor_key),
                seq,
            )
        )
        yield pd.DataFrame(out, columns=out_cols)

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def pattern_match_stream_with_timeouts(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    delay_ms: int = 0,
) -> DataFrame:
    """Streaming pattern_match with the timed-out-partial side channel
    (CepOperator + TimedOutPartialMatchHandler): when an anchor's
    within() window closes WITHOUT a complete match, its longest partial
    is emitted with kind='timeout' — the watermark plays the role the
    key's last event time plays in the batch variant
    (cep.find_matches_and_timeouts). Output schema is the batch
    operator's: (key, kind, match_id, step, ts_ms, <payload strings>);
    the two kinds number independently."""
    from flink_spark.cep import _enumerate_from, _longest_partial_from

    if pattern.within_ms is None:
        raise ValueError("requires within() — see pattern_match_stream")
    within = pattern.within_ms
    out_fields = ", ".join(
        [f"{key} {_key_type(df, key)}", "kind string", "match_id long",
         "step string", "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )
    out_cols = [key, "kind", "match_id", "step", "ts_ms"] + payload_cols

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf = [json.loads(r) for r in state.get[0]]
            wm, next_id, floor_key, seq, next_tid = (
                state.get[1], state.get[2],
                json.loads(state.get[3]), state.get[4], state.get[5],
            )
        else:
            buf, wm, next_id, floor_key, seq, next_tid = (
                [], -(2 ** 62), 0, None, 0, 0,
            )
        buf, wm, seq = ingest_batch(
            buf, wm, seq, pdfs, ts_col, payload_cols, delay_ms
        )
        events = []
        for t_ms, sq, payload in buf:
            d = dict(zip(payload_cols, payload))
            d["__ts_ms"] = t_ms
            d["__seq"] = sq
            events.append(d)
        finals, floor_key = closed_matches(events, pattern, wm, floor_key)
        out = []
        for m in finals:
            for step_name, ev in m:
                out.append(
                    [k[0], "match", next_id, step_name, ev["__ts_ms"]]
                    + [ev[c] for c in payload_cols]
                )
            next_id += 1
        # timeout channel: closed anchors with NO complete match emit
        # their longest partial (independent of the skip floor — the
        # reference reports timed-out partials regardless of pruning)
        for i, ev0 in enumerate(events):
            if ev0["__ts_ms"] + within > wm:
                continue  # anchor window still open
            has_complete = False
            for _m in _enumerate_from(events, i, pattern, "__ts_ms"):
                has_complete = True
                break
            if has_complete:
                continue
            partial = _longest_partial_from(events, i, pattern, "__ts_ms")
            if partial and partial[0][1] == i:
                for step_name, idx in partial:
                    ev = events[idx]
                    out.append(
                        [k[0], "timeout", next_tid, step_name,
                         ev["__ts_ms"]]
                        + [ev[c] for c in payload_cols]
                    )
                next_tid += 1
        # STRICT bound: an event at exactly wm - within can only belong
        # to matches anchored at ts <= wm - within, all of which are
        # closed (already emitted) — keeping it would re-emit them
        # on the next batch under no_skip
        buf = [r for r in buf if r[0] > wm - within]
        state.update(
            (
                [json.dumps(r) for r in buf],
                wm,
                next_id,
                json.dumps(floor_key),
                seq,
                next_tid,
            )
        )
        yield pd.DataFrame(out, columns=out_cols)

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType=CEP_STATE_SCHEMA + ", next_tid long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def pattern_match_stream_timers(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    delay: str = "0 seconds",
    with_timeouts: bool = False,
) -> DataFrame:
    """Streaming CEP whose within()-window expiry runs on REAL per-key
    event-time timers (r8, VERDICT r7 task #7) — transformWithState
    timers instead of the per-key-watermark emulation above.

    The semantic this fixes: ``pattern_match_stream`` closes anchors
    against a PER-KEY watermark (max event time seen for that key −
    delay), so a key that goes silent never emits its pending matches
    or timed-out partials. The reference's CepOperator uses the
    OPERATOR watermark — global across keys (CepOperator.java:82,
    onEventTime processes buffered events up to the watermark). Here
    each open anchor registers a timer at ``anchor_ts + within_ms``;
    Spark's watermark (advanced by ANY key's input) fires it, and the
    silent key emits from ``handleExpiredTimer`` — pinned by
    test_streaming's ITCase feeding key 2 only and asserting key 1's
    emission.

    Output: (key, kind, match_id, step, ts_ms, <payload strings>);
    kind='match' always, plus kind='timeout' longest-partials when
    ``with_timeouts`` (TimedOutPartialMatchHandler channel).
    """
    from flink_spark.cep import _enumerate_from, _longest_partial_from
    from flink_spark.streaming.process import (
        _require_timers,
        ensure_rocksdb_state_store,
    )

    if pattern.within_ms is None:
        raise ValueError("requires within() — see pattern_match_stream")
    _require_timers()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ensure_rocksdb_state_store(df.sparkSession)
    within = pattern.within_ms
    key_type = _key_type(df, key)
    out_cols = [key, "kind", "match_id", "step", "ts_ms"] + payload_cols
    out_fields = ", ".join(
        [f"{key} {key_type}", "kind string", "match_id long",
         "step string", "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )

    def _drain(buf, floor_key, next_id, next_tid, wm, k0):
        """Emit everything conclusively closed at watermark ``wm``,
        evict spent events, return (rows, buf, floor_key, ids)."""
        events = []
        for t_ms, sq, payload in buf:
            d = dict(zip(payload_cols, payload))
            d["__ts_ms"] = t_ms
            d["__seq"] = sq
            events.append(d)
        finals, floor_key = closed_matches(events, pattern, wm, floor_key)
        rows = []
        for m in finals:
            for step_name, ev in m:
                rows.append(
                    [k0, "match", next_id, step_name, ev["__ts_ms"]]
                    + [ev[c] for c in payload_cols]
                )
            next_id += 1
        if with_timeouts:
            for i, ev0 in enumerate(events):
                if ev0["__ts_ms"] + within > wm:
                    continue
                if any(True for _ in _enumerate_from(events, i, pattern, "__ts_ms")):
                    continue
                partial = _longest_partial_from(events, i, pattern, "__ts_ms")
                if partial and partial[0][1] == i:
                    for step_name, idx in partial:
                        ev = events[idx]
                        rows.append(
                            [k0, "timeout", next_tid, step_name,
                             ev["__ts_ms"]]
                            + [ev[c] for c in payload_cols]
                        )
                    next_tid += 1
        buf = [r for r in buf if r[0] > wm - within]
        return rows, buf, floor_key, next_id, next_tid

    class CepTimers(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._st = handle.getValueState(
                "cep", "buf string, floor string, next_id long, "
                "next_tid long, seq long"
            )

        def _load(self):
            if self._st.exists():
                b, f, ni, nt, seq = self._st.get()
                return [tuple(r) for r in json.loads(b)], json.loads(f), ni, nt, seq
            return [], None, 0, 0, 0

        def _store(self, buf, floor_key, next_id, next_tid, seq) -> None:
            self._st.update(
                (json.dumps([list(r) for r in buf]), json.dumps(floor_key),
                 next_id, next_tid, seq)
            )

        def _retime(self, buf, wm) -> None:
            """One pending timer per key: the earliest open anchor's
            window close. registerTimer clamps to the key's next
            conclusive event, so state drains without key input."""
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            if buf:
                self._handle.registerTimer(min(r[0] for r in buf) + within)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            buf, floor_key, next_id, next_tid, seq = self._load()
            wm = timerValues.getCurrentWatermarkInMs()
            buf, _, seq = ingest_batch(
                buf, wm, seq, rows, ts_col, payload_cols, 0
            )
            out, buf, floor_key, next_id, next_tid = _drain(
                buf, floor_key, next_id, next_tid, wm, key[0]
            )
            self._store(buf, floor_key, next_id, next_tid, seq)
            self._retime(buf, wm)
            if out:
                yield pd.DataFrame(out, columns=out_cols)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            buf, floor_key, next_id, next_tid, seq = self._load()
            wm = max(
                timerValues.getCurrentWatermarkInMs(),
                expiredTimerInfo.getExpiryTimeInMs(),
            )
            out, buf, floor_key, next_id, next_tid = _drain(
                buf, floor_key, next_id, next_tid, wm, key[0]
            )
            self._store(buf, floor_key, next_id, next_tid, seq)
            self._retime(buf, wm)
            if out:
                yield pd.DataFrame(out, columns=out_cols)

        def close(self) -> None:
            pass

    return (
        df.withWatermark(ts_col, delay)
        .groupBy(key)
        .transformWithStateInPandas(
            CepTimers(),
            outputStructType=out_fields,
            outputMode="append",
            timeMode="eventTime",
        )
    )
