"""Retraction-aware streaming regular join on the changelog convention.

Reference: StreamingJoinOperator.java:36
(flink-table/flink-table-runtime/.../operators/join/stream/) — the
two-input join of *updating* streams: both sides keep their live rows in
keyed state; an insert on one side emits +I join rows against the other
side's current state, a delete emits -D rows that retract previously
emitted joins. (The reference's JoinRecordStateView per-side state is
exactly the per-key multiset kept here.)

Spark has no updating-stream inputs (SURVEY risk #1), so the inputs
follow the repo's changelog-column convention (flink_spark/changelog.py):
a ``row_kind`` column of '+I'/'-D' ('+U'/'-U' are normalized to
delete+insert upstream by changelog_normalize). The two streams are
tagged and unioned (Spark stateful ops are single-input), keyed by the
join key, and processed through ``applyInPandasWithState``:

- state: per key, one multiset of live payload rows per side;
- a '+I' arrival adds to its side and emits '+I' joined rows against
  every live row (with multiplicity) of the other side;
- a '-D' arrival removes one instance from its side and emits '-D'
  joined rows against the other side — retracting what the earlier
  '+I's emitted.

Rows inside a micro-batch are processed in ``seq_col`` order, so the
emitted changelog is deterministic; the running sum of +I minus -D per
joined row always equals the batch inner join of the normalized inputs
(the invariant the test pins).

Scale: state is O(live rows per key per side) — identical to the
reference's state view asymptotics; the stream shuffles once on the
join key.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def pack_count_map(d: dict[tuple, int]) -> bytes:
    """Binary-pack a {payload-tuple: count} multiset view.

    Layout: u32 n_entries, then per entry: i32 count, u16 n_fields,
    then per field: i32 byte-length (-1 = NULL) + utf-8 bytes. Replaces
    the r4 per-batch JSON round-trip (every payload json.dumps'd, the
    [payload, count] pair json.dumps'd AGAIN, then both json.loads'd
    back next batch) with one parse-free buffer each way — the hot-key
    tax the reference's incremental MapState never pays, minimized
    until transformWithStateInPandas map-typed state is adopted.
    """
    parts = [struct.pack("<I", len(d))]
    for payload, cnt in d.items():
        parts.append(struct.pack("<iH", cnt, len(payload)))
        for f in payload:
            if f is None:
                parts.append(struct.pack("<i", -1))
            else:
                b = f.encode("utf-8")
                parts.append(struct.pack("<i", len(b)))
                parts.append(b)
    return b"".join(parts)


def unpack_count_map(buf: bytes) -> dict[tuple, int]:
    """Inverse of :func:`pack_count_map`."""
    d: dict[tuple, int] = {}
    if not buf:
        return d
    (n,) = struct.unpack_from("<I", buf, 0)
    off = 4
    for _ in range(n):
        cnt, nf = struct.unpack_from("<iH", buf, off)
        off += 6
        fields = []
        for _ in range(nf):
            (ln,) = struct.unpack_from("<i", buf, off)
            off += 4
            if ln < 0:
                fields.append(None)
            else:
                fields.append(buf[off:off + ln].decode("utf-8"))
                off += ln
        d[tuple(fields)] = cnt
    return d


def retract_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    seq_col: str,
    left_payload: list[str],
    right_payload: list[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Inner equi-join of two +I/-D changelog streams.

    Output: (row_kind, key, <left_payload>, <right_payload>) — itself a
    changelog stream ('+I' join appears / '-D' join disappears).
    Both inputs need ``row_kind`` and a ``seq_col`` total order.

    State per key is a payload-keyed COUNT MAP per side (O(1) upsert per
    arriving row — the reference's JoinRecordStateView backed by
    MapState<Row, Integer>, StreamingJoinOperator.java:36). ``ttl_ms``
    mirrors Flink's table.exec.state.ttl / StateTtlConfig
    (flink-core/.../state/StateTtlConfig.java): a key idle for ttl_ms of
    processing time drops its state — without it, the state of an
    ever-growing key space is unbounded (the reference documents the
    same trade-off for regular streaming joins).
    """
    key_type = left.schema[key].dataType.simpleString()
    lsel = left.select(
        F.col(key), F.col(seq_col).cast("long").alias("__seq"),
        F.col("row_kind"), F.lit(0).alias("__side"),
        *[F.col(c).cast("string").alias(f"__l_{c}") for c in left_payload],
        *[F.lit(None).cast("string").alias(f"__r_{c}") for c in right_payload],
    )
    rsel = right.select(
        F.col(key), F.col(seq_col).cast("long").alias("__seq"),
        F.col("row_kind"), F.lit(1).alias("__side"),
        *[F.lit(None).cast("string").alias(f"__l_{c}") for c in left_payload],
        *[F.col(c).cast("string").alias(f"__r_{c}") for c in right_payload],
    )
    unioned = lsel.unionByName(rsel)

    out_fields = ", ".join(
        ["row_kind string", f"{key} {key_type}"]
        + [f"{c} string" for c in left_payload]
        + [f"{c} string" for c in right_payload]
    )
    out_cols = ["row_kind", key] + left_payload + right_payload

    def fn(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # StateTtlConfig expiry: the key sat idle past the TTL —
            # drop both side views (reference cleans up incrementally;
            # the observable contract is identical)
            state.remove()
            yield pd.DataFrame([], columns=out_cols)
            return
        # per-side live-row count maps: payload-tuple -> count (O(1)
        # upsert — MapState<Row, Integer> in JoinRecordStateView),
        # binary-packed in state (pack_count_map)
        if state.exists:
            lrows = unpack_count_map(bytes(state.get[0] or b""))
            rrows = unpack_count_map(bytes(state.get[1] or b""))
        else:
            lrows, rrows = {}, {}
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: r["__seq"])
        out = []
        for r in rows:
            kind = r["row_kind"]
            if r["__side"] == 0:
                mine, other = lrows, rrows
                payload = [r[f"__l_{c}"] for c in left_payload]
            else:
                mine, other = rrows, lrows
                payload = [r[f"__r_{c}"] for c in right_payload]
            pkey = tuple(payload)
            if kind == "+I":
                mine[pkey] = mine.get(pkey, 0) + 1
                emit_kind = "+I"
            elif kind == "-D":
                have = mine.get(pkey, 0)
                if not have:
                    continue  # delete of an unknown row: no-op
                if have == 1:
                    del mine[pkey]
                else:
                    mine[pkey] = have - 1
                emit_kind = "-D"
            else:
                raise ValueError(
                    f"row_kind {kind!r}: normalize +U/-U upstream "
                    "(changelog.drop_update_before / normalize)"
                )
            for other_pkey, cnt in other.items():
                other_payload = list(other_pkey)
                if r["__side"] == 0:
                    joined = [emit_kind, k[0]] + payload + other_payload
                else:
                    joined = [emit_kind, k[0]] + other_payload + payload
                out.extend([joined] * cnt)
        state.update((pack_count_map(lrows), pack_count_map(rrows)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=out_cols)

    return unioned.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_fields,
        stateStructType="l binary, r binary",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
