"""Join operators Spark lacks as single built-ins, composed Spark-first.

Reference semantics:
- interval join: StreamExecIntervalJoin.java:82 / TimeIntervalJoin.java:51
- temporal (as-of) join: StreamExecTemporalJoin.java:77 /
  TemporalRowTimeJoinOperator.java:78
- window join: StreamExecWindowJoin.java:69 / WindowJoinOperator.java:66
- lookup join: StreamExecLookupJoin.java:56

Scale notes: every builder here produces a single-shuffle plan on the
join key (plus Spark's own exchange reuse); none of them collect to the
driver. The as-of join deliberately avoids a theta-join (which would be
O(n*m) per key) by using the union+window trick: one shuffle on the key,
one sort per partition — the same asymptotics as the reference's
per-key ordered-state operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose event times are within [ts_left - lower, ts_left + upper].

    Batch analogue of Flink's interval join (TimeIntervalJoin.java:51):
    `r.ts BETWEEN l.ts - lower AND l.ts + upper`. The equi-key keeps this
    a hash/sort-merge join with a residual range predicate — Catalyst
    plans the equi part as the join key so the range never becomes a
    cartesian product.
    """
    lts, rts = F.col(f"l.{ts_left}"), F.col(f"r.{ts_right}")
    cond = (
        (F.col(f"l.{key_left}") == F.col(f"r.{key_right}"))
        & (rts >= lts - F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return left.alias("l").join(right.alias("r"), cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_left: str,
    ts_right: str,
    payload: dict[str, str],
    strict: bool = False,
) -> DataFrame:
    """As-of (temporal) join: each left row picks the latest right row with
    right.ts <= left.ts (or < when strict) for the same key.

    Batch analogue of Flink's temporal/versioned join
    (TemporalRowTimeJoinOperator.java:78, which keeps the right side as
    versioned state per key and resolves each left row against the
    newest version not after its rowtime).

    Implementation: tag+union both sides, sort per key by (ts, side) and
    carry the last non-null right payload forward with a window — one
    shuffle on `key`, one per-partition sort, no theta join. `payload`
    maps right-side column → output alias.

    The right side should be unique per (key, ts); pre-deduplicate it if
    not (matches the reference's "latest version wins" semantics).
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(ts_left).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"__p_{dst}") for src, dst in payload.items()],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(ts_right).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(src).alias(f"__p_{dst}") for src, dst in payload.items()],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Right rows sort before left rows at equal ts so `<=` semantics hold;
    # with strict=True left rows sort first and see only strictly-earlier rows.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__p_{dst}"), ignorenulls=True).over(w).alias(dst)
            for dst in payload.values()
        ],
    )
    return filled.where(F.col("__side") == 1).select(*lcols, *payload.values())


def window_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    size: str,
    how: str = "inner",
) -> DataFrame:
    """Flink window join (WindowJoinOperator.java:66): rows join only when
    they fall in the same tumbling window. Composes as window() on both
    sides + equi-join on (window, key) — stays a hash join.
    """
    lw = left.withColumn("__w", F.window(ts_left, size))
    rw = right.withColumn("__w", F.window(ts_right, size))
    cond = (F.col(f"l.__w") == F.col(f"r.__w")) & (
        F.col(f"l.{key_left}") == F.col(f"r.{key_right}")
    )
    return (
        lw.alias("l")
        .join(rw.alias("r"), cond, how)
        .withColumn("window_start", F.col("l.__w.start"))
        .withColumn("window_end", F.col("l.__w.end"))
    )


def lookup_join(
    probe: DataFrame,
    dim: DataFrame,
    key_probe: str,
    key_dim: str,
    how: str = "left",
) -> DataFrame:
    """Flink lookup join (StreamExecLookupJoin.java:56): probe an external
    dimension per row. On Spark the scale-correct default is a broadcast
    hash join of the dimension snapshot — no per-row RPC, no shuffle of
    the probe side.
    """
    return probe.join(F.broadcast(dim), F.col(key_probe) == F.col(key_dim), how)
