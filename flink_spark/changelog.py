"""Changelog / retraction layer (SURVEY.md M4).

The reference models every table as a changelog of +I/-U/+U/-D rows
(RowKind, flink-core/src/main/java/org/apache/flink/types/RowKind.java:25)
and infers per-operator changelog modes
(FlinkChangelogModeInferenceProgram.scala:43). Spark has no update-stream
inputs, so the engine adopts the explicit-column convention: a changelog
DataFrame carries a `row_kind` string column with those four values.

Operators:
- changelog_normalize: latest record per key wins, deletes drop the key
  (StreamExecChangelogNormalize.java:74)
- drop_update_before: discard -U rows when downstream only needs upserts
  (StreamExecDropUpdateBefore.java:55 / DropUpdateBeforeFunction.java)
- retracting sums/counts: algebraic aggregation with +1/-1 weights —
  the same trick the reference's retractable agg handlers use
  (GroupAggFunction.java:43 retract path)
- apply_upserts: MERGE-emulation for upsert sinks (anti-join + union;
  Delta MERGE INTO replaces this when a transactional table format is
  on the classpath)

All are single-shuffle DataFrame compositions — normalize is a window
over the key, retracting aggs are plain hash aggregates on weighted
values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"

_ADDITIVE = (INSERT, UPDATE_AFTER)
_RETRACTIVE = (UPDATE_BEFORE, DELETE)


def retract_weight(row_kind: Column) -> Column:
    """+1 for additive kinds, -1 for retractive kinds."""
    return F.when(row_kind.isin(*_ADDITIVE), F.lit(1)).otherwise(F.lit(-1))


def drop_update_before(df: DataFrame, kind_col: str = "row_kind") -> DataFrame:
    return df.where(F.col(kind_col) != UPDATE_BEFORE)


def changelog_normalize(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    kind_col: str = "row_kind",
) -> DataFrame:
    """Materialize the current state of a changelog: the newest row per
    key (by `order_by`), dropped entirely if that row is a delete.

    -U rows are ignored for state (they only retract the previous
    version, which the newest-wins window already supersedes).
    """
    base = drop_update_before(df, kind_col)
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(kind_col) != DELETE))
        .drop("__rn")
    )


def retracting_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    kind_col: str = "row_kind",
) -> DataFrame:
    """SUM over a changelog: additive rows add, retractive rows subtract.
    Exactly the accumulate/retract protocol of the reference's
    retractable AggregateFunction."""
    w = retract_weight(F.col(kind_col))
    return df.groupBy(*keys).agg(
        F.sum(w * F.col(value_col)).alias("sum_value"),
        F.sum(w).cast("long").alias("net_count"),
    )


def retracting_min_max(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    kind_col: str = "row_kind",
) -> DataFrame:
    """MIN/MAX over a changelog. Unlike SUM, min/max are not algebraic
    under retraction — retracting the current extreme requires knowing
    the runner-up — so the reference keeps a value→count backing map
    (MinWithRetractAggFunction.java / MaxWithRetractAggFunction.java).
    The relational spelling of that map: net count per (key, value),
    then min/max over values whose net count is positive. Two shuffles,
    both map-side combinable; the first's cardinality is the number of
    DISTINCT values per key (the backing map's size), not the row count.
    """
    w = retract_weight(F.col(kind_col))
    per_val = df.groupBy(*keys, F.col(value_col).alias("__v")).agg(
        F.sum(w).alias("__net")
    )
    live = per_val.where(F.col("__net") > 0)
    return live.groupBy(*keys).agg(
        F.min("__v").alias("min_value"),
        F.max("__v").alias("max_value"),
        F.countDistinct("__v").alias("n_live_values"),
    )


def apply_upserts(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[Column],
    kind_col: str = "row_kind",
) -> DataFrame:
    """Apply a changelog batch to a snapshot: MERGE emulation.

    Normalizes the change batch to one action per key, removes affected
    keys from the target, and unions in the surviving rows. With Delta/
    Iceberg on the classpath this becomes MERGE INTO inside foreachBatch.
    """
    latest = changelog_normalize(changes, keys, order_by, kind_col).drop(kind_col)
    touched = changes.select(*keys).distinct()
    kept = target.join(touched, keys, "left_anti")
    return kept.unionByName(latest)
