"""OVER-window patterns: Top-N, deduplication, running aggregates.

Reference: StreamExecRank.java:83 (Top-N recognized from
ROW_NUMBER() OVER (...) <= N), StreamExecDeduplicate.java:85
(first/last row per key from ROW_NUMBER() = 1),
StreamExecOverAggregate.java:92 (OVER aggregates).

In batch these are exactly Catalyst's WindowExec; the helpers here
encode the recognized patterns so callers get the reference semantics
(deterministic tie-breaks included) without restating the window spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-N per key — the Flink Rank operator pattern
    (AppendOnlyTopNFunction.java:52 in streaming; plain WindowExec here).
    Callers must pass a total order (include a unique tie-break column)
    for deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep the first row per key in `order_by` order
    (Flink Deduplication keep-first, RowTimeDeduplicateFunction.java)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_last(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep the last row per key — reverse the order spec."""
    rev = [c.desc() if isinstance(c, str) else _reverse(c) for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*rev)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _reverse(c: Column) -> Column:
    # Column sort-order introspection isn't public API; callers pass plain
    # columns and we flip asc→desc here.
    return c.desc()
