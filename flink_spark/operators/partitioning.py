"""Partitioning strategies for shuffle minimization at scale.

Reference analogues:
- Bucketed co-located join ← Flink's pre-partitioned connectors +
  `DataStream.partitionCustom` reuse; in batch SQL the reference relies
  on Blink's shuffle-removal rules (`RemoveRedundantShuffleRule`,
  FlinkBatchRuleSets) when both inputs are hash-distributed on the join
  key. Spark's native form is bucketed tables: both sides written with
  `bucketBy(n, key)` join WITHOUT an Exchange.
- Salted join ← the skew mitigation Flink ships as
  `rebalance`/`rescale` + two-stage aggregates; Spark 3+ also has AQE
  skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in our
  session defaults) — salting is the declarative fallback when a single
  hot key exceeds what AQE splitting can fix (AQE splits partitions,
  not keys).

Scale rationale (100 TB): a fact-fact join shuffles both inputs every
query. Bucketing pays the shuffle ONCE at write time; every subsequent
join/aggregate on the bucket key is exchange-free. The salted join
bounds the largest single task by `salt` while keeping the small side's
duplication factor explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) table.

    Joins and aggregations between tables bucketed on the same key with
    the same bucket count run without an Exchange (verified by
    `assert_colocated_join`); sorting within buckets additionally
    removes the Sort for sort-merge joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — exchange-free when bucket specs
    match (bucket pruning/reuse is Catalyst's, we just read the tables).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the executed plan — the probe
    used to assert co-location (0 for a bucketed-bucketed join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed left-side keys.

    The left (large, skewed) side gets a random salt in [0, salt); the
    right side is replicated `salt` times with every salt value; the
    join key becomes (key, salt), splitting a hot key's rows across
    `salt` tasks. Output equals the plain join (the salt columns are
    dropped). Use when ONE key dominates — AQE's skew-join splitting
    (enabled in session defaults) handles moderate skew without help,
    but a single mega-key inside one partition can only be split by
    changing the key itself.

    The replication factor multiplies the right side's shuffle volume —
    keep `salt` at the hot-key multiplicity, not higher.
    """
    l_s = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_s = right.join(
        F.broadcast(
            left.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = l_s.join(r_s, [on, "__salt"], how)
    return out.drop("__salt")
