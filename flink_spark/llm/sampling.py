"""Deterministic sampling / data-mixing operators for training pipelines.

Random sampling (`df.sample`) is not reproducible across runs, engines,
or partitionings — a training data mix must be. These operators derive
keep/drop decisions from md5 of the row's id, so:

- the same row always lands on the same side of the cut (stable across
  re-runs, re-partitioning, and engines — the DuckDB oracle replays the
  exact same selection);
- sampling composes with dedup/filter stages without reshuffling
  (map-only predicates);
- rates are exact in expectation and hash-uniform, the same contract as
  murmur-bucket sampling in feature stores.

All expressions are JVM built-ins — map-only, zero shuffle, and the
stratified quota is one per-stratum window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 4 md5 hex
    chars of the stringified id (16 bits), mod buckets."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10)
        .cast("long")
        % buckets
    )


def hash_sample(
    df: DataFrame, id_col: str, rate: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction: bucket(id) < rate·buckets.

    Complementary slices are exact: hash_sample(r) and its complement
    partition the input, and a smaller rate's sample is a SUBSET of a
    larger rate's (nested samples — the property needed for scaling-law
    data ladders)."""
    cut = int(rate * buckets)
    return df.where(hash_bucket(F.col(id_col), buckets) < cut)


def stratified_quota(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen deterministically
    (lowest md5 of id wins — a uniform, engine-reproducible 'random'
    draw). One shuffle on the stratum key."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mix_sources(
    df: DataFrame,
    source_col: str,
    id_col: str,
    rates: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-source sampling rates in one map-only pass — the 'data mix'
    step of a training pipeline (e.g. {'web': 0.1, 'books': 1.0}).
    Unlisted sources are dropped (rate 0)."""
    bucket = hash_bucket(F.col(id_col), buckets)
    cond = F.lit(False)
    for src, rate in rates.items():
        cut = int(rate * buckets)
        cond = cond | (
            (F.col(source_col) == src) & (bucket < F.lit(cut))
        )
    return df.where(cond)
