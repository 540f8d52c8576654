"""Sequence packing: fill fixed token-budget training sequences from a
document stream — the step between dedup/mix and the trainer.

The packer is the deterministic 'streaming fill' variant: documents are
laid out in a stable total order (doc id), and a document starts a new
sequence whenever its tokens would not have fit the running budget —
i.e. sequence id = floor(exclusive-prefix-token-sum / budget). This is
not bin-packing-optimal (no backfilling), but it is:

- one window over the layout order — a single shuffle, no iteration;
- reproducible across runs/engines (the property that matters for
  resumable training jobs);
- contiguous: a sequence is a run of consecutive docs, so the trainer
  can stream it without random access.

Documents longer than the budget occupy sequences alone (they cross a
boundary and their successors start fresh), matching the usual
truncate-downstream contract.

At 100 TB the single global window is the bottleneck by design choice:
partition the layout by a shard column first (`shard_col`) and pack per
shard — the window key becomes (shard), restoring parallelism, at the
cost of per-shard rather than global contiguity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each doc a sequence id under a token budget.

    Output: input columns + (n_tokens, seq_id). seq_id is unique within
    a shard (globally when shard_col is None)."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    part = [shard_col] if shard_col is not None else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sum = df.withColumn("n_tokens", toks).withColumn(
        "__cum", F.sum("n_tokens").over(w)
    )
    return with_sum.withColumn(
        "seq_id",
        F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(budget)),
    ).drop("__cum")


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence fill statistics: docs, tokens, fill ratio."""
    return packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.lit(budget), 6).alias("fill_ratio"),
    )
