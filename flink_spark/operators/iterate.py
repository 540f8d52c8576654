"""Batch bulk iterations — the DataSet.iterate analogue.

Reference: flink-java/.../api/java/DataSet.java iterate() /
iterateDelta() (bulk and delta iterations driven by the runtime's
iteration head/tail tasks). Streaming cycles (DataStream.iterate) remain
a non-goal (SURVEY §2 row: unsupported in Spark streaming); BATCH
iterative refinement maps naturally onto a driver-side loop over
DataFrame transformations — the driver is the iteration head, each
round's plan is a fresh Catalyst job.

The scale-critical detail is lineage: naively looping
``df = step(df)`` builds an ever-deeper plan that re-executes every
prior round on each action and eventually overwhelms the optimizer.
Each round is therefore cut with ``localCheckpoint(eager=True)`` —
materializing the round's result on the executors (the analogue of the
reference's per-superstep intermediate result) and resetting the plan.

Delta iterations keep the reference's workset/solution-set split: the
step function returns (new_solution, new_workset) and iteration stops
early when the workset is empty — the same convergence criterion
DataSet.iterateDelta uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def bulk_iterate(
    df: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    n_iterations: int,
    *,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Run ``step`` n times: df ← step(df, i) (DataSet.iterate).

    ``checkpoint_every`` controls how many rounds may chain lazily
    between lineage cuts — raise it when rounds are cheap projections,
    keep 1 when each round shuffles."""
    for i in range(n_iterations):
        df = step(df, i)
        if (i + 1) % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
    return df


def delta_iterate(
    solution: DataFrame,
    workset: DataFrame,
    step: Callable[[DataFrame, DataFrame, int], tuple[DataFrame, DataFrame]],
    max_iterations: int,
) -> DataFrame:
    """DataSet.iterateDelta analogue: iterate (solution, workset) ←
    step(solution, workset, i), stopping early when the workset is
    empty. The emptiness probe is a cheap ``isEmpty`` on the
    checkpointed workset (one partition-local job, no full count)."""
    for i in range(max_iterations):
        solution, workset = step(solution, workset, i)
        solution = solution.localCheckpoint(eager=True)
        workset = workset.localCheckpoint(eager=True)
        if workset.isEmpty():
            break
    return solution
