"""Async lookup join — the AsyncWaitOperator analogue.

Reference:
- API: AsyncDataStream.unorderedWait:115 / orderedWait:165
  (flink-streaming-java/.../datastream/AsyncDataStream.java)
- Operator: AsyncWaitOperator.java:91 — a bounded in-flight queue of
  async requests per task, emitting either in completion order
  (unordered) or input order (ordered).
- Table surface: AsyncTableFunction / AsyncLookupFunction
  (flink-table/flink-table-common/.../functions/AsyncTableFunction.java).

Spark mapping: ``mapInPandas`` — each Arrow batch's keys are resolved
concurrently on an asyncio loop inside the Python worker, with a
semaphore enforcing the in-flight capacity (the reference's queue
capacity). Ordered mode preserves the input row order within the batch;
unordered emits rows as their lookups complete — the same contract as
the reference's two wait modes, at Arrow-batch granularity.

Scale note: parallelism = input partitions × capacity concurrent
requests per task, identical to the reference's per-subtask capacity
model. Nothing is collected to the driver; the resolver runs where the
rows are.
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


async def _drive(
    resolver, keys: list, capacity: int, ordered: bool
) -> list[tuple[int, Any]]:
    """Resolve all keys with at most `capacity` in flight.

    Returns (input_index, result) pairs — in input order when ordered,
    in completion order otherwise.
    """
    sem = asyncio.Semaphore(capacity)

    async def one(i: int, k) -> tuple[int, Any]:
        async with sem:
            return i, await resolver(k)

    tasks = [asyncio.ensure_future(one(i, k)) for i, k in enumerate(keys)]
    if ordered:
        return list(await asyncio.gather(*tasks))
    out = []
    for fut in asyncio.as_completed(tasks):
        out.append(await fut)
    return out


def async_lookup_join(
    df: DataFrame,
    resolver_factory: Callable[[], Callable],
    key_col: str,
    payload_fields: dict[str, str],
    *,
    capacity: int = 100,
    ordered: bool = True,
    how: str = "left",
) -> DataFrame:
    """Enrich each row with the result of an async point lookup.

    ``resolver_factory`` is called once per task (executor side) and
    must return an ``async def resolver(key) -> dict | None`` — the
    AsyncLookupFunction.eval analogue; a None result means no match.
    ``payload_fields`` maps output column name -> Spark SQL type.
    ``how``: 'left' emits unmatched rows with null payload, 'inner'
    drops them (the reference's lookup-join join types).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = in_fields + ", " + ", ".join(
        f"{n} {t}" for n, t in payload_fields.items()
    )
    payload_names = list(payload_fields)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolver = resolver_factory()
        loop = asyncio.new_event_loop()
        try:
            for pdf in batches:
                if pdf.empty:
                    continue
                keys = pdf[key_col].tolist()
                results = loop.run_until_complete(
                    _drive(resolver, keys, capacity, ordered)
                )
                if how == "inner":
                    results = [(i, r) for i, r in results if r is not None]
                if not results:
                    continue
                order = [i for i, _ in results]
                out = pdf.iloc[order].reset_index(drop=True)
                for name in payload_names:
                    out[name] = [
                        (r.get(name) if r is not None else None)
                        for _, r in results
                    ]
                yield out
        finally:
            loop.close()

    return df.mapInPandas(fn, schema=out_schema)


def unordered_wait(df, resolver_factory, key_col, payload_fields, **kw):
    """AsyncDataStream.unorderedWait:115 — completion-order emission."""
    return async_lookup_join(
        df, resolver_factory, key_col, payload_fields, ordered=False, **kw
    )


def ordered_wait(df, resolver_factory, key_col, payload_fields, **kw):
    """AsyncDataStream.orderedWait:165 — input-order emission."""
    return async_lookup_join(
        df, resolver_factory, key_col, payload_fields, ordered=True, **kw
    )
