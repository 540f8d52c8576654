"""Async lookup join (AsyncWaitOperator analogue): ordering modes,
in-flight capacity, and join semantics with a stubbed async resolver."""

from __future__ import annotations

import asyncio

import pytest

from flink_spark.operators.async_lookup import (
    _drive,
    async_lookup_join,
    ordered_wait,
    unordered_wait,
)


def _run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_drive_ordered_preserves_input_order():
    async def resolver(k):
        await asyncio.sleep(0.05 if k == 0 else 0.001)  # first key slowest
        return k * 10

    got = _run(_drive(resolver, [0, 1, 2, 3], capacity=4, ordered=True))
    assert got == [(0, 0), (1, 10), (2, 20), (3, 30)]


def test_drive_unordered_emits_completion_order():
    async def resolver(k):
        await asyncio.sleep(0.08 if k == 0 else 0.001)
        return k * 10

    got = _run(_drive(resolver, [0, 1, 2, 3], capacity=4, ordered=False))
    assert got[-1] == (0, 0)  # slowest key arrives last
    assert sorted(got) == [(0, 0), (1, 10), (2, 20), (3, 30)]


def test_drive_enforces_inflight_capacity():
    state = {"now": 0, "peak": 0}

    async def resolver(k):
        state["now"] += 1
        state["peak"] = max(state["peak"], state["now"])
        await asyncio.sleep(0.005)
        state["now"] -= 1
        return k

    _run(_drive(resolver, list(range(20)), capacity=3, ordered=True))
    assert state["peak"] <= 3
    assert state["peak"] >= 2  # concurrency actually happened


def _make_factory():
    """Build the resolver factory as a closure: cloudpickle serializes it
    by value, so Spark workers don't need this test module importable."""

    def factory():
        async def resolver(k):
            await asyncio.sleep(0.001)
            if k % 3 == 0:
                return None  # dim miss
            return {"label": f"u{k}", "score": float(k) * 1.5}

        return resolver

    return factory


_dim_resolver_factory = _make_factory()


def test_spark_ordered_lookup_left(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    out = ordered_wait(
        df, _dim_resolver_factory, "k",
        {"label": "string", "score": "double"},
    )
    rows = {r.k: (r.label, r.score) for r in out.collect()}
    assert len(rows) == 10
    assert rows[1] == ("u1", 1.5)
    assert rows[3] == (None, None)  # left join keeps misses as nulls


def test_spark_lookup_inner_drops_misses(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    out = async_lookup_join(
        df, _dim_resolver_factory, "k",
        {"label": "string", "score": "double"},
        how="inner",
    )
    ks = sorted(r.k for r in out.collect())
    assert ks == [1, 2, 4, 5, 7, 8]


def test_spark_unordered_lookup_same_rows(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    out = unordered_wait(
        df, _dim_resolver_factory, "k",
        {"label": "string", "score": "double"},
    )
    rows = {r.k: r.label for r in out.collect()}
    assert rows == {
        k: (None if k % 3 == 0 else f"u{k}") for k in range(10)
    }


def test_bad_how_raises(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="how"):
        async_lookup_join(df, _dim_resolver_factory, "k", {"x": "string"},
                          how="full")
