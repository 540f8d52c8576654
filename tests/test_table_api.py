"""PyFlink-compat Table API: every method must produce the same rows as
the equivalent native DataFrame program (the compat layer is pure
delegation — these tests pin that no semantics drift in translation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_spark.table_api import (
    Over,
    Session,
    Slide,
    TableEnvironment,
    Tumble,
)

ROWS = [
    (1, "a", 10.0, "2024-01-01 00:05:00"),
    (1, "b", 20.0, "2024-01-01 00:20:00"),
    (2, "a", 5.0, "2024-01-01 01:05:00"),
    (2, "c", 15.0, "2024-01-01 01:40:00"),
    (3, "a", 7.0, "2024-01-01 03:00:00"),
]
SCHEMA = "k int, name string, amount double, ts_s string"


@pytest.fixture(scope="module")
def env(spark):
    return TableEnvironment.create(spark)


@pytest.fixture(scope="module")
def t(env):
    return (
        env.from_elements(ROWS, SCHEMA)
        .add_columns("cast(ts_s as timestamp) as ts")
        .drop_columns("ts_s")
    )


def test_select_filter_attribute_agg(t):
    got = (
        t.filter("amount > 6")
        .group_by("k")
        .select("k, amount.sum as total, amount.count as cnt")
        .to_pandas()
    )
    assert sorted(map(tuple, got.itertuples(index=False))) == [
        (1, 30.0, 2),
        (2, 15.0, 1),
        (3, 7.0, 1),
    ]


def test_add_rename_drop_columns(t):
    got = (
        t.add_columns("amount * 2 as doubled")
        .rename_columns("doubled as d2")
        .drop_columns("ts")
        .select("k, d2")
        .order_by("d2")
        .fetch(1)
        .to_pandas()
    )
    assert tuple(got.iloc[0]) == (2, 10.0)


def test_joins_and_setops(env, t):
    dim = env.from_elements([(1, "one"), (2, "two")], "k int, label string")
    j = t.join(dim.rename_columns("k as dk"), "k = dk").select("k, label")
    assert j.to_pandas().shape[0] == 4
    lo = t.left_outer_join(dim.rename_columns("k as dk"), "k = dk")
    assert lo.filter("dk is null").select("k").distinct().to_pandas().k.tolist() == [3]

    a = t.select("k")
    b = env.from_elements([(1,), (9,)], "k int")
    assert sorted(a.union(b).to_pandas().k) == [1, 2, 3, 9]
    assert sorted(a.intersect(b).to_pandas().k) == [1]
    assert sorted(b.minus(a).to_pandas().k) == [9]


def test_order_offset_fetch(t):
    got = t.select("amount").order_by("amount.desc").offset(1).fetch(2).to_pandas()
    assert got.amount.tolist() == [15.0, 10.0]


def test_tumble_window(t):
    got = (
        t.window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("w, k")
        .select("k, w.start as ws, amount.sum as total")
        .to_pandas()
    )
    by_key = {(r.k, str(r.ws)): r.total for r in got.itertuples(index=False)}
    assert by_key[(1, "2024-01-01 00:00:00")] == 30.0
    assert by_key[(2, "2024-01-01 01:00:00")] == 20.0


def test_slide_window_counts(t):
    got = (
        t.window(Slide.over("2 hours").every("1 hour").on("ts").alias("w"))
        .group_by("w")
        .select("w.start as ws, amount.count as cnt")
        .to_pandas()
    )
    # row at 00:05 appears in windows starting 23:00 and 00:00
    assert got.cnt.sum() == 2 * len(ROWS)


def test_session_window_gap(t):
    got = (
        t.window(Session.with_gap("30 minutes").on("ts").alias("w"))
        .group_by("w, k")
        .select("k, amount.count as cnt")
        .to_pandas()
    )
    # k=2 rows are 35 min apart → two sessions
    assert got[got.k == 2].cnt.tolist() == [1, 1]


def test_over_window(t):
    got = (
        t.over_column(
            "running",
            F.sum("amount"),
            Over.partition_by("k").order_by("ts").preceding("unbounded"),
        )
        .select("k, amount, running")
        .to_pandas()
    )
    k1 = got[got.k == 1].sort_values("amount")
    assert k1.running.tolist() == [10.0, 30.0]


def test_sql_roundtrip(env, t):
    env.create_temporary_view("t_api", t)
    got = env.sql_query(
        "SELECT k, sum(amount) AS total FROM t_api GROUP BY k"
    ).to_pandas()
    assert dict(zip(got.k, got.total)) == {1: 30.0, 2: 20.0, 3: 7.0}
    assert "t_api" in env.list_tables()
    env.drop_temporary_view("t_api")


def test_join_lateral_udtf(env):
    docs = env.from_elements([(1, "a b"), (2, "c")], "id int, txt string")
    got = (
        docs.join_lateral("explode(split(txt, ' ')) as word")
        .select("id, word")
        .to_pandas()
    )
    assert sorted(map(tuple, got.itertuples(index=False))) == [
        (1, "a"),
        (1, "b"),
        (2, "c"),
    ]


def test_explain_returns_plan(t):
    plan = t.group_by("k").select("k, amount.sum").explain()
    assert "HashAggregate" in plan or "AdaptiveSparkPlan" in plan


# ---------------------------------------------------------------------------
# ADVICE regression cases (round-1/2 findings, fixed round 3)
# ---------------------------------------------------------------------------


def test_minus_is_sql_except(env):
    """PyFlink Table.minus is SQL EXCEPT (pyflink/table/table.py:408):
    [a,a,b] - [a] == [b], NOT [a,b]."""
    left = env.from_elements([("a",), ("a",), ("b",)], "v string")
    right = env.from_elements([("a",)], "v string")
    assert left.minus(right).to_pandas().v.tolist() == ["b"]


def test_minus_all_keeps_multiplicity(env):
    left = env.from_elements([("a",), ("a",), ("b",)], "v string")
    right = env.from_elements([("a",)], "v string")
    assert sorted(left.minus_all(right).to_pandas().v) == ["a", "b"]


def test_agg_detection_not_fooled_by_column_names(env):
    """A projection column named like an agg fn (var_rate, min_value)
    must stay in the projection; percentile() must be routed to agg."""
    tbl = env.from_elements(
        [(1, 2.0, 3.0), (1, 4.0, 5.0), (2, 6.0, 7.0)],
        "k int, var_rate double, min_value double",
    )
    got = (
        tbl.group_by("k")
        .select("k, sum(var_rate) as s, max(min_value) as m")
        .to_pandas()
    )
    assert sorted(map(tuple, got.itertuples(index=False))) == [
        (1, 6.0, 5.0),
        (2, 6.0, 7.0),
    ]
    # aggregates the old repr-substring list missed now plan correctly
    got2 = (
        tbl.group_by("k")
        .select("k, percentile(var_rate, 0.5) as p50, median(min_value) as med")
        .to_pandas()
    )
    assert got2[got2.k == 1].p50.tolist() == [3.0]


def test_over_defaults_to_range_frame(env):
    """Flink over-windows default to RANGE: peer rows (duplicate order
    keys) all see the full peer-group aggregate."""
    tbl = env.from_elements(
        [(1, 10, 1.0), (1, 10, 2.0), (1, 20, 4.0)], "k int, o int, v double"
    )
    got = tbl.over_column(
        "s", F.sum("v"), Over.partition_by("k").order_by("o")
    ).to_pandas()
    by_ov = sorted((r.o, r.v, r.s) for r in got.itertuples(index=False))
    # both o=10 peers see 3.0 (RANGE), not 1.0/3.0 (ROWS)
    assert by_ov == [(10, 1.0, 3.0), (10, 2.0, 3.0), (20, 4.0, 7.0)]


def test_over_explicit_rows_frame(env):
    tbl = env.from_elements(
        [(1, 10, 1.0), (1, 20, 2.0), (1, 30, 4.0)], "k int, o int, v double"
    )
    got = tbl.over_column(
        "s", F.sum("v"), Over.partition_by("k").order_by("o").preceding(1)
    ).to_pandas()
    assert sorted(got.s.tolist()) == [1.0, 3.0, 6.0]


def test_jdbc_partition_column_requires_bounds(spark):
    import pytest as _pytest

    from flink_spark.sources import jdbc_source

    with _pytest.raises(ValueError, match="lower_bound"):
        jdbc_source(
            spark,
            "jdbc:postgresql://nowhere/db",
            "t",
            partition_column="id",
        )


def test_flat_aggregate_emits_multiple_rows(env):
    """GroupedTable.flat_aggregate (TableAggregateFunction surface): the
    user function emits top-2 rows per group."""
    import pandas as pd

    t = env.from_elements(
        [("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 9.0)],
        "cat string, v double",
    )

    def top2(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.nlargest(2, "v")[["cat", "v"]]
        return out

    got = (
        t.group_by("cat")
        .flat_aggregate(top2, "cat string, v double")
        .execute()
        .collect()
    )
    rows = sorted((r.cat, r.v) for r in got)
    assert rows == [("a", 2.0), ("a", 3.0), ("b", 9.0)]


def test_changelog_stream_round_trip(env):
    """from_changelog_stream normalizes +I/+U/-D to current state;
    to_changelog_stream emits the table as an insert-only changelog."""
    from pyspark.sql import functions as F

    df = env.spark.createDataFrame(
        [
            ("+I", 1, "v1", 10),
            ("+U", 1, "v2", 20),
            ("+I", 2, "x1", 11),
            ("-D", 2, "x1", 21),
            ("+I", 3, "y1", 12),
        ],
        "row_kind string, k long, payload string, seq long",
    )
    t = env.from_changelog_stream(df, ["k"], [F.col("seq")])
    state = sorted((r.k, r.payload) for r in t.execute().collect())
    assert state == [(1, "v2"), (3, "y1")]
    back = env.to_changelog_stream(t)
    assert set(back.columns) >= {"row_kind", "k", "payload"}
    assert all(r.row_kind == "+I" for r in back.collect())
