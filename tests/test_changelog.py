"""Changelog layer unit tests using the FIXTURES.md §3 userChangelog shape
(+I/-U/+U/-D rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark import changelog as CL

ROWS = [
    # (row_kind, user_id, user_name, balance, seq)
    ("+I", "u1", "alice", 100.0, 1),
    ("+I", "u2", "bob", 50.0, 2),
    ("-U", "u1", "alice", 100.0, 3),
    ("+U", "u1", "alice2", 150.0, 4),
    ("+I", "u3", "carol", 70.0, 5),
    ("-D", "u2", "bob", 50.0, 6),
]


def _cdc(spark):
    return spark.createDataFrame(
        ROWS, "row_kind string, user_id string, user_name string, balance double, seq long"
    )


def test_changelog_normalize(spark):
    state = CL.changelog_normalize(_cdc(spark), ["user_id"], [F.col("seq")])
    got = {r["user_id"]: (r["user_name"], r["balance"]) for r in state.collect()}
    assert got == {"u1": ("alice2", 150.0), "u3": ("carol", 70.0)}


def test_retracting_sum(spark):
    agg = CL.retracting_sum(_cdc(spark).withColumn("g", F.lit(1)), ["g"], "balance")
    row = agg.collect()[0]
    # +100 +50 -100 +150 +70 -50 = 220 ; net count 1+1-1+1+1-1 = 2
    assert row["sum_value"] == 220.0
    assert row["net_count"] == 2


def test_drop_update_before(spark):
    assert CL.drop_update_before(_cdc(spark)).where(
        F.col("row_kind") == "-U"
    ).count() == 0


def test_apply_upserts(spark):
    target = spark.createDataFrame(
        [("u1", "old", 1.0, 0), ("u9", "keep", 9.0, 0)],
        "user_id string, user_name string, balance double, seq long",
    )
    merged = CL.apply_upserts(
        target, _cdc(spark), ["user_id"], [F.col("seq")]
    )
    got = {r["user_id"]: r["user_name"] for r in merged.collect()}
    # u1 updated, u2 deleted, u3 inserted, u9 untouched
    assert got == {"u1": "alice2", "u3": "carol", "u9": "keep"}
