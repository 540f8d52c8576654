"""Bucketed co-located joins + salted skew joins (shuffle-minimization
layer — the 100 TB story items: pay the fact-table shuffle once at
write time, bound the hottest key's task size explicitly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.operators import partitioning as P
from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle joins so exchange counting is meaningful (at test
    SF everything broadcasts otherwise)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, no_broadcast):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the metastore is per-session but the warehouse dir persists —
    # clear stale locations so saveAsTable can recreate the tables
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/b_orders", ignore_errors=True)
    shutil.rmtree(f"{wh}/b_lineitem", ignore_errors=True)
    cat = Catalog(spark, SF_DIR)
    P.write_bucketed(
        cat.orders.selectExpr("o_orderkey AS k", "o_totalprice"),
        "b_orders", ["k"], 8,
    )
    P.write_bucketed(
        cat.lineitem.selectExpr("l_orderkey AS k", "l_quantity"),
        "b_lineitem", ["k"], 8,
    )
    j = P.colocated_join(spark, "b_orders", "b_lineitem", ["k"])
    plain = cat.orders.selectExpr("o_orderkey AS k", "o_totalprice").join(
        cat.lineitem.selectExpr("l_orderkey AS k", "l_quantity"), "k"
    )
    assert j.count() == plain.count()
    # the bucketed join reads pre-partitioned data: zero exchanges;
    # the plain shuffle join pays one per side
    assert P.exchanges_in_plan(j) == 0
    assert P.exchanges_in_plan(plain) >= 2
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_equals_plain_join(spark, no_broadcast):
    cat = Catalog(spark, SF_DIR)
    left = cat.lineitem.selectExpr("l_orderkey AS k", "l_quantity")
    right = cat.orders.selectExpr("o_orderkey AS k", "o_totalprice")
    salted = P.salted_join(left, right, "k", salt=4)
    plain = left.join(right, "k")
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_salted_join_left_outer(spark, no_broadcast):
    """Outer variant: unmatched left rows survive with nulls exactly as
    in the plain left join (every left row has some salt; the right
    replication guarantees the matching (key, salt) pair exists)."""
    cat = Catalog(spark, SF_DIR)
    left = cat.lineitem.selectExpr("l_orderkey AS k", "l_quantity")
    right = cat.orders.where("o_totalprice > 100000").selectExpr(
        "o_orderkey AS k", "o_totalprice"
    )
    salted = P.salted_join(left, right, "k", salt=4, how="left")
    plain = left.join(right, "k", "left")
    assert salted.count() == plain.count()
    assert (
        salted.where("o_totalprice IS NULL").count()
        == plain.where("o_totalprice IS NULL").count()
    )


def test_bulk_iterate_kmeans_converges(spark):
    """DataSet.iterate analogue: 3 Lloyd rounds over the embeddings —
    assignments stabilize and lineage stays flat (each round is
    localCheckpoint-cut, so round 3's plan does not re-run round 1)."""
    from flink_spark.catalog import Catalog
    from flink_spark.operators.iterate import bulk_iterate
    from flink_spark.llm.similarity import (
        _seed_cell, cosine, ivf_centroids, ivf_assign,
    )
    from pyspark.sql import functions as F

    e = Catalog(spark, "/root/testdata/sf0.001").embeddings

    def lloyd_round(assigned, i):
        # M-step from current assignment, E-step reassign
        per_dim = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("cv"))
        )
        cents = per_dim.groupBy("cell").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cv"))),
                lambda s: F.round(s.cv, 6),
            ).alias("centroid")
        )
        return ivf_assign(
            assigned.drop("cell"), cents, "vec_id", "embedding"
        )

    seeded = e.withColumn("cell", _seed_cell(F.col("vec_id"), 4))
    out = bulk_iterate(seeded, lloyd_round, 3)
    n = out.count()
    assert n == e.count()
    assert out.select("cell").distinct().count() <= 4
    # plan was cut: the final frame's logical plan is a checkpoint scan,
    # not a 3-round tree
    assert "LogicalRDD" in out._jdf.queryExecution().logical().toString()


def test_delta_iterate_stops_on_empty_workset(spark):
    from flink_spark.operators.iterate import delta_iterate
    from pyspark.sql import functions as F

    solution = spark.range(0, 10).withColumn("val", F.col("id"))
    workset = spark.range(0, 3)
    calls = []

    def step(sol, ws, i):
        calls.append(i)
        # each round shrinks the workset by filtering; empties at i=2
        return sol, ws.where(F.col("id") > i)

    out = delta_iterate(solution, workset, step, max_iterations=10)
    assert out.count() == 10
    assert calls == [0, 1, 2]  # stopped well before max_iterations
