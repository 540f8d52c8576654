"""Retraction-aware streaming join (StreamingJoinOperator.java:36
semantics on the changelog convention): the emitted +I/-D changelog,
net-summed, must equal the batch inner join of the normalized inputs."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flink_spark.streaming.retract_join import retract_join_stream
from tests.test_streaming import _feed_batches


def _net(rows):
    """Net multiplicity per joined row from a +I/-D changelog."""
    c = Counter()
    for r in rows:
        delta = 1 if r.row_kind == "+I" else -1
        c[tuple(r)[1:]] += delta
    return {k: v for k, v in c.items() if v != 0}


def test_retract_join_matches_batch_of_normalized_inputs(spark, tmp_path):
    schema = "k long, seq long, row_kind string, side int, val string"
    # left side (side=0): orders; right side (side=1): customer versions.
    # seq gives the global arrival order across both sides.
    batches = [
        [  # batch 1: two left inserts, one right insert
            (1, 1, "+I", 1, "cust_a"),
            (1, 2, "+I", 0, "o1"),
            (1, 3, "+I", 0, "o2"),
        ],
        [  # batch 2: right row replaced (delete + insert = update)
            (1, 4, "-D", 1, "cust_a"),
            (1, 5, "+I", 1, "cust_b"),
        ],
        [  # batch 3: one left delete, a second right insert
            (1, 6, "-D", 0, "o1"),
            (1, 7, "+I", 1, "cust_c"),
        ],
    ]
    stream = _feed_batches(spark, str(tmp_path), batches, schema)
    left = stream.where("side = 0").select("k", "seq", "row_kind", F.col("val").alias("order_id"))
    right = stream.where("side = 1").select("k", "seq", "row_kind", F.col("val").alias("cust"))
    out = retract_join_stream(
        left, right, key="k", seq_col="seq",
        left_payload=["order_id"], right_payload=["cust"],
    )
    from flink_spark.streaming import core as SC

    SC.run_to_memory(out, "t_retract_join", "append")
    rows = spark.sql("SELECT * FROM t_retract_join").collect()

    # the changelog must contain actual retractions (batch-2 delete
    # retracts the o1/o2 x cust_a joins)
    kinds = Counter(r.row_kind for r in rows)
    assert kinds["-D"] > 0 and kinds["+I"] > kinds["-D"]

    # net state == batch inner join of the normalized (live) inputs:
    # live left = {o2}; live right = {cust_b, cust_c}
    assert _net(rows) == {
        (1, "o2", "cust_b"): 1,
        (1, "o2", "cust_c"): 1,
    }


def test_retract_join_delete_before_insert_is_noop(spark, tmp_path):
    schema = "k long, seq long, row_kind string, side int, val string"
    batches = [[
        (7, 1, "-D", 0, "ghost"),  # delete of a never-inserted row
        (7, 2, "+I", 0, "o1"),
        (7, 3, "+I", 1, "c1"),
    ]]
    stream = _feed_batches(spark, str(tmp_path), batches, schema)
    left = stream.where("side = 0").select("k", "seq", "row_kind", F.col("val").alias("order_id"))
    right = stream.where("side = 1").select("k", "seq", "row_kind", F.col("val").alias("cust"))
    out = retract_join_stream(
        left, right, key="k", seq_col="seq",
        left_payload=["order_id"], right_payload=["cust"],
    )
    from flink_spark.streaming import core as SC

    SC.run_to_memory(out, "t_retract_join2", "append")
    rows = spark.sql("SELECT * FROM t_retract_join2").collect()
    assert _net(rows) == {(7, "o1", "c1"): 1}
    assert all(r.row_kind == "+I" for r in rows)


def test_count_map_binary_pack_round_trip_and_cost():
    """State is binary-packed (pack_count_map), not JSON-round-tripped:
    pack/unpack must be lossless (incl. NULL fields, multi-byte utf-8)
    and strictly smaller + faster than the r4 double-JSON encoding on a
    hot key's worth of live rows."""
    import json
    import time

    from flink_spark.streaming.retract_join import (
        pack_count_map,
        unpack_count_map,
    )

    hot = {
        (f"user_{i}", None if i % 7 == 0 else f"val_{i}", "x" * (i % 5), "é")
        : (i % 3) + 1
        for i in range(10_000)
    }
    buf = pack_count_map(hot)
    assert unpack_count_map(buf) == hot
    assert unpack_count_map(b"") == {}

    # the r4 encoding: each payload json.dumps'd, then the [payload,
    # count] pair json.dumps'd again; decode reverses both
    t0 = time.perf_counter()
    for _ in range(5):
        j = [json.dumps([json.dumps(list(p)), c]) for p, c in hot.items()]
        _ = {tuple(json.loads(e[0])): e[1]
             for v in j for e in [json.loads(v)]}
    json_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        _ = unpack_count_map(pack_count_map(hot))
    pack_s = time.perf_counter() - t0
    json_bytes = sum(len(x) for x in j)
    assert len(buf) < json_bytes, (len(buf), json_bytes)
    # generous 2x guard: the point is "not slower"; measured ~2-4x faster
    assert pack_s < json_s * 2, (pack_s, json_s)
