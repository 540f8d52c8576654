"""State Processor API analog ITCases (flink_spark/state_reader.py).

The reference contract (SavepointReader.java): open a completed
checkpoint offline and query each operator's keyed state with the
batch API. Witness here: a streaming keyed aggregate's state, read
back through ``read_keyed_state``, must EQUAL the batch aggregate of
the same input — state is not an approximation of the query, it IS
the query's accumulated result. Plus time-travel (batchId) and the
metadata/offset catalogs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_spark import state_reader as sr


def _write(spark, path, rows):
    spark.createDataFrame(rows, "k int, v long").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, ckpt, name):
    q = (
        spark.readStream.schema("k int, v long")
        .parquet(src)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()


@pytest.fixture()
def agg_ckpt(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    rows1 = [(k % 5, k * 7) for k in range(40)]
    _write(spark, src, rows1)
    _drain(spark, src, ckpt, "sr_phase1")
    rows2 = [(k % 5, k * 11) for k in range(25)]
    _write(spark, src, rows2)
    _drain(spark, src, ckpt, "sr_phase2")
    return src, ckpt, rows1, rows2


def test_keyed_state_equals_batch_aggregate(spark, agg_ckpt):
    src, ckpt, rows1, rows2 = agg_ckpt
    state = {
        (r.key_k): (r.value_count, r.value_sum)
        for r in sr.read_keyed_state(spark, ckpt).collect()
    }
    batch = {
        r.k: (r.n, r.s)
        for r in spark.read.parquet(src)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert state == batch


def test_batch_id_time_travel_reads_earlier_state(spark, agg_ckpt):
    src, ckpt, rows1, rows2 = agg_ckpt
    batches = sr.committed_batches(spark, ckpt)
    assert len(batches) >= 2, batches
    early = {
        r.key_k: (r.value_count, r.value_sum)
        for r in sr.read_keyed_state(spark, ckpt, batch_id=batches[0]).collect()
    }
    # state as of batch 0 == aggregate of ONLY phase-1 rows
    want: dict = {}
    for k, v in rows1:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert early == want


def test_state_metadata_lists_the_agg_store(spark, agg_ckpt):
    _, ckpt, _, _ = agg_ckpt
    meta = sr.state_metadata(spark, ckpt).collect()
    assert any(
        r.operatorName == "stateStoreSave" and r.stateStoreName == "default"
        for r in meta
    ), meta


def test_source_offsets_parse(spark, agg_ckpt):
    _, ckpt, _, _ = agg_ckpt
    batches = sr.committed_batches(spark, ckpt)
    off = sr.source_offsets(spark, ckpt, batches[-1])
    assert off["version"] is not None and len(off["entries"]) >= 1


def test_unflattened_read_keeps_struct_schema(spark, agg_ckpt):
    _, ckpt, _, _ = agg_ckpt
    df = sr.read_keyed_state(spark, ckpt, flatten=False)
    names = set(df.columns)
    assert {"key", "value"} <= names


def test_bootstrap_keyed_state_savepoint_writer_analog(spark, tmp_path):
    """SavepointWriter parity (r6, VERDICT r5 #9): seed per-key running
    totals from a batch table into a fresh checkpoint, verify the
    seeded state is readable from the checkpoint, then run the live
    query from that checkpoint and assert it CONTINUES from the seeds
    (Flink: SavepointWriter.bootstrap → run job from savepoint)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from flink_spark.state_reader import (
        bootstrap_keyed_state,
        committed_batches,
        read_keyed_state,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def running_total(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        emit = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                total += int(row["v"])
                if not row["seed"]:
                    emit.append((key[0], total))
        state.update((total,))
        if emit:
            yield pd.DataFrame(emit, columns=["k", "total"])

    seeds = spark.createDataFrame(
        [("a", 100, True), ("b", 7, True)], "k string, v long, seed boolean"
    )
    bootstrap_keyed_state(
        spark, seeds, src, ckpt, running_total,
        key_cols=["k"], output_schema="k string, total long",
        state_schema="total long",
    )
    assert committed_batches(spark, ckpt) == [0]
    seeded = {
        r.key_k: r.value_groupState.total
        for r in read_keyed_state(spark, ckpt).collect()
    }
    assert seeded == {"a": 100, "b": 7}

    # live phase: new data arrives, the SAME pipeline restarts on the
    # SAME checkpoint and must continue from the seeded totals
    spark.createDataFrame(
        [("a", 1, False), ("a", 2, False), ("c", 5, False)],
        "k string, v long, seed boolean",
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string, v long, seed boolean").parquet(src)
    out = stream.groupBy("k").applyInPandasWithState(
        running_total, "k string, total long", "total long", "update",
        GroupStateTimeout.NoTimeout,
    )
    rows = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    # memory sinks refuse checkpoint recovery; foreachBatch supports it
    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt).outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.k: r.total for r in rows}
    # a: seeded 100 + 1 + 2; c: no seed, 5. (b emits nothing — no data.)
    assert got == {"a": 103, "c": 5}
    # and the post-restart state reflects the continuation
    final = {
        r.key_k: r.value_groupState.total
        for r in read_keyed_state(spark, ckpt).collect()
    }
    assert final == {"a": 103, "b": 7, "c": 5}


def test_bootstrap_refuses_nonempty_source_dir(spark, tmp_path):
    """ADVICE r6 #1: bootstrap drains the whole source_dir into a noop
    sink, so pre-existing live data would have its state committed but
    its OUTPUT silently discarded (offset log advances past it). The
    bootstrap must therefore refuse a dir that already holds data."""
    import pandas as pd

    from flink_spark.state_reader import bootstrap_keyed_state

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # a pre-existing live data file
    spark.createDataFrame(
        [("a", 1, False)], "k string, v long, seed boolean"
    ).coalesce(1).write.mode("append").parquet(src)

    def fn(key, pdfs, state):
        if False:
            yield pd.DataFrame()

    seeds = spark.createDataFrame(
        [("a", 100, True)], "k string, v long, seed boolean"
    )
    with pytest.raises(ValueError, match="fresh source_dir"):
        bootstrap_keyed_state(
            spark, seeds, src, ckpt, fn,
            key_cols=["k"], output_schema="k string, total long",
            state_schema="total long",
        )


def test_initial_state_native_savepoint_writer_analog(spark, tmp_path):
    """r7 (VERDICT r6 #6): the Spark-4-native SavepointWriter analog —
    transformWithStateInPandas(initialState=batch_df) seeds each key's
    state before the first micro-batch (StatefulProcessor.
    handleInitialState), so the stream CONTINUES from the seeded totals
    with no seed-replay files. Protobuf comes from the vendored runtime
    (flink_spark/_vendor) when absent from the container."""
    from flink_spark.streaming.process import (
        running_total_with_initial_state,
        timers_available,
    )

    if not timers_available():
        pytest.skip("no protobuf runtime (real or vendored)")

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("c", 5)], "k string, v long"
    ).coalesce(1).write.parquet(src)
    seeds = spark.createDataFrame(
        [("a", 100.0), ("b", 7.0)], "k string, total double"
    )
    stream = spark.readStream.schema("k string, v long").parquet(src)
    out = running_total_with_initial_state(stream, "k", "v", seeds)
    rows = []
    q = (
        out.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .option("checkpointLocation", ckpt).outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {r.k: r.total for r in rows}
    # a: seeded 100 + 1 + 2; c: unseeded 5; b: seeded but no input -> no row
    assert got == {"a": 103.0, "c": 5.0}, rows
