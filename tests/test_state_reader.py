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
