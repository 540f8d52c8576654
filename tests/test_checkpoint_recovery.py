"""Checkpoint recovery ITCase: a stateful streaming aggregate stopped
mid-stream and restarted from its checkpoint must neither lose nor
duplicate state — the exactly-once contract Flink anchors on
checkpointed state restore (CheckpointCoordinator / restore-from-
savepoint semantics; the Structured Streaming analogue is the
checkpointLocation's offset log + state store).

Mechanics: 6 single-file micro-batches (maxFilesPerTrigger=1); phase 1
processes an availableNow pass over the first 3 files and STOPS; three
more files arrive; phase 2 restarts the SAME query (same checkpoint,
same sink table) with availableNow and drains the rest. The final
keyed counts must equal the batch aggregate over all 6 files — a lost
batch under-counts, a replayed batch double-counts, so equality is the
exactly-once witness."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, "k int, v long").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _start(spark, src, ckpt, mode):
    stream = (
        spark.readStream.schema("k int, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    return (
        agg.writeStream.format("memory")
        .queryName("ckpt_recovery")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    for i in range(3):
        _write_file(spark, src, [(k, i * 10 + k) for k in range(4)])

    q = _start(spark, src, ckpt, "complete")
    assert q.awaitTermination(120)
    q.stop()
    mid = {r.k: (r.n, r.s) for r in spark.table("ckpt_recovery").collect()}
    assert mid and all(n == 3 for n, _ in mid.values()), mid

    # three more files arrive while the query is down
    for i in range(3, 6):
        _write_file(spark, src, [(k, i * 10 + k) for k in range(4)])

    q = _start(spark, src, ckpt, "complete")
    assert q.awaitTermination(120)
    q.stop()

    got = {r.k: (r.n, r.s) for r in spark.table("ckpt_recovery").collect()}
    want = {
        r.k: (r.n, r.s)
        for r in spark.read.parquet(src)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want, (got, want)
    # and the counts really span both phases (6 files, one row per key
    # per file): neither phase alone could produce them
    assert all(n == 6 for n, _ in got.values())
    spark.sql("DROP TABLE IF EXISTS ckpt_recovery")
