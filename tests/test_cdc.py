"""Debezium CDC front-end: envelope JSON → row_kind changelog feeding
the changelog layer (the reference's DebeziumJsonDeserializationSchema →
ChangelogNormalize input path), batch and as a micro-batched file
stream with an oracle-checked final state."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flink_spark import changelog as CL
from flink_spark.cdc import debezium_to_changelog

PAYLOAD = "id bigint, name string, amount bigint"


def _env(op, before=None, after=None, ts=0):
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts}
    )


def _history():
    """A little CDC history: snapshot, insert, two updates, a delete,
    and a reinsert — final table state is computable by hand."""
    return [
        _env("r", after={"id": 1, "name": "a", "amount": 10}, ts=1),
        _env("r", after={"id": 2, "name": "b", "amount": 20}, ts=1),
        _env("c", after={"id": 3, "name": "c", "amount": 30}, ts=2),
        _env("u", before={"id": 1, "name": "a", "amount": 10},
             after={"id": 1, "name": "a2", "amount": 11}, ts=3),
        _env("d", before={"id": 2, "name": "b", "amount": 20}, ts=4),
        _env("u", before={"id": 3, "name": "c", "amount": 30},
             after={"id": 3, "name": "c2", "amount": 33}, ts=5),
        _env("c", after={"id": 2, "name": "b2", "amount": 25}, ts=6),
        "this is not json",  # parse error → dropped
    ]


FINAL_STATE = {(1, "a2", 11), (2, "b2", 25), (3, "c2", 33)}


def test_debezium_batch_to_normalized_state(spark):
    df = spark.createDataFrame([(v,) for v in _history()], "value string")
    ch = debezium_to_changelog(df, PAYLOAD)
    # op → row_kind mapping (DebeziumJsonDeserializationSchema.java:140)
    kinds = {
        (r.row_kind, r.id, r.name)
        for r in ch.select("row_kind", "id", "name").collect()
    }
    assert ("+I", 1, "a") in kinds      # snapshot read
    assert ("-U", 1, "a") in kinds      # update-before
    assert ("+U", 1, "a2") in kinds     # update-after
    assert ("-D", 2, "b") in kinds      # delete
    normalized = CL.changelog_normalize(
        ch, ["id"], [F.col("ts_ms"), F.col("row_kind")]
    )
    got = {(r.id, r.name, r.amount) for r in normalized.collect()}
    assert got == FINAL_STATE


def test_debezium_plan_is_map_only(spark):
    """The parse is one from_json + explode — no shuffle, no Python."""
    import contextlib
    import io

    df = spark.createDataFrame([(v,) for v in _history()], "value string")
    ch = debezium_to_changelog(df, PAYLOAD)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ch.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan  # the explode


def test_debezium_file_stream_retract_aggregation(spark, tmp_path):
    """The round trip the r4 verdict asked for: a debezium-shaped file
    stream (one file per micro-batch) through retracting aggregation;
    the final sums must equal the hand-computed oracle of the final
    table state."""
    src = tmp_path / "cdc_src"
    src.mkdir()
    hist = _history()
    # three micro-batches, ordered file names
    chunks = [hist[:3], hist[3:5], hist[5:]]
    for i, chunk in enumerate(chunks):
        p = src / f"{i:03d}.json"
        p.write_text("\n".join(chunk) + "\n")

    stream = (
        spark.readStream.format("text")
        .schema("value string")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    ch = debezium_to_changelog(stream, PAYLOAD)
    summed = CL.retracting_sum(ch, [], "amount")
    q = (
        summed.writeStream.format("memory")
        .queryName("cdc_sum")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    row = spark.table("cdc_sum").collect()[0]
    want_sum = sum(a for _, _, a in FINAL_STATE)
    assert row.sum_value == want_sum, row
    assert row.net_count == len(FINAL_STATE), row


def test_debezium_unknown_op_dropped(spark):
    df = spark.createDataFrame(
        [(_env("x", after={"id": 9, "name": "z", "amount": 1}),)],
        "value string",
    )
    assert debezium_to_changelog(df, PAYLOAD).count() == 0
