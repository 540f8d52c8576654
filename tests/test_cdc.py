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


# ---------------------------------------------------------------------------
# Canal / Maxwell / OGG formats (CanalJsonDeserializationSchema.java:128,
# MaxwellJsonDeserializationSchema.java:124, OggJsonDeserializationSchema)
# ---------------------------------------------------------------------------

from flink_spark.cdc import (  # noqa: E402
    canal_to_changelog,
    maxwell_to_changelog,
    ogg_to_changelog,
)


def test_canal_batched_envelope_and_partial_old_overlay(spark):
    rows = [
        json.dumps({"data": [{"id": 1, "name": "a", "amount": 10},
                             {"id": 2, "name": "b", "amount": 20}],
                    "old": None, "type": "INSERT", "ts": 1}),
        # batched UPDATE: old holds ONLY the changed fields per row
        json.dumps({"data": [{"id": 1, "name": "a", "amount": 11},
                             {"id": 2, "name": "b2", "amount": 20}],
                    "old": [{"amount": "10"}, {"name": "b"}],
                    "type": "UPDATE", "ts": 2}),
        json.dumps({"data": [{"id": 1, "name": "a", "amount": 11}],
                    "old": None, "type": "DELETE", "ts": 3}),
        "not json",
    ]
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    ch = canal_to_changelog(df, PAYLOAD)
    got = {(r.row_kind, r.id, r.name, r.amount) for r in ch.collect()}
    assert got == {
        ("+I", 1, "a", 10), ("+I", 2, "b", 20),
        # update-before = data overlaid with old's changed fields
        ("-U", 1, "a", 10), ("+U", 1, "a", 11),
        ("-U", 2, "b", 20), ("+U", 2, "b2", 20),
        ("-D", 1, "a", 11),
    }


def test_canal_stream_feeds_changelog_normalize(spark):
    rows = [
        json.dumps({"data": [{"id": 1, "name": "a", "amount": 10}],
                    "old": None, "type": "INSERT", "ts": 1}),
        json.dumps({"data": [{"id": 1, "name": "a", "amount": 99}],
                    "old": [{"amount": "10"}], "type": "UPDATE", "ts": 2}),
    ]
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    ch = canal_to_changelog(df, PAYLOAD)
    normalized = CL.changelog_normalize(
        ch, ["id"], [F.col("ts"), F.col("row_kind")]
    )
    got = {(r.id, r.name, r.amount) for r in normalized.collect()}
    assert got == {(1, "a", 99)}


def test_maxwell_partial_old_overlay(spark):
    rows = [
        json.dumps({"type": "insert", "ts": 1,
                    "data": {"id": 7, "name": "x", "amount": 5}}),
        json.dumps({"type": "update", "ts": 2,
                    "data": {"id": 7, "name": "x2", "amount": 5},
                    "old": {"name": "x"}}),
        json.dumps({"type": "delete", "ts": 3,
                    "data": {"id": 7, "name": "x2", "amount": 5}}),
    ]
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    ch = maxwell_to_changelog(df, PAYLOAD)
    got = {(r.row_kind, r.id, r.name, r.amount) for r in ch.collect()}
    assert got == {
        ("+I", 7, "x", 5),
        ("-U", 7, "x", 5), ("+U", 7, "x2", 5),
        ("-D", 7, "x2", 5),
    }


def test_maxwell_overlay_uses_json_presence_not_value(spark):
    # old carries name explicitly NULL: presence wins, before.name=NULL
    rows = [json.dumps({"type": "update", "ts": 1,
                        "data": {"id": 1, "name": "n", "amount": 2},
                        "old": {"name": None}})]
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    ch = maxwell_to_changelog(df, PAYLOAD)
    before = [r for r in ch.collect() if r.row_kind == "-U"][0]
    assert before.name is None and before.amount == 2


def test_ogg_op_type_mapping(spark):
    rows = [
        json.dumps({"after": {"id": 1, "name": "a", "amount": 1},
                    "op_type": "I", "current_ts": "t1"}),
        json.dumps({"before": {"id": 1, "name": "a", "amount": 1},
                    "after": {"id": 1, "name": "a", "amount": 2},
                    "op_type": "U", "current_ts": "t2"}),
        json.dumps({"before": {"id": 1, "name": "a", "amount": 2},
                    "op_type": "D", "current_ts": "t3"}),
    ]
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    ch = ogg_to_changelog(df, PAYLOAD)
    got = {(r.row_kind, r.amount) for r in ch.collect()}
    assert got == {("+I", 1), ("-U", 1), ("+U", 2), ("-D", 2)}


def test_canal_rejects_nested_payload_schema(spark):
    df = spark.createDataFrame([("{}",)], "value string")
    with pytest.raises(ValueError, match="flat scalar"):
        canal_to_changelog(df, "id bigint, tags array<string>")


def test_upsert_kafka_tombstone_contract(spark):
    from flink_spark.cdc import upsert_to_changelog

    rows = [
        (json.dumps({"id": 1}), json.dumps({"name": "a", "amount": 10})),
        (json.dumps({"id": 1}), json.dumps({"name": "a2", "amount": 11})),
        (json.dumps({"id": 2}), json.dumps({"name": "b", "amount": 20})),
        (json.dumps({"id": 2}), None),  # tombstone deletes key 2
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    ch = upsert_to_changelog(
        df, "id bigint", "name string, amount bigint"
    )
    got = {(r.row_kind, r.id, r.name) for r in ch.collect()}
    assert got == {
        ("+U", 1, "a"), ("+U", 1, "a2"), ("+U", 2, "b"), ("-D", 2, None),
    }

def test_canal_parameterized_decimal_payload(spark):
    """ADVICE r5: 'amount decimal(10,2)' is a valid flat scalar in the
    reference's canal path — the field split must be paren-aware."""
    rows = [
        json.dumps({"data": [{"id": 1, "amount": "10.50"}],
                    "old": None, "type": "INSERT", "ts": 1}),
        json.dumps({"data": [{"id": 1, "amount": "11.25"}],
                    "old": [{"amount": "10.50"}], "type": "UPDATE", "ts": 2}),
    ]
    df = spark.createDataFrame([(v,) for v in rows], "value string")
    ch = canal_to_changelog(df, "id bigint, amount decimal(10,2)")
    got = {(r.row_kind, r.id, str(r.amount)) for r in ch.collect()}
    assert got == {
        ("+I", 1, "10.50"),
        ("-U", 1, "10.50"), ("+U", 1, "11.25"),
    }
