"""§2.1 sources/sinks: format roundtrips, inline sources, streaming
file monitoring, and the exactly-once two-phase-commit file sink."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_spark import sinks, sources

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("name", StringType()),
        StructField("amount", LongType()),
    ]
)
ROWS = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)]


def test_from_elements_and_collection(spark):
    df = sources.from_elements(spark, ROWS, SCHEMA)
    assert df.count() == 4
    assert sources.from_collection(spark, ROWS, SCHEMA).schema == SCHEMA


def test_from_sequence_inclusive(spark):
    df = sources.from_sequence(spark, 1, 100)
    got = df.agg(F.min("id"), F.max("id"), F.count("*")).first()
    assert tuple(got) == (1, 100, 100)


def test_datagen_deterministic_distributed(spark):
    df = sources.datagen(
        spark,
        1000,
        {
            "user": "concat('u', cast(id % 7 as string))",
            "amount": "(id * 31) % 100",
        },
        num_partitions=8,
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.where("user = 'u3'").count() == 143  # ids 3,10,...,997


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_file_roundtrip(spark, tmp_path, fmt):
    src = sources.from_elements(spark, ROWS, SCHEMA)
    path = str(tmp_path / fmt)
    opts = {"header": "true"} if fmt == "csv" else {}
    sinks.write_file(src, path, fmt=fmt, **opts)
    back = sources.read_file(spark, path, fmt=fmt, schema=SCHEMA, **opts)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_text_roundtrip(spark, tmp_path):
    src = sources.from_elements(spark, ROWS, SCHEMA)
    path = str(tmp_path / "text")
    sinks.write_as_text(src, path)
    back = sources.read_text_file(spark, path)
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect())[0] == "1,a,10"


def test_write_as_csv_partitioned_layout(spark, tmp_path):
    src = sources.from_elements(spark, ROWS, SCHEMA)
    path = str(tmp_path / "bucketed")
    sinks.write_file(src, path, fmt="parquet", partition_by=["k"])
    assert os.path.isdir(os.path.join(path, "k=1"))
    # partition pruning: reading one bucket touches one directory
    one = sources.read_file(spark, path, fmt="parquet").where("k = 2")
    assert one.count() == 1


def test_file_stream_directory_monitoring(spark, tmp_path):
    """FileSource streaming mode: rows dropped into the dir are
    discovered by the next micro-batch (availableNow drains all)."""
    data_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    src = sources.from_elements(spark, ROWS, SCHEMA)
    src.write.parquet(data_dir)
    stream = sources.file_stream(
        spark, data_dir, "parquet", SCHEMA, max_files_per_trigger=2
    )
    assert stream.isStreaming
    seen: list[int] = []
    q = sinks.foreach_batch_sink(
        stream,
        lambda bdf, bid: seen.append(bdf.count()),
        checkpoint_dir=ckpt,
        output_mode="append",
        available_now=True,
    )
    q.awaitTermination(120)
    assert sum(seen) == 4


def test_rate_stream_is_streaming(spark):
    df = sources.rate_stream(spark, rows_per_second=5)
    assert df.isStreaming and set(df.columns) == {"timestamp", "value"}


def test_socket_kafka_jdbc_construct_only(spark):
    """No broker/db in the container: the wrappers must still build the
    right unresolved plan (option mapping is the product surface)."""
    sock = sources.socket_text_stream(spark, "localhost", 19999)
    assert sock.isStreaming and sock.columns == ["value"]
    # kafka/jdbc readers validate connectivity at load(); construct the
    # reader path only when the connector jar is absent.
    with pytest.raises(Exception):
        sources.jdbc_source(spark, "jdbc:invalid://nope", "t").collect()


def test_kafka_record_normalization_broker_less(spark):
    """Kafka contract without a broker: a static DataFrame with the exact
    Kafka wire schema (key/value BINARY + topic/partition/offset/timestamp)
    goes through the same record deserialization kafka_stream applies —
    the valueOnly(StringDeserializer) path of the reference's
    KafkaRecordDeserializationSchema."""
    from pyspark.sql.types import BinaryType, TimestampType

    wire = StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
            StructField("timestampType", IntegerType()),
        ]
    )
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (b"k1", b'{"v": 1}', "orders", 0, 0, ts, 0),
        (None, b"plain text", "orders", 1, 7, ts, 0),
    ]
    raw = spark.createDataFrame(rows, wire)
    out = sources.normalize_kafka_records(raw).collect()
    assert [(r.key, r.value) for r in out] == [
        ("k1", '{"v": 1}'), (None, "plain text")
    ]
    # offsets/partitions ride through untouched (offset bookkeeping is
    # the checkpoint's job, matching OffsetsInitializer semantics)
    assert [(r.partition, r.offset) for r in out] == [(0, 0), (1, 7)]


def test_socket_round_trip_ingestion(spark, tmp_path):
    """Unbounded-ingestion ITCase without a broker: a real TCP server
    feeds lines to the socket source; the stream lands in a memory sink.
    This is the docker-less stand-in for the Kafka ingestion path (same
    unbounded source API surface, different transport)."""
    import socket as pysocket
    import threading
    import time as pytime

    lines = ["alpha", "beta", "gamma"]
    server = pysocket.socket(pysocket.AF_INET, pysocket.SOCK_STREAM)
    server.setsockopt(pysocket.SOL_SOCKET, pysocket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            pytime.sleep(8)  # keep the socket open while batches drain

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    df = sources.socket_text_stream(spark, "127.0.0.1", port)
    q = (
        df.writeStream.format("memory")
        .queryName("socket_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        got: set[str] = set()
        deadline = pytime.time() + 30
        while pytime.time() < deadline and got != set(lines):
            q.processAllAvailable()
            got = {
                r.value
                for r in spark.sql("SELECT value FROM socket_rt").collect()
            }
        assert got == set(lines)
    finally:
        q.stop()
        server.close()


def test_exactly_once_file_sink_replay_dedup(spark, tmp_path):
    """Two-phase commit: re-delivering the same batch id must not
    duplicate output (Sink V2 / GlobalCommitter contract)."""
    data_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sources.from_elements(spark, ROWS, SCHEMA).write.parquet(data_dir)

    stream = sources.file_stream(spark, data_dir, "parquet", SCHEMA)
    q = sinks.exactly_once_file_sink(
        stream, out_dir, checkpoint_dir=ckpt, available_now=True
    )
    q.awaitTermination(120)
    committed = sources.read_file(
        spark, os.path.join(out_dir, "batch_id=0"), fmt="parquet"
    )
    assert committed.count() == 4

    # simulate failure replay of batch 0: the ledger marker short-circuits
    before = committed.collect()
    stream2 = sources.file_stream(spark, data_dir, "parquet", SCHEMA)
    q2 = sinks.exactly_once_file_sink(
        stream2, out_dir, checkpoint_dir=str(tmp_path / "ckpt2"), available_now=True
    )
    q2.awaitTermination(120)
    after = sources.read_file(
        spark, os.path.join(out_dir, "batch_id=0"), fmt="parquet"
    ).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))


# ---------------------------------------------------------------------------
# Avro format (flink_spark/formats.py) — gated on the spark-avro module
# ---------------------------------------------------------------------------


def test_avro_roundtrip_or_clear_error(spark, tmp_path):
    """With spark-avro present: a documents sample round-trips through
    avro read/write. Without it (this container): every avro entry point
    fails at construct time with actionable guidance, never a mid-job
    ClassNotFoundException."""
    import pytest as _pytest

    from flink_spark import formats
    from flink_spark.catalog import Catalog
    from tests.conftest import SF_DIR

    sample = Catalog(spark, SF_DIR).documents.limit(50)
    path = str(tmp_path / "docs_avro")
    if formats.avro_available(spark):
        formats.write_avro(sample, path)
        back = formats.read_avro(spark, path)
        assert back.count() == 50
        assert set(back.columns) == set(sample.columns)
    else:
        with _pytest.raises(RuntimeError, match="spark-avro"):
            formats.write_avro(sample, path)
        with _pytest.raises(RuntimeError, match="spark-avro"):
            formats.read_avro(spark, path)
        from flink_spark.sources import read_file

        with _pytest.raises(RuntimeError, match="spark-avro"):
            read_file(spark, path, fmt="avro")


def test_protobuf_roundtrip_or_clear_error(spark):
    """Same gating policy as Avro: with spark-protobuf present the
    from/to_protobuf helpers return usable columns; without it (this
    container) every entry point fails at construct time with actionable
    guidance (flink-formats/flink-protobuf analogue)."""
    import pytest as _pytest

    from pyspark.sql import functions as F
    from flink_spark import formats

    df = spark.range(3).select(F.struct("id").alias("s"))
    if formats.protobuf_available(spark):
        col = formats.to_protobuf(F.col("s"), "M", spark)
        assert df.select(col).schema is not None
    else:
        with _pytest.raises(RuntimeError, match="spark-protobuf"):
            formats.to_protobuf(F.col("s"), "M", spark)
        with _pytest.raises(RuntimeError, match="spark-protobuf"):
            formats.from_protobuf(F.col("s"), "M", spark)
