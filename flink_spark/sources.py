"""Sources: the §2.1 surface of SURVEY.md re-expressed on Spark readers.

Reference analogues (all paths under /root/reference):
- FLIP-27 unified Source (flink-core/src/main/java/org/apache/flink/api/
  connector/source/Source.java) → Spark DataSource V2: ``spark.read`` /
  ``spark.readStream`` — the split-enumeration, bounded/unbounded duality
  is built into Spark's file index + micro-batch planner, so these
  helpers only normalize options and schemas.
- Inline sources fromElements:1142 / fromCollection:1210 /
  fromSequence:1115 / readTextFile:1379 / socketTextStream:1671 in
  flink-streaming-java/.../environment/StreamExecutionEnvironment.java.
- FileSource with streaming directory monitoring
  (flink-connectors/flink-connector-files/.../file/src/FileSource.java)
  → ``readStream.format(fmt).load(dir)`` (new-file discovery per
  micro-batch; ``maxFilesPerTrigger`` is the discovery throttle).
- DataGeneratorSource (flink-connectors/flink-connector-datagen) →
  ``format("rate")`` for unbounded, ``spark.range`` + column exprs for
  bounded deterministic data.
- KafkaSource (flink-connectors/flink-connector-kafka/.../KafkaSource.java)
  and JDBC (flink-connectors/flink-connector-jdbc) → thin option-mapping
  wrappers over Spark's built-in connectors.

Scale note: file sources keep Catalyst's pushdown/pruning because they
are plain format readers — no RDD detour; a 100 TB directory scans with
partition pruning + ``spark.sql.files.maxPartitionBytes`` splitting.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_FORMATS = ("parquet", "orc", "csv", "json", "text", "avro")


# ---------------------------------------------------------------------------
# Inline / bounded sources
# ---------------------------------------------------------------------------

def from_elements(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """StreamExecutionEnvironment.fromElements:1142 → createDataFrame."""
    return spark.createDataFrame(list(rows), schema=schema)


def from_collection(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """fromCollection:1210 — same construction path as from_elements."""
    return from_elements(spark, rows, schema)


def from_sequence(spark: SparkSession, start: int, end: int) -> DataFrame:
    """fromSequence:1115 (inclusive bounds) → spark.range (exclusive end).

    Emitted column is named ``id`` like Flink's NumberSequenceSource
    element; parallelism comes from range splitting (distributed, no
    driver materialization).
    """
    return spark.range(start, end + 1).select(F.col("id"))


def datagen(
    spark: SparkSession,
    n_rows: int,
    fields: dict[str, str],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounded DataGeneratorSource: ``fields`` maps name → SQL expression
    over the driver column ``id`` (e.g. ``{"user": "concat('u', id % 10)"}``).

    Deterministic (seedable via expressions), fully distributed — the
    generator is `spark.range`, so 10^12 rows never touch the driver.
    """
    rng = spark.range(0, n_rows, numPartitions=num_partitions)
    cols = [F.expr(expr).alias(name) for name, expr in fields.items()]
    return rng.select(*cols)


# ---------------------------------------------------------------------------
# File sources (batch + streaming directory monitoring)
# ---------------------------------------------------------------------------

def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """FileSource bounded mode → ``spark.read``. CSV defaults to
    header+inferSchema off (explicit schema preferred — inference scans
    the data twice, unacceptable at 100 TB)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {BATCH_FORMATS}")
    if fmt == "avro":
        # external data source module — fail with guidance, not a
        # mid-job ClassNotFoundException (flink_spark/formats.py)
        from flink_spark.formats import _require_avro

        _require_avro(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def read_text_file(spark: SparkSession, path: str) -> DataFrame:
    """readTextFile:1379 → one ``value`` string column per line."""
    return spark.read.text(path)


def file_stream(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema,
    *,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """FileSource continuous directory monitoring → file-stream source.

    Flink's monitor discovers new files per checkpoint; Spark's discovers
    per micro-batch. Schema is mandatory for streaming reads (no
    inference on an unbounded source).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if options:
        reader = reader.options(**options)
    return reader.load(path)


# ---------------------------------------------------------------------------
# Unbounded sources
# ---------------------------------------------------------------------------

def rate_stream(
    spark: SparkSession, rows_per_second: int = 10, *, ramp_up: str | None = None
) -> DataFrame:
    """DataGeneratorSource unbounded → rate source (`timestamp`, `value`)."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if ramp_up is not None:
        reader = reader.option("rampUpTime", ramp_up)
    return reader.load()


def socket_text_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """socketTextStream:1671 → socket source (one `value` column).

    At-most-once like the reference's socket source — dev/testing only.
    """
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )


def normalize_kafka_records(df: DataFrame, *, value_as_string: bool = True) -> DataFrame:
    """The record-shape half of the Kafka source contract, split out so it
    is testable without a broker: given a DataFrame with the Kafka wire
    schema (key/value binary, topic, partition, offset, timestamp), apply
    the same deserialization the reference's KafkaRecordDeserializationSchema
    performs (valueOnly(StringDeserializer) being the common case —
    flink-connectors/flink-connector-kafka/.../KafkaRecordDeserializationSchema.java).

    The broker-less ITCase (tests/test_sources_sinks.py) drives this over a
    static DataFrame with the exact wire schema, standing in for the
    reference's KafkaTableITCase the way its own tests use a mock source.
    """
    if value_as_string:
        df = df.withColumn("value", F.col("value").cast("string")).withColumn(
            "key", F.col("key").cast("string")
        )
    return df


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | Sequence[str],
    *,
    starting_offsets: str = "earliest",
    value_as_string: bool = True,
    **options: str,
) -> DataFrame:
    """KafkaSource → Spark's kafka source. Offsets map 1:1
    (earliest/latest/JSON per-partition); Flink's OffsetsInitializer
    committed-offset mode becomes the checkpoint's own progress.

    Construct-only in this environment (no broker in the container);
    the record-normalization half is exercised broker-less via
    ``normalize_kafka_records``, and the unbounded-socket ingestion path
    via the socket round-trip ITCase.
    """
    topic_list = topics if isinstance(topics, str) else ",".join(topics)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic_list)
        .option("startingOffsets", starting_offsets)
    )
    if options:
        reader = reader.options(**options)
    return normalize_kafka_records(reader.load(), value_as_string=value_as_string)


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **properties: str,
) -> DataFrame:
    """JDBC connector (flink-connectors/flink-connector-jdbc) →
    ``spark.read.jdbc``. Always pass the partition-column bounds for big
    tables — without them the whole table reads through one connection.
    Construct-only in this environment (no database in the container).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(Spark would otherwise receive the string 'None' and fail "
                "connector-side with a confusing parse error)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()
