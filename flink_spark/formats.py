"""Format helpers beyond the always-available parquet/orc/csv/json/text.

Reference analogues:
- Avro: AvroFormatFactory.java:50 (flink-formats/flink-avro) — file
  format + record de/serialization schema.
- Protobuf: flink-formats/flink-protobuf — Spark's `from_protobuf`/
  `to_protobuf` (pyspark.sql.protobuf), requiring the descriptor file.

Spark ships Avro as an *external* data source module (`spark-avro`):
the Python wrappers (`pyspark.sql.avro.functions`) are always present,
but the JVM side needs the `org.apache.spark:spark-avro` jar on the
session classpath. This container has the avro core jars but not the
data source module, so everything here is gated behind a runtime
availability probe — construct-time clarity instead of an opaque
`ClassNotFoundException` mid-job, same policy as the Kafka/JDBC
construct-only connectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source module is registered.

    Probes Spark's own DataSource lookup (not Class.forName — catalyst
    ships some avro *classes* even when the data source module that
    registers the 'avro' provider is absent)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro data source module is not on the classpath; add "
            "org.apache.spark:spark-avro_2.13:<spark-version> via "
            "spark.jars.packages (AvroFormatFactory.java:50 analogue is "
            "an optional module in Spark too)"
        )


def read_avro(
    spark: SparkSession, path: str, schema=None, **options: str
) -> DataFrame:
    """FileSource+AvroFormat bounded read → spark.read.format('avro')."""
    _require_avro(spark)
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def write_avro(
    df: DataFrame, path: str, mode: str = "error", **options: str
) -> None:
    """FileSink+AvroFormat → df.write.format('avro')."""
    _require_avro(df.sparkSession)
    writer = df.write.format("avro").mode(mode)
    if options:
        writer = writer.options(**options)
    writer.save(path)


def from_avro(col: Column, json_schema: str, spark: SparkSession) -> Column:
    """AvroRowDataDeserializationSchema analogue: binary column → struct.

    `json_schema` is the Avro schema JSON (the same writer-schema string
    the reference's factory consumes)."""
    _require_avro(spark)
    from pyspark.sql.avro.functions import from_avro as _fa

    return _fa(col, json_schema)


def to_avro(col: Column, spark: SparkSession) -> Column:
    """AvroRowDataSerializationSchema analogue: struct → binary column."""
    _require_avro(spark)
    from pyspark.sql.avro.functions import to_avro as _ta

    return _ta(col)


# ---------------------------------------------------------------------------
# Protobuf (flink-formats/flink-protobuf → pyspark.sql.protobuf)
# ---------------------------------------------------------------------------


def protobuf_available(spark: SparkSession) -> bool:
    """True when the spark-protobuf module is on the session classpath.

    Same probe policy as Avro: Spark ships protobuf as an external
    module (`org.apache.spark:spark-protobuf`); the Python wrappers
    always import, the JVM side may be absent."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


def _require_protobuf(spark: SparkSession) -> None:
    if not protobuf_available(spark):
        raise RuntimeError(
            "spark-protobuf module is not on the classpath; add "
            "org.apache.spark:spark-protobuf_2.13:<spark-version> via "
            "spark.jars.packages (flink-formats/flink-protobuf is an "
            "optional module in the reference too)"
        )


def from_protobuf(
    col: Column,
    message_name: str,
    spark: SparkSession,
    desc_file_path: str | None = None,
    options: dict | None = None,
) -> Column:
    """PbRowDataDeserializationSchema analogue: binary column → struct.

    ``desc_file_path`` is the compiled FileDescriptorSet (protoc
    --descriptor_set_out), the same artifact the reference's
    `protobuf.descriptor-file` option consumes."""
    _require_protobuf(spark)
    from pyspark.sql.protobuf.functions import from_protobuf as _fp

    return _fp(col, message_name, desc_file_path, options)


def to_protobuf(
    col: Column,
    message_name: str,
    spark: SparkSession,
    desc_file_path: str | None = None,
    options: dict | None = None,
) -> Column:
    """PbRowDataSerializationSchema analogue: struct → binary column."""
    _require_protobuf(spark)
    from pyspark.sql.protobuf.functions import to_protobuf as _tp

    return _tp(col, message_name, desc_file_path, options)
