"""SparkSession factory tuned for this engine.

Defaults are chosen for correctness-vs-oracle (UTC session timezone,
ANSI off to match Flink's permissive casts) and for scale (AQE on,
shuffle partitions sized to cores locally; on a real cluster the
shuffle-partition count should be ~2-3x total cores and AQE coalesces
down). Reference analogue: Flink's ExecutionConfig / table config
(flink-table/flink-table-api-java/.../TableConfig.java).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    In local mode the shuffle-partition count defaults to the local
    parallelism — 200 partitions over 60k rows is pure scheduling
    overhead, while at 100 TB the AQE coalesce takes over and this
    setting only caps the initial plan.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Input-split sizing: the default 128m gives a sub-100 MB local
        # parquet file exactly ONE scan task, idling the other 31 cores
        # on every fact scan (measured: single-task 6M-row lineitem scans
        # dominated the sf1 bench). Locally we split small so scans
        # saturate local[32]; a real cluster reading 100 TB should keep
        # the 128m default (set SPARK_GRAFT_MAX_PARTITION_BYTES) — there
        # the file count, not the split size, provides parallelism.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # The events table stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Streaming state store: RocksDB-equivalent provider config left to
        # deployment; local tests use the default HDFS-backed store.
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
