"""Table catalog over the driver-generated parquet test data.

Reference analogue: Flink's GenericInMemoryCatalog
(flink-table/flink-table-api-java/.../catalog/GenericInMemoryCatalog.java:50)
— here the catalog is simply parquet directories registered as temp
views so both the DataFrame DSL and spark.sql() can reach them.
Scans are plain `spark.read.parquet`, so Catalyst gets predicate
pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy loader/register for the test-data tables at one scale factor."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        if name not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            if name == "events":
                # ts is TIMESTAMP(NANOS) on disk, surfaced as long nanos via
                # spark.sql.legacy.parquet.nanosAsLong; truncate to micros
                # (integer div — double math would lose precision at 1e18).
                from pyspark.sql import functions as F

                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            self._cache[name] = df
        return self._cache[name]

    def register_all(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
