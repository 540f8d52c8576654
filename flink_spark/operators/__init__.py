from flink_spark.operators import (
    async_lookup,
    iterate,
    joins,
    partitioning,
    tvf_windows,
    windows,
)

__all__ = [
    "async_lookup",
    "iterate",
    "joins",
    "partitioning",
    "tvf_windows",
    "windows",
]
