from flink_spark.streaming import core, stateful

__all__ = ["core", "stateful"]
