from flink_spark.functions import scalar

__all__ = ["scalar"]
