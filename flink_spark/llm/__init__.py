from flink_spark.llm import dedup, sampling, similarity, text

__all__ = ["dedup", "sampling", "similarity", "text"]
