from flink_spark.llm import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
