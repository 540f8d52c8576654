from flink_spark.llm import dedup, packing, sampling, similarity, text

__all__ = ["dedup", "packing", "sampling", "similarity", "text"]
