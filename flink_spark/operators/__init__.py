from flink_spark.operators import joins, tvf_windows, windows

__all__ = ["joins", "tvf_windows", "windows"]
