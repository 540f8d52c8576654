from flink_spark.streaming import core, process, retract_join, stateful, triggers

__all__ = ["core", "process", "retract_join", "stateful", "triggers"]
