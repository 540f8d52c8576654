from flink_spark.streaming import (
    cep_stream,
    core,
    process,
    retract_join,
    stateful,
    triggers,
)

__all__ = [
    "cep_stream",
    "core",
    "process",
    "retract_join",
    "stateful",
    "triggers",
]
