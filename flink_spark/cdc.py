"""CDC front-end: Debezium-envelope JSON → row_kind changelog rows.

Reference: flink-formats/flink-json/src/main/java/org/apache/flink/
formats/json/debezium/DebeziumJsonDeserializationSchema.java:140-174 —
the op → RowKind mapping that feeds ChangelogNormalize
(StreamExecChangelogNormalize.java:74):

    op 'c' (create) / 'r' (snapshot read) → +I from ``after``
    op 'u' (update)                       → -U from ``before``, +U from ``after``
    op 'd' (delete)                       → -D from ``before``

The emitted frame carries the repo's changelog convention
(flink_spark/changelog.py): payload columns + ``row_kind`` — ready for
``changelog_normalize`` / ``retracting_sum`` / ``apply_upserts`` or the
retract join.

Spark-first shape: one ``from_json`` + a CASE'd array-of-structs +
``explode`` — entirely JVM-side whole-stage codegen, identical plan on
batch and streaming inputs (the parse is stateless, so the same
function serves file replays, Kafka value columns, and bounded tests).
At 100 TB the parse is map-only: no shuffle until the downstream
changelog consumer keys by its own columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def debezium_envelope_schema(payload_schema: str) -> str:
    """DDL schema string for a Debezium envelope over ``payload_schema``
    (itself a DDL struct body, e.g. ``"id bigint, name string"``)."""
    return (
        f"before struct<{payload_schema}>, "
        f"after struct<{payload_schema}>, "
        "op string, ts_ms bigint"
    )


def debezium_to_changelog(
    df: DataFrame,
    payload_schema: str,
    value_col: str = "value",
    keep_ts: bool = True,
) -> DataFrame:
    """Parse a Debezium-JSON string column into changelog rows.

    Output columns: the payload fields, ``row_kind``, and (if
    ``keep_ts``) ``ts_ms`` from the envelope — the ordering column a
    downstream ``changelog_normalize`` needs. Unknown/missing op values
    and unparseable JSON rows are dropped (Debezium's
    ``ignore-parse-errors`` behavior; strict mode would be a filter on
    ``op IS NULL`` before this).
    """
    env = F.from_json(F.col(value_col), debezium_envelope_schema(payload_schema))
    d = df.withColumn("__env", env)
    op = F.col("__env.op")
    kind_payloads = (
        F.when(
            op == "u",
            F.array(
                F.struct(
                    F.lit("-U").alias("row_kind"),
                    F.col("__env.before").alias("payload"),
                ),
                F.struct(
                    F.lit("+U").alias("row_kind"),
                    F.col("__env.after").alias("payload"),
                ),
            ),
        )
        .when(
            op == "d",
            F.array(
                F.struct(
                    F.lit("-D").alias("row_kind"),
                    F.col("__env.before").alias("payload"),
                )
            ),
        )
        .when(
            op.isin("c", "r"),
            F.array(
                F.struct(
                    F.lit("+I").alias("row_kind"),
                    F.col("__env.after").alias("payload"),
                )
            ),
        )
    )
    out = (
        d.withColumn("__kp", F.explode(kind_payloads))
        .select(
            "__kp.payload.*",
            F.col("__kp.row_kind").alias("row_kind"),
            *([F.col("__env.ts_ms").alias("ts_ms")] if keep_ts else []),
        )
    )
    return out
