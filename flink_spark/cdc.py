"""CDC front-ends: changelog-envelope JSON → row_kind changelog rows.

The reference ships four first-class CDC JSON formats under
flink-formats/flink-json/src/main/java/org/apache/flink/formats/json/:

- debezium/DebeziumJsonDeserializationSchema.java:140-174 —
  the op → RowKind mapping that feeds ChangelogNormalize
  (StreamExecChangelogNormalize.java:74):

    op 'c' (create) / 'r' (snapshot read) → +I from ``after``
    op 'u' (update)                       → -U from ``before``, +U from ``after``
    op 'd' (delete)                       → -D from ``before``

- canal/CanalJsonDeserializationSchema.java:128-166 — batched
  envelope: ``data`` is an ARRAY of rows, ``old`` a parallel array of
  PARTIAL rows holding only the changed fields of each update; the
  update-before row is ``data[i]`` overlaid with ``old[i]``'s fields.
- maxwell/MaxwellJsonDeserializationSchema.java:124-155 — single-row
  envelope with the same partial-``old`` overlay convention.
- ogg/OggJsonDeserializationSchema.java — before/after envelope like
  Debezium with op_type I/U/D.

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


def _ddl_fields(payload_schema: str) -> list[tuple[str, str]]:
    """Split a FLAT DDL struct body into (name, type) pairs. The
    partial-``old`` overlay needs per-field casts from the stringly
    JSON map, which is only well-defined for flat scalar schemas —
    nested types raise rather than silently miscast (the reference's
    canal/maxwell paths carry the same per-field copy loop over
    physical row fields, CanalJsonDeserializationSchema.java:152)."""
    if "<" in payload_schema:
        raise ValueError(
            "canal/maxwell partial-old overlay supports flat scalar "
            f"payload schemas only, got: {payload_schema!r}"
        )
    # split on commas at paren depth 0 so parameterized scalars like
    # ``amount decimal(10,2)`` — valid in the reference's canal/maxwell
    # paths — parse as one field instead of failing mid-unpack
    parts, depth, start = [], 0, 0
    for i, c in enumerate(payload_schema):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(payload_schema[start:i])
            start = i + 1
    parts.append(payload_schema[start:])
    out = []
    for part in parts:
        name, typ = part.strip().split(None, 1)
        out.append((name, typ))
    return out


def _overlay(fields, data_row, old_map):
    """The update-before row: ``data`` overlaid with the fields present
    in the partial ``old`` map (present key wins, even with a NULL
    value — JSON presence, not value, drives the overlay)."""
    return F.struct(
        *[
            F.when(
                old_map.isNotNull() & F.map_contains_key(old_map, f),
                F.element_at(old_map, f).cast(t),
            )
            .otherwise(data_row[f])
            .alias(f)
            for f, t in fields
        ]
    )


def canal_to_changelog(
    df: DataFrame,
    payload_schema: str,
    value_col: str = "value",
    keep_ts: bool = True,
) -> DataFrame:
    """Parse Canal-JSON (`type` INSERT/UPDATE/DELETE, batched ``data``
    array, parallel partial ``old`` array) into changelog rows —
    CanalJsonDeserializationSchema.java:128-166.

    Output: payload fields + ``row_kind`` (+ ``ts``). The whole parse
    is one ``from_json`` + per-element higher-order transforms +
    ``explode`` — map-only JVM codegen, no shuffle.
    """
    fields = _ddl_fields(payload_schema)
    env = F.from_json(
        F.col(value_col),
        f"data array<struct<{payload_schema}>>, "
        "old array<map<string,string>>, type string, ts bigint",
    )
    d = df.withColumn("__env", env)
    typ = F.upper(F.col("__env.type"))
    data = F.col("__env.data")
    old = F.col("__env.old")

    def one(kind, row):
        return F.struct(F.lit(kind).alias("row_kind"), row.alias("payload"))

    kind_payloads = (
        F.when(
            typ == "INSERT",
            F.transform(data, lambda x: F.array(one("+I", x))),
        )
        .when(
            typ == "DELETE",
            F.transform(data, lambda x: F.array(one("-D", x))),
        )
        .when(
            typ == "UPDATE",
            F.transform(
                data,
                lambda x, i: F.array(
                    one("-U", _overlay(fields, x, F.element_at(old, i + 1))),
                    one("+U", x),
                ),
            ),
        )
    )
    out = d.withColumn("__kp", F.explode(F.flatten(kind_payloads))).select(
        "__kp.payload.*",
        F.col("__kp.row_kind").alias("row_kind"),
        *([F.col("__env.ts").alias("ts")] if keep_ts else []),
    )
    return out


def maxwell_to_changelog(
    df: DataFrame,
    payload_schema: str,
    value_col: str = "value",
    keep_ts: bool = True,
) -> DataFrame:
    """Parse Maxwell-JSON (`type` insert/update/delete, single ``data``
    row, partial ``old`` map) into changelog rows —
    MaxwellJsonDeserializationSchema.java:124-155."""
    fields = _ddl_fields(payload_schema)
    env = F.from_json(
        F.col(value_col),
        f"data struct<{payload_schema}>, "
        "old map<string,string>, type string, ts bigint",
    )
    d = df.withColumn("__env", env)
    typ = F.lower(F.col("__env.type"))
    data = F.col("__env.data")
    old = F.col("__env.old")

    def one(kind, row):
        return F.struct(F.lit(kind).alias("row_kind"), row.alias("payload"))

    kind_payloads = (
        F.when(typ == "insert", F.array(one("+I", data)))
        .when(typ == "delete", F.array(one("-D", data)))
        .when(
            typ == "update",
            F.array(one("-U", _overlay(fields, data, old)), one("+U", data)),
        )
    )
    return d.withColumn("__kp", F.explode(kind_payloads)).select(
        "__kp.payload.*",
        F.col("__kp.row_kind").alias("row_kind"),
        *([F.col("__env.ts").alias("ts")] if keep_ts else []),
    )


def ogg_to_changelog(
    df: DataFrame,
    payload_schema: str,
    value_col: str = "value",
    keep_ts: bool = True,
) -> DataFrame:
    """Parse OGG-JSON (GoldenGate: ``before``/``after`` + ``op_type``
    I/U/D) into changelog rows — OggJsonDeserializationSchema.java.
    Same envelope geometry as Debezium with different op spellings."""
    env = F.from_json(
        F.col(value_col),
        f"before struct<{payload_schema}>, after struct<{payload_schema}>, "
        "op_type string, current_ts string",
    )
    d = df.withColumn("__env", env)
    op = F.upper(F.col("__env.op_type"))

    def one(kind, which):
        return F.struct(
            F.lit(kind).alias("row_kind"),
            F.col(f"__env.{which}").alias("payload"),
        )

    kind_payloads = (
        F.when(op == "I", F.array(one("+I", "after")))
        .when(op == "D", F.array(one("-D", "before")))
        .when(op == "U", F.array(one("-U", "before"), one("+U", "after")))
    )
    return d.withColumn("__kp", F.explode(kind_payloads)).select(
        "__kp.payload.*",
        F.col("__kp.row_kind").alias("row_kind"),
        *([F.col("__env.current_ts").alias("current_ts")] if keep_ts else []),
    )


def upsert_to_changelog(
    df: DataFrame,
    key_schema: str,
    value_schema: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Upsert-stream ingestion — the upsert-kafka connector contract
    (flink-connectors/flink-connector-kafka .../table/
    UpsertKafkaDynamicTableFactory.java): every record upserts by key;
    a NULL value is a tombstone deleting the key.

    Emits ``+U`` rows carrying key+value fields and ``-D`` rows
    carrying the key fields with NULL value fields — exactly what
    Flink's upsert-kafka source hands ChangelogNormalize, and what
    this repo's ``changelog.apply_upserts`` consumes.
    """
    k = F.from_json(F.col(key_col), key_schema)
    v = F.from_json(F.col(value_col), value_schema)
    d = df.select(
        k.alias("__k"),
        v.alias("__v"),
        F.when(F.col(value_col).isNull(), F.lit("-D"))
        .otherwise(F.lit("+U"))
        .alias("row_kind"),
    )
    return d.select("__k.*", "__v.*", "row_kind")
