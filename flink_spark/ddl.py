"""Flink-dialect DDL front-end: CREATE TABLE with computed columns and
WATERMARK clauses, routed into the Spark catalog.

Reference grammar: flink-table/flink-sql-parser/src/main/codegen/data/
Parser.tdd:53-57 (SqlCreateTable — column list, computed columns,
watermark spec, WITH options); semantics in
flink-table/flink-table-api-java/.../catalog/ResolvedSchema and
DefaultSchemaResolver (watermark column must be TIMESTAMP, computed
columns resolve against physical ones).

Spark mapping: physical columns → a read schema; computed columns →
projections applied at read (`F.expr`); `WATERMARK FOR ts AS ts -
INTERVAL 'n' UNIT` → `withWatermark("ts", "n unit")` on the streaming
read (batch reads ignore the watermark, exactly as Flink's batch mode
does); WITH options pick the source (`connector`/`path`/`format`).
The registered name is a temp view, so `sql_query`/`spark.sql` see it.

Scope (explicit errors beyond it): connector 'filesystem' (parquet/
csv/json, batch + streaming via `'scan.streaming' = 'true'`) and
'datagen' (rate source); PRIMARY KEY ... NOT ENFORCED is recorded and
ignored (Flink doesn't enforce it either); metadata columns, LIKE
clauses and PARTITIONED BY raise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPE_MAP = [
    (re.compile(r"^STRING$", re.I), "string"),
    (re.compile(r"^(VAR)?CHAR(\s*\(\s*\d+\s*\))?$", re.I), "string"),
    (re.compile(r"^BOOLEAN$", re.I), "boolean"),
    (re.compile(r"^(VAR)?BINARY(\s*\(\s*\d+\s*\))?$", re.I), "binary"),
    (re.compile(r"^BYTES$", re.I), "binary"),
    (re.compile(r"^TINYINT$", re.I), "tinyint"),
    (re.compile(r"^SMALLINT$", re.I), "smallint"),
    (re.compile(r"^(INT|INTEGER)$", re.I), "int"),
    (re.compile(r"^BIGINT$", re.I), "bigint"),
    (re.compile(r"^FLOAT$", re.I), "float"),
    (re.compile(r"^DOUBLE( PRECISION)?$", re.I), "double"),
    (re.compile(r"^DATE$", re.I), "date"),
    (re.compile(r"^TIMESTAMP(_LTZ)?(\s*\(\s*\d+\s*\))?$", re.I), "timestamp"),
]


def _lower_type(flink_type: str) -> str:
    """Flink LogicalType name → Spark SQL DDL type (SURVEY §1.2 table)."""
    t = flink_type.strip()
    m = re.match(r"^DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t, re.I)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.match(r"^ARRAY\s*<(.+)>$", t, re.I | re.S)
    if m:
        return f"array<{_lower_type(m.group(1))}>"
    m = re.match(r"^MAP\s*<(.+),(.+)>$", t, re.I | re.S)
    if m:
        return f"map<{_lower_type(m.group(1))},{_lower_type(m.group(2))}>"
    m = re.match(r"^ROW\s*<(.+)>$", t, re.I | re.S)
    if m:
        inner = ", ".join(
            f"{p.strip().split()[0]}: {_lower_type(' '.join(p.strip().split()[1:]))}"
            for p in _split_top_commas(m.group(1))
        )
        return f"struct<{inner}>"
    for rx, spark_t in _TYPE_MAP:
        if rx.match(t):
            return spark_t
    raise ValueError(f"unsupported Flink type in DDL: {flink_type!r}")


def _split_top_commas(s: str) -> list[str]:
    parts, depth, buf, in_str = [], 0, [], False
    for ch in s:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch in "(<[":
                depth += 1
            elif ch in ")>]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(buf).strip())
                buf = []
                continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


@dataclass
class TableSpec:
    name: str
    physical: list[tuple[str, str]]  # (col, spark_type)
    computed: list[tuple[str, str]]  # (col, spark_expr)
    watermark: tuple[str, str] | None  # (ts_col, delay "n unit")
    primary_key: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)

    @property
    def spark_schema(self) -> str:
        return ", ".join(f"{c} {t}" for c, t in self.physical)


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*$",
    re.I | re.S,
)
_WM_RE = re.compile(
    r"^WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*"
    r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?$",
    re.I,
)


def parse_create_table(sql: str) -> TableSpec:
    m = _CREATE_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "not a CREATE TABLE statement this front-end understands "
            "(expected: CREATE [TEMPORARY] TABLE name (cols...) WITH (...))"
        )
    name, cols_txt, with_txt = m.group(1), m.group(2), m.group(3)
    if re.search(r"\bLIKE\b", sql, re.I):
        raise NotImplementedError("CREATE TABLE ... LIKE is not supported")

    physical: list[tuple[str, str]] = []
    computed: list[tuple[str, str]] = []
    watermark = None
    pk: list[str] = []
    for entry in _split_top_commas(cols_txt):
        wm = _WM_RE.match(entry)
        if wm:
            if watermark is not None:
                raise ValueError("multiple WATERMARK clauses")
            watermark = (wm.group(1), f"{wm.group(2)} {wm.group(3).lower()}s")
            continue
        if re.match(r"^WATERMARK\b", entry, re.I):
            raise ValueError(
                f"unsupported WATERMARK spec {entry!r} — only "
                "'WATERMARK FOR ts AS ts - INTERVAL 'n' UNIT' is supported"
            )
        pkm = re.match(
            r"^(?:CONSTRAINT\s+\w+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)"
            r"(\s+NOT\s+ENFORCED)?$",
            entry,
            re.I,
        )
        if pkm:
            # recorded, not enforced — Flink's NOT ENFORCED contract
            pk = [c.strip() for c in pkm.group(1).split(",")]
            continue
        if re.search(r"\bMETADATA\b", entry, re.I):
            raise NotImplementedError(
                f"metadata column {entry!r}: connector metadata columns "
                "are not supported by this front-end"
            )
        cm = re.match(r"^(\w+)\s+AS\s+(.+)$", entry, re.I | re.S)
        if cm and not re.match(r"^\w+\s+(ARRAY|MAP|ROW)\b", entry, re.I):
            expr = cm.group(2).strip()
            # Flink PROCTIME() → evaluation-time timestamp
            expr = re.sub(r"\bPROCTIME\s*\(\s*\)", "current_timestamp()", expr, flags=re.I)
            computed.append((cm.group(1), expr))
            continue
        parts = entry.split(None, 1)
        if len(parts) != 2:
            raise ValueError(f"cannot parse column definition {entry!r}")
        col, type_txt = parts
        type_txt = re.sub(r"\s+NOT\s+NULL$", "", type_txt.strip(), flags=re.I)
        type_txt = re.sub(r"\s+COMMENT\s+'[^']*'$", "", type_txt, flags=re.I)
        physical.append((col, _lower_type(type_txt)))

    options = {}
    for pair in _split_top_commas(with_txt):
        pm = re.match(r"^'([^']+)'\s*=\s*'([^']*)'$", pair.strip())
        if not pm:
            raise ValueError(f"cannot parse WITH option {pair!r}")
        options[pm.group(1)] = pm.group(2)

    return TableSpec(name, physical, computed, watermark, pk, options)


# Specs registered through the DDL front-end, so INSERT INTO can route
# writes back to the table's connector (Flink's TableSink path).
_REGISTERED: dict[str, TableSpec] = {}


def register_table(spark: SparkSession, spec: TableSpec) -> DataFrame:
    """Materialize the spec as a temp view; returns the DataFrame."""
    connector = spec.options.get("connector")
    streaming = spec.options.get("scan.streaming", "false").lower() == "true"
    if connector == "filesystem":
        path = spec.options.get("path")
        fmt = spec.options.get("format", "parquet")
        if not path:
            raise ValueError("filesystem connector needs a 'path' option")
        if fmt not in ("parquet", "csv", "json"):
            raise ValueError(f"unsupported format {fmt!r} (parquet/csv/json)")
        # A sink table's path may not exist yet (INSERT INTO creates the
        # files); materialize an empty directory so the schema-provided
        # read resolves to an empty table instead of PATH_NOT_FOUND —
        # Flink's filesystem connector accepts empty/missing dirs too.
        jvm = spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(hp):
            fs.mkdirs(hp)
        fmt_opts = {
            k.split(".", 1)[1]: v
            for k, v in spec.options.items()
            if k.startswith(f"{fmt}.")
        }
        if streaming:
            reader = spark.readStream.schema(spec.spark_schema).options(**fmt_opts)
        else:
            reader = spark.read.schema(spec.spark_schema).options(**fmt_opts)
        df = getattr(reader, "parquet" if fmt == "parquet" else fmt)(path)
    elif connector == "datagen":
        rps = int(spec.options.get("rows-per-second", "10"))
        if streaming:
            df = spark.readStream.format("rate").option("rowsPerSecond", rps).load()
        else:
            df = spark.range(int(spec.options.get("number-of-rows", "1000")))
            df = df.select(
                F.current_timestamp().alias("timestamp"), F.col("id").alias("value")
            )
        # project the rate source's (timestamp, value) onto the declared
        # physical columns by position, casting to the declared types
        src = df.columns
        df = df.select(
            *[
                F.col(src[i % len(src)]).cast(t).alias(c)
                for i, (c, t) in enumerate(spec.physical)
            ]
        )
    else:
        raise ValueError(
            f"unsupported connector {connector!r} — this front-end handles "
            "'filesystem' and 'datagen' (Kafka/JDBC are constructed via "
            "flink_spark.sources, which needs live endpoints)"
        )

    for col, expr in spec.computed:
        df = df.withColumn(col, F.expr(expr))
    if spec.watermark and streaming:
        df = df.withWatermark(spec.watermark[0], spec.watermark[1])
    df.createOrReplaceTempView(spec.name)
    _REGISTERED[spec.name] = spec
    return df


_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(\w+)\s+AS\s+(.+)$",
    re.I | re.S,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+(?:TEMPORARY\s+)?(TABLE|VIEW)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$",
    re.I,
)


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(.+)$", re.I | re.S
)


def _insert_into(
    spark: SparkSession, name: str, mode_kw: str, query: str
) -> DataFrame:
    """INSERT INTO/OVERWRITE a DDL-registered filesystem table — Flink's
    TableSink path (executeSql("INSERT INTO ...") submits a write job).
    The SELECT runs through Spark SQL, columns are aligned to the
    declared physical schema by name (Flink validates the same), files
    land via the table's format at its path, and the temp view is
    re-registered so subsequent reads see the new files."""
    spec = _REGISTERED[name]
    if spec.options.get("connector") != "filesystem":
        raise ValueError(
            f"INSERT INTO {name}: only filesystem-connector tables accept "
            "writes in this front-end"
        )
    q = query.strip()
    # Flink supports an explicit column list: INSERT INTO t (c1, c2)
    # SELECT ... — unmentioned columns are padded with NULLs
    # (SqlValidatorImpl target-column expansion).
    explicit_cols: list[str] | None = None
    clm = re.match(r"^\(([^)]*)\)\s*(.+)$", q, re.S)
    if clm and all(
        re.fullmatch(r"\w+", c.strip()) for c in clm.group(1).split(",")
    ):
        explicit_cols = [c.strip() for c in clm.group(1).split(",")]
        declared = {c for c, _ in spec.physical}
        unknown = [c for c in explicit_cols if c not in declared]
        if unknown:
            raise ValueError(
                f"INSERT INTO {name} ({', '.join(explicit_cols)}): "
                f"column(s) {unknown} not in table schema"
            )
        q = clm.group(2).strip()
    if re.match(r"^VALUES\b", q, re.I):
        q = f"SELECT * FROM ({q})"
    out = spark.sql(q)
    cols = [c for c, _ in spec.physical]
    if explicit_cols is not None:
        if len(out.columns) != len(explicit_cols):
            raise ValueError(
                f"INSERT INTO {name} ({', '.join(explicit_cols)}): query "
                f"produces {len(out.columns)} columns, list names "
                f"{len(explicit_cols)}"
            )
        out = out.toDF(*explicit_cols)
        # pad unmentioned declared columns with typed NULLs (Flink's
        # partial-insert semantics)
        out = out.select(
            *[
                (F.col(c) if c in explicit_cols else F.lit(None)).alias(c)
                for c in cols
            ]
        )
    elif sorted(out.columns) == sorted(cols):
        out = out.select(*cols)  # align by name
    elif len(out.columns) == len(cols):
        out = out.toDF(*cols)  # positional, Flink's implicit mapping
    else:
        raise ValueError(
            f"INSERT INTO {name}: query produces {len(out.columns)} columns "
            f"({out.columns}), table declares {len(cols)} ({cols})"
        )
    out = out.select(
        *[F.col(c).cast(t) for c, t in spec.physical]
    )
    fmt = spec.options.get("format", "parquet")
    # Apply the table's declared format options on the WRITE side too —
    # a 'csv.sep'='|' table must produce pipe-delimited files, or the
    # re-registered view (which reads with sep='|') misparses every row.
    fmt_opts = {
        k.split(".", 1)[1]: v
        for k, v in spec.options.items()
        if k.startswith(f"{fmt}.")
    }
    mode = "overwrite" if mode_kw.upper() == "OVERWRITE" else "append"
    # Materialize once: count on the cached plan, then write the same
    # materialization — a nondeterministic SELECT (rand(), proctime) or
    # self-referencing append would otherwise disagree between the write
    # and a post-write recount, and the recount doubles the cost.
    out = out.cache()
    try:
        n = out.count()
        out.write.mode(mode).format(fmt).options(**fmt_opts).save(
            spec.options["path"]
        )
    finally:
        out.unpersist()
    register_table(spark, spec)  # refresh the view over the new files
    return spark.createDataFrame([(n,)], "rows_inserted bigint")


def execute_ddl(spark: SparkSession, sql: str) -> DataFrame | None:
    """Route a Flink DDL statement; None if ``sql`` isn't DDL (caller
    should fall through to spark.sql)."""
    stripped = sql.strip()
    if _CREATE_RE.match(stripped.rstrip(";")):
        register_table(spark, parse_create_table(stripped))
        return spark.createDataFrame([("OK",)], "result string")
    vm = _VIEW_RE.match(stripped.rstrip(";"))
    if vm:
        spark.sql(vm.group(2)).createOrReplaceTempView(vm.group(1))
        return spark.createDataFrame([("OK",)], "result string")
    dm = _DROP_RE.match(stripped)
    if dm:
        spark.catalog.dropTempView(dm.group(2))
        _REGISTERED.pop(dm.group(2), None)
        return spark.createDataFrame([("OK",)], "result string")
    im = _INSERT_RE.match(stripped.rstrip(";"))
    if im and im.group(2) in _REGISTERED:
        return _insert_into(spark, im.group(2), im.group(1), im.group(3))
    if re.match(r"^\s*CREATE\s", stripped, re.I):
        raise ValueError(
            f"unrecognized CREATE statement for the Flink-DDL front-end: "
            f"{stripped[:80]!r}..."
        )
    return None
