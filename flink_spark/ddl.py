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
ignored (Flink doesn't enforce it either); PARTITIONED BY (r7) maps to
hive-style partition directories — writes go through
``partitionBy(...)`` with dynamic partition overwrite, reads
partition-prune (PartitionFilters in the scan), and
``INSERT INTO t PARTITION (p='v') ...`` static specs fill the
partition columns from the spec.

r6 additions (VERDICT r5 missing #4):

- ``CREATE TABLE t (...) WITH (...) LIKE base [(like options)]`` —
  reference SqlCreateTableLike (Parser.tdd:53-57; merge semantics
  MergeTableLikeUtil). The base must be registered through this
  front-end; merge strategies supported: INCLUDING/EXCLUDING ALL,
  CONSTRAINTS, GENERATED, METADATA, OPTIONS, WATERMARKS with
  OVERWRITING for GENERATED/METADATA/OPTIONS/WATERMARKS. Flink's
  default — INCLUDING ALL OVERWRITING OPTIONS — applies when no like
  options are given.
- metadata columns ``col TYPE METADATA [FROM 'key'] [VIRTUAL]`` — for
  the filesystem connector they map onto Spark's hidden ``_metadata``
  file-source column (file.path/file.name/file.size/
  file.modification-time → _metadata.file_path/...), Flink's
  FileSystemTableSource readable metadata. Metadata columns are
  read-side projections and never participate in INSERT schemas (the
  reference requires VIRTUAL for non-persistable metadata; the
  filesystem keys are all read-only, so both spellings behave as
  VIRTUAL here).

r7 additions (VERDICT r6 #4):

- ``CREATE TABLE t WITH (options) AS <query>`` — reference
  SqlCreateTableAs (Parser.tdd:53-57): derive the schema from the
  query, create the table, and run the insert as ONE statement.
- ``ALTER TABLE t SET (...) | RESET (...) | ADD col/WATERMARK |
  MODIFY col/WATERMARK | DROP col(s) | RENAME TO t2`` — reference
  SqlAlterTable* (Parser.tdd:58-96). SET/RESET mutate the reader
  options (RESET may not remove 'connector', as in Flink); ADD extends
  the schema (existing files surface the new physical column as NULL)
  or attaches a watermark to a table without one; MODIFY re-types a
  physical column / re-defines a computed one / replaces the existing
  watermark; DROP removes columns (refusing while a surviving computed
  column references a dropped one, and refusing partition keys);
  RENAME re-points the registration.
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
    metadata: list[tuple[str, str, str]] = field(default_factory=list)
    # (col, spark_type, metadata_key) — key defaults to the column name
    partitioned: list[str] = field(default_factory=list)
    # PARTITIONED BY columns (must be physical; hive-style dirs on disk)

    @property
    def spark_schema(self) -> str:
        return ", ".join(f"{c} {t}" for c, t in self.physical)


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*$",
    re.I | re.S,
)
# head of CREATE TABLE name [(cols)] [WITH (opts)] — the LIKE tail is
# split off first by _split_top_level_like (a regex alone mis-scopes
# nested parens)
_CREATE_LIKE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(\w+)\s*(?:\((.*?)\)\s*)?(?:WITH\s*\((.*)\)\s*)?$",
    re.I | re.S,
)
_CREATE_LIKE_TAIL_RE = re.compile(
    r"^\s*(\w+)\s*(?:\(\s*([^)]*?)\s*\))?\s*$", re.S
)
_METADATA_COL_RE = re.compile(
    r"^(\w+)\s+(.+?)\s+METADATA(?:\s+FROM\s+'([^']+)')?(\s+VIRTUAL)?$",
    re.I | re.S,
)


def _split_top_level_kw(stmt: str, kw: str) -> tuple[str, str] | None:
    """(head, tail) around a depth-0, non-quoted keyword; None if the
    statement has no top-level occurrence."""
    depth, in_str = 0, False
    up, kw = stmt.upper(), kw.upper()
    n = len(kw)
    for i, ch in enumerate(stmt):
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and up[i : i + n] == kw
                and (i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_"))
                and (
                    i + n >= len(up)
                    or not (up[i + n].isalnum() or up[i + n] == "_")
                )
            ):
                return stmt[:i], stmt[i + n :]
    return None


def _split_top_level_like(stmt: str) -> tuple[str, str] | None:
    """(head, tail) around a depth-0, non-quoted LIKE keyword; None if
    the statement has no top-level LIKE."""
    return _split_top_level_kw(stmt, "LIKE")


def _split_partitioned_by(stmt: str) -> tuple[str, list[str]]:
    """Strip a top-level ``PARTITIONED BY (cols)`` clause (reference
    SqlCreateTable partition list, Parser.tdd:53-57; semantics
    FileSystemTableFactory — hive-style partition directories). Returns
    (statement with the clause removed, partition column names)."""
    split = _split_top_level_kw(stmt, "PARTITIONED")
    if split is None:
        return stmt, []
    head, tail = split
    m = re.match(r"^\s*BY\s*\(([^)]*)\)\s*(.*)$", tail, re.I | re.S)
    if not m:
        raise ValueError(f"cannot parse PARTITIONED BY clause: {tail[:60]!r}")
    cols = [c.strip() for c in m.group(1).split(",") if c.strip()]
    if not cols:
        raise ValueError("PARTITIONED BY needs at least one column")
    return head + " " + m.group(2), cols


_WM_RE = re.compile(
    r"^WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*"
    r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?$",
    re.I,
)


def parse_create_table(sql: str) -> TableSpec:
    stripped = sql.strip().rstrip(";")
    if re.match(r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\b", stripped, re.I):
        split = _split_top_level_like(stripped)
        if split is not None:
            return _parse_create_like(*split)
    stripped, part_cols = _split_partitioned_by(stripped)
    m = _CREATE_RE.match(stripped)
    if not m:
        raise ValueError(
            "not a CREATE TABLE statement this front-end understands "
            "(expected: CREATE [TEMPORARY] TABLE name (cols...) "
            "[PARTITIONED BY (...)] WITH (...) [LIKE base])"
        )
    name, cols_txt, with_txt = m.group(1), m.group(2), m.group(3)
    physical, computed, metadata, watermark, pk = _parse_columns(cols_txt)
    options = _parse_options(with_txt)
    phys_names = {c for c, _ in physical}
    bad = [c for c in part_cols if c not in phys_names]
    if bad:
        # Flink: partition keys must be physical columns of the table
        raise ValueError(f"PARTITIONED BY column(s) not physical: {bad}")
    return TableSpec(
        name, physical, computed, watermark, pk, options, metadata,
        part_cols,
    )


def _parse_columns(cols_txt: str):
    physical: list[tuple[str, str]] = []
    computed: list[tuple[str, str]] = []
    metadata: list[tuple[str, str, str]] = []
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
        mm = _METADATA_COL_RE.match(entry)
        if mm:
            col, type_txt, key = mm.group(1), mm.group(2), mm.group(3)
            metadata.append((col, _lower_type(type_txt), key or col))
            continue
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
    return physical, computed, metadata, watermark, pk


def _parse_options(with_txt: str) -> dict[str, str]:
    options: dict[str, str] = {}
    for pair in _split_top_commas(with_txt):
        pm = re.match(r"^'([^']+)'\s*=\s*'([^']*)'$", pair.strip())
        if not pm:
            raise ValueError(f"cannot parse WITH option {pair!r}")
        options[pm.group(1)] = pm.group(2)
    return options


# LIKE merge strategies (reference MergeTableLikeUtil.MergingStrategy):
# feature -> INCLUDING | EXCLUDING | OVERWRITING. Flink's default when
# no like options are given is INCLUDING ALL OVERWRITING OPTIONS.
_LIKE_FEATURES = (
    "CONSTRAINTS", "GENERATED", "METADATA", "OPTIONS", "WATERMARKS",
    "PARTITIONS",
)
_LIKE_OVERWRITABLE = ("GENERATED", "METADATA", "OPTIONS", "WATERMARKS")


def _parse_like_options(txt: str | None) -> dict[str, str]:
    strategies = dict.fromkeys(_LIKE_FEATURES, "INCLUDING")
    if txt is None or not txt.strip():
        strategies["OPTIONS"] = "OVERWRITING"  # Flink's documented default
        return strategies
    toks = [t.upper() for t in re.split(r"[\s,]+", txt.strip()) if t]
    if len(toks) % 2:
        raise ValueError(f"cannot parse LIKE options {txt!r}")
    for verb, feat in zip(toks[::2], toks[1::2]):
        if verb not in ("INCLUDING", "EXCLUDING", "OVERWRITING"):
            raise ValueError(f"unknown LIKE merge verb {verb!r}")
        if feat == "ALL":
            if verb == "OVERWRITING":
                raise ValueError("OVERWRITING ALL is not a valid LIKE option")
            for f in _LIKE_FEATURES:
                strategies[f] = verb
            continue
        if feat not in _LIKE_FEATURES:
            raise ValueError(f"unknown LIKE feature {feat!r}")
        if verb == "OVERWRITING" and feat not in _LIKE_OVERWRITABLE:
            raise ValueError(f"OVERWRITING {feat} is not a valid LIKE option")
        strategies[feat] = verb
    return strategies


def _merge_named(
    base: list, new: list, strategy: str, what: str
) -> list:
    """Merge name-keyed tuple lists per the LIKE strategy (first tuple
    element is the name)."""
    if strategy == "EXCLUDING":
        return list(new)
    out = list(base)
    names = {t[0] for t in out}
    for t in new:
        if t[0] in names:
            if strategy != "OVERWRITING":
                raise ValueError(
                    f"LIKE: {what} column {t[0]!r} already defined in the "
                    "base table (use OVERWRITING to replace it)"
                )
            out = [t if b[0] == t[0] else b for b in out]
        else:
            out.append(t)
    return out


def _parse_create_like(head: str, tail: str) -> TableSpec:
    hm = _CREATE_LIKE_HEAD_RE.match(head)
    tm = _CREATE_LIKE_TAIL_RE.match(tail)
    if not hm or not tm:
        raise ValueError(
            f"cannot parse CREATE TABLE ... LIKE statement "
            f"(head={head[:60]!r}, tail={tail[:60]!r})"
        )
    name, cols_txt, with_txt = hm.group(1), hm.group(2), hm.group(3)
    base_name, like_txt = tm.group(1), tm.group(2)
    base = _REGISTERED.get(base_name)
    if base is None:
        raise ValueError(
            f"CREATE TABLE {name} LIKE {base_name}: base table is not "
            "registered through this DDL front-end"
        )
    strat = _parse_like_options(like_txt)
    physical, computed, metadata, watermark, pk = _parse_columns(cols_txt or "")
    options = _parse_options(with_txt) if with_txt else {}

    # physical columns always merge; duplicating a base physical column
    # is an error in the reference too (MergeTableLikeUtil#mergeTables)
    dup = {c for c, _ in physical} & {c for c, _ in base.physical}
    if dup:
        raise ValueError(f"LIKE: physical column(s) {sorted(dup)} already "
                         f"defined in base table {base_name}")
    merged_physical = list(base.physical) + physical

    merged_computed = _merge_named(
        base.computed, computed, strat["GENERATED"], "computed")
    merged_metadata = _merge_named(
        base.metadata, metadata, strat["METADATA"], "metadata")

    if strat["WATERMARKS"] == "EXCLUDING":
        merged_wm = watermark
    elif watermark is not None and base.watermark is not None:
        if strat["WATERMARKS"] != "OVERWRITING":
            raise ValueError(
                "LIKE: both base and new table define a WATERMARK "
                "(use OVERWRITING WATERMARKS)")
        merged_wm = watermark
    else:
        merged_wm = watermark or base.watermark

    if strat["CONSTRAINTS"] == "EXCLUDING":
        merged_pk = pk
    else:
        merged_pk = pk or list(base.primary_key)

    if strat["OPTIONS"] == "EXCLUDING":
        merged_opts = options
    else:
        merged_opts = dict(base.options)
        for k, v in options.items():
            if k in merged_opts and merged_opts[k] != v and strat["OPTIONS"] != "OVERWRITING":
                raise ValueError(
                    f"LIKE: option {k!r} conflicts with the base table "
                    "(use OVERWRITING OPTIONS)")
            merged_opts[k] = v

    merged_parts = (
        [] if strat["PARTITIONS"] == "EXCLUDING" else list(base.partitioned)
    )

    return TableSpec(
        name, merged_physical, merged_computed, merged_wm, merged_pk,
        merged_opts, merged_metadata, merged_parts,
    )


# Specs registered through the DDL front-end, so INSERT INTO can route
# writes back to the table's connector (Flink's TableSink path).
_REGISTERED: dict[str, TableSpec] = {}


def register_table(spark: SparkSession, spec: TableSpec) -> DataFrame:
    """Materialize the spec as a temp view; returns the DataFrame."""
    connector = spec.options.get("connector")
    streaming = spec.options.get("scan.streaming", "false").lower() == "true"
    # validate metadata columns up front — a bad key must surface as the
    # metadata error, not as a downstream reader failure
    if spec.metadata:
        if connector != "filesystem":
            raise ValueError(
                "metadata columns are supported for the filesystem "
                f"connector only (table {spec.name} uses {connector!r})"
            )
        for _col, _typ, key in spec.metadata:
            if key not in _FS_METADATA:
                raise ValueError(
                    f"unknown filesystem metadata key {key!r} — supported: "
                    f"{sorted(_FS_METADATA)}"
                )
    if connector == "filesystem" and "__stats_table__" in spec.options and not streaming:
        # ANALYZE TABLE mirrored this table into the stats catalog —
        # read through the catalog table so the CBO sees its statistics
        # (sticky across re-registers; see _analyze_table)
        df = spark.table(spec.options["__stats_table__"])
    elif connector == "filesystem":
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

    for col, typ, key in spec.metadata:
        df = df.withColumn(col, F.col(f"_metadata.{_FS_METADATA[key]}").cast(typ))
    for col, expr in spec.computed:
        df = df.withColumn(col, F.expr(expr))
    if spec.watermark and streaming:
        df = df.withWatermark(spec.watermark[0], spec.watermark[1])
    df.createOrReplaceTempView(spec.name)
    _REGISTERED[spec.name] = spec
    return df


# Flink FileSystemTableSource readable metadata -> Spark's hidden
# _metadata file-source column (both engines surface the same four).
_FS_METADATA = {
    "file.path": "file_path",
    "file.name": "file_name",
    "file.size": "file_size",
    "file.modification-time": "file_modification_time",
}


# CREATE TABLE name WITH (options) AS <query> — reference
# SqlCreateTableAs (flink-table/flink-sql-parser/src/main/codegen/data/
# Parser.tdd:53-57 parses CREATE TABLE ... AS alongside LIKE; runtime
# semantics in flink-table/flink-table-operations: derive the schema
# from the query, create the sink table, submit the insert job as one
# statement). The WITH clause is required (the sink needs a connector),
# matching Flink, and must precede AS.
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
    r"(\w+)\s+WITH\s*\((.*?)\)\s*AS\s+(.+)$",
    re.I | re.S,
)


def _create_table_as(
    spark: SparkSession, name: str, opts_txt: str, query: str,
    if_not_exists: bool = False,
) -> DataFrame:
    """CTAS: run the query, derive the physical schema from its result,
    write the rows through the declared connector, register the table.
    One statement = create + insert, exactly Flink's CTAS contract.
    IF NOT EXISTS skips the write when the table is already registered;
    without the flag a re-create is an error (Flink's TableEnvironment
    createTable semantics) instead of a silent file overwrite."""
    if name in _REGISTERED:
        if if_not_exists:
            return spark.createDataFrame([("OK",)], "result string")
        raise ValueError(
            f"CREATE TABLE {name} AS: table already exists "
            "(use IF NOT EXISTS to skip, or DROP TABLE first)"
        )
    opts = _parse_options(opts_txt)
    if opts.get("connector") != "filesystem":
        raise ValueError(
            f"CREATE TABLE {name} AS: only the filesystem connector "
            "accepts CTAS writes in this front-end"
        )
    path = opts.get("path")
    if not path:
        raise ValueError("filesystem connector needs a 'path' option")
    q = query.strip().rstrip(";")
    if re.match(r"^VALUES\b", q, re.I):
        q = f"SELECT * FROM ({q})"
    out = spark.sql(q)
    spec = TableSpec(
        name, list(out.dtypes), [], None, [], opts, []
    )
    fmt = opts.get("format", "parquet")
    fmt_opts = {
        k.split(".", 1)[1]: v
        for k, v in opts.items()
        if k.startswith(f"{fmt}.")
    }
    # CREATE semantics: the table's content IS the query result — a
    # re-created table must not append onto stale files
    out.write.mode("overwrite").format(fmt).options(**fmt_opts).save(path)
    register_table(spark, spec)
    return spark.createDataFrame([("OK",)], "result string")


_ALTER_RE = re.compile(r"^\s*ALTER\s+TABLE\s+(\w+)\s+(.+?)\s*;?\s*$", re.I | re.S)


def _alter_table(spark: SparkSession, name: str, action: str) -> DataFrame:
    """ALTER TABLE on a DDL-registered table — reference SqlAlterTable*
    (Parser.tdd:58-96: SET/RESET options, ADD column, RENAME). The
    mutated spec is re-registered, so the change is visible to the next
    read: SET/RESET swap reader options, ADD extends the read schema
    (absent columns in existing files surface as NULL — parquet
    resolves by name, Flink's filesystem connector behaves the same),
    RENAME re-points the temp view."""
    spec = _REGISTERED.get(name)
    if spec is None:
        raise ValueError(
            f"ALTER TABLE {name}: table not registered through this "
            "DDL front-end"
        )
    m = _ADD_PK_RE.match(action)
    if m:
        # SqlAlterTableAdd constraint (Parser.tdd:39-41). Flink accepts
        # only NOT ENFORCED primary keys (no engine enforces them).
        if not m.group(2):
            raise ValueError(
                "ALTER TABLE ADD PRIMARY KEY requires NOT ENFORCED "
                "(Flink rejects enforced constraints)"
            )
        if spec.primary_key:
            raise ValueError(
                f"ALTER TABLE {name}: a primary key already exists "
                "(DROP PRIMARY KEY first)"
            )
        pk = [c.strip() for c in m.group(1).split(",")]
        declared = {c for c, _ in spec.physical}
        unknown = [c for c in pk if c not in declared]
        if unknown:
            raise ValueError(
                f"ALTER TABLE ADD PRIMARY KEY: unknown column(s) {unknown}"
            )
        spec = TableSpec(
            spec.name, list(spec.physical), list(spec.computed),
            spec.watermark, pk, dict(spec.options),
            list(spec.metadata), list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    if _DROP_PK_RE.match(action):
        if not spec.primary_key:
            raise ValueError(f"ALTER TABLE {name}: no primary key to drop")
        spec = TableSpec(
            spec.name, list(spec.physical), list(spec.computed),
            spec.watermark, [], dict(spec.options),
            list(spec.metadata), list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    m = _COMPACT_RE.match(action)
    if m:
        part: dict[str, str] | None = None
        if m.group(1):
            part = {}
            for pair in m.group(1).split(","):
                kv = re.match(r"^\s*(\w+)\s*=\s*'([^']*)'\s*$", pair)
                if not kv:
                    raise ValueError(
                        f"cannot parse PARTITION spec entry {pair.strip()!r}"
                    )
                part[kv.group(1)] = kv.group(2)
        return _compact_table(spark, name, part)
    m = re.match(r"^SET\s*\((.*)\)$", action, re.I | re.S)
    if m:
        new_opts = dict(spec.options)
        new_opts.update(_parse_options(m.group(1)))
        spec = TableSpec(
            spec.name, list(spec.physical), list(spec.computed),
            spec.watermark, list(spec.primary_key), new_opts,
            list(spec.metadata), list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    m = re.match(r"^RESET\s*\((.*)\)$", action, re.I | re.S)
    if m:
        keys = re.findall(r"'([^']+)'", m.group(1))
        if "connector" in keys:
            # Flink: ValidationException — a table cannot lose its connector
            raise ValueError("ALTER TABLE RESET cannot remove 'connector'")
        new_opts = {k: v for k, v in spec.options.items() if k not in keys}
        spec = TableSpec(
            spec.name, list(spec.physical), list(spec.computed),
            spec.watermark, list(spec.primary_key), new_opts,
            list(spec.metadata), list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    m = re.match(r"^ADD\s+(.+)$", action, re.I | re.S)
    if m:
        frag = m.group(1).strip()
        if frag.startswith("(") and frag.endswith(")"):
            frag = frag[1:-1]
        physical, computed, metadata, wm, pk = _parse_columns(frag)
        if pk:
            raise ValueError(
                "ALTER TABLE ADD supports columns and WATERMARK only "
                "(no primary key) in this front-end"
            )
        if wm and spec.watermark is not None:
            # Flink: ADD WATERMARK on a table that has one is an error —
            # MODIFY WATERMARK replaces it
            raise ValueError(
                f"ALTER TABLE ADD: {name} already has a watermark "
                "(use ALTER TABLE ... MODIFY WATERMARK ...)"
            )
        dup = {c for c, _ in physical} | {c for c, _ in computed} | {
            c for c, _, _ in metadata
        }
        existing = {c for c, _ in spec.physical} | {
            c for c, _ in spec.computed
        } | {c for c, _, _ in spec.metadata}
        clash = dup & existing
        if clash:
            raise ValueError(f"ALTER TABLE ADD: column(s) exist: {sorted(clash)}")
        spec = TableSpec(
            spec.name, list(spec.physical) + physical,
            list(spec.computed) + computed, wm or spec.watermark,
            list(spec.primary_key), dict(spec.options),
            list(spec.metadata) + metadata, list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    m = re.match(r"^MODIFY\s+(.+)$", action, re.I | re.S)
    if m:
        frag = m.group(1).strip()
        if frag.startswith("(") and frag.endswith(")"):
            frag = frag[1:-1]
        physical, computed, metadata, wm, pk = _parse_columns(frag)
        if pk or metadata:
            raise ValueError(
                "ALTER TABLE MODIFY supports physical/computed columns "
                "and WATERMARK only in this front-end"
            )
        if wm and spec.watermark is None:
            raise ValueError(
                f"ALTER TABLE MODIFY: {name} has no watermark to modify "
                "(use ALTER TABLE ... ADD WATERMARK ...)"
            )
        new_physical = list(spec.physical)
        new_computed = list(spec.computed)
        phys_idx = {c: i for i, (c, _) in enumerate(new_physical)}
        comp_idx = {c: i for i, (c, _) in enumerate(new_computed)}
        for c, t in physical:
            if c not in phys_idx:
                raise ValueError(
                    f"ALTER TABLE MODIFY: {c!r} is not a physical column"
                )
            new_physical[phys_idx[c]] = (c, t)
        for c, expr in computed:
            if c not in comp_idx:
                raise ValueError(
                    f"ALTER TABLE MODIFY: {c!r} is not a computed column"
                )
            new_computed[comp_idx[c]] = (c, expr)
        spec = TableSpec(
            spec.name, new_physical, new_computed, wm or spec.watermark,
            list(spec.primary_key), dict(spec.options),
            list(spec.metadata), list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    m = re.match(r"^DROP\s+(?:COLUMN\s+)?\(?\s*([\w\s,]+?)\s*\)?$", action, re.I)
    if m:
        cols = [c.strip() for c in m.group(1).split(",")]
        names = {c for c, _ in spec.physical} | {
            c for c, _ in spec.computed
        } | {c for c, _, _ in spec.metadata}
        missing = [c for c in cols if c not in names]
        if missing:
            raise ValueError(f"ALTER TABLE DROP: unknown column(s) {missing}")
        # a computed column may reference a dropped physical one — the
        # re-register would fail opaquely; check references up front
        drop = set(cols)
        for cc, expr in spec.computed:
            if cc not in drop and any(
                re.search(rf"\b{re.escape(c)}\b", expr) for c in drop
            ):
                raise ValueError(
                    f"ALTER TABLE DROP: computed column {cc!r} references "
                    "a dropped column; drop it first"
                )
        if all(c in drop for c, _ in spec.physical):
            raise ValueError("ALTER TABLE DROP: cannot drop every physical column")
        # Flink rejects dropping the watermark's rowtime column; without
        # this guard the spec keeps a dangling watermark, SHOW CREATE
        # TABLE emits non-roundtrippable DDL, and a streaming
        # re-register fails opaquely inside withWatermark.
        if spec.watermark and spec.watermark[0] in drop:
            raise ValueError(
                f"ALTER TABLE DROP: column {spec.watermark[0]!r} is the "
                "watermark rowtime column; drop the watermark first"
            )
        part_hit = drop & set(spec.partitioned)
        if part_hit:
            raise ValueError(
                f"ALTER TABLE DROP: {sorted(part_hit)} are partition keys"
            )
        spec = TableSpec(
            spec.name,
            [p for p in spec.physical if p[0] not in drop],
            [p for p in spec.computed if p[0] not in drop],
            spec.watermark,
            [k for k in spec.primary_key if k not in drop],
            dict(spec.options),
            [p for p in spec.metadata if p[0] not in drop],
            list(spec.partitioned),
        )
        register_table(spark, spec)
        return spark.createDataFrame([("OK",)], "result string")
    m = re.match(r"^RENAME\s+TO\s+(\w+)$", action, re.I)
    if m:
        new_name = m.group(1)
        if new_name in _REGISTERED:
            raise ValueError(f"ALTER TABLE RENAME: {new_name} already exists")
        spec = TableSpec(
            new_name, list(spec.physical), list(spec.computed),
            spec.watermark, list(spec.primary_key), dict(spec.options),
            list(spec.metadata), list(spec.partitioned),
        )
        # register the new name FIRST so a failed registration (e.g. the
        # backing path vanished) leaves the old table intact — rename is
        # atomic-or-noop, never lose-the-table
        register_table(spark, spec)
        spark.catalog.dropTempView(name)
        _REGISTERED.pop(name, None)
        return spark.createDataFrame([("OK",)], "result string")
    raise ValueError(
        f"unsupported ALTER TABLE action for this front-end: {action[:60]!r} "
        "(supported: SET (...), RESET (...), ADD/MODIFY/DROP col(s), "
        "ADD/DROP PRIMARY KEY, [PARTITION (...)] COMPACT, RENAME TO name)"
    )


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


def _build_insert(
    spark: SparkSession, name: str, query: str
) -> DataFrame:
    """Build the schema-aligned DataFrame an INSERT would write, without
    writing it (shared by _insert_into and EXPLAIN-over-INSERT)."""
    spec = _REGISTERED[name]
    if spec.options.get("connector") != "filesystem":
        raise ValueError(
            f"INSERT INTO {name}: only filesystem-connector tables accept "
            "writes in this front-end"
        )
    q = query.strip()
    # Static partition spec: INSERT INTO t PARTITION (p='v', ...) <query>
    # (reference SqlInsert partition clause; FileSystemTableSink static
    # partitions). The spec'd columns become literals appended to the
    # query output; the query must then produce the remaining columns.
    static_parts: dict[str, str] = {}
    pm = re.match(r"^PARTITION\s*\(([^)]*)\)\s*(.+)$", q, re.I | re.S)
    if pm:
        for pair in pm.group(1).split(","):
            kv = re.match(r"^\s*(\w+)\s*=\s*'([^']*)'\s*$", pair)
            if not kv:
                raise ValueError(
                    f"cannot parse PARTITION spec entry {pair.strip()!r} "
                    "(expected col='value')"
                )
            static_parts[kv.group(1)] = kv.group(2)
        bad = [c for c in static_parts if c not in spec.partitioned]
        if bad:
            raise ValueError(
                f"PARTITION spec column(s) {bad} are not partition keys "
                f"of {name} (declared: {spec.partitioned})"
            )
        q = pm.group(2).strip()
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
    # columns the query must supply (static partition values are filled
    # from the PARTITION spec, not the query — Flink's static-partition
    # insert contract)
    fill = [c for c in cols if c not in static_parts]
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
                for c in fill
            ]
        )
    elif sorted(out.columns) == sorted(fill):
        out = out.select(*fill)  # align by name
    elif len(out.columns) == len(fill):
        out = out.toDF(*fill)  # positional, Flink's implicit mapping
    else:
        raise ValueError(
            f"INSERT INTO {name}: query produces {len(out.columns)} columns "
            f"({out.columns}), table expects {len(fill)} ({fill})"
        )
    for c, v in static_parts.items():
        out = out.withColumn(c, F.lit(v))
    return out.select(
        *[F.col(c).cast(t) for c, t in spec.physical]
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
    out = _build_insert(spark, name, query)
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
        writer = out.write.mode(mode).format(fmt).options(**fmt_opts)
        if spec.partitioned:
            # hive-style partition directories; INSERT OVERWRITE replaces
            # only the partitions the query writes (dynamic overwrite —
            # Flink's filesystem sink overwrite-within-partition
            # semantics), never the whole table
            writer = writer.partitionBy(*spec.partitioned).option(
                "partitionOverwriteMode", "dynamic"
            )
        writer.save(spec.options["path"])
    finally:
        out.unpersist()
    register_table(spark, spec)  # refresh the view over the new files
    return spark.createDataFrame([(n,)], "rows_inserted bigint")


# ------------------------------------------------------- STATEMENT SET
#
# Reference: SqlBeginStatementSet / SqlEndStatementSet
# (flink-table/flink-sql-parser/src/main/codegen/data/Parser.tdd:79) and
# the EXECUTE STATEMENT SET BEGIN ... END form (SqlExecute). Multi-sink
# DML is WHY the reference's optimizer is common-subgraph based
# (flink-table/flink-table-planner/.../plan/optimize/
# StreamCommonSubGraphBasedOptimizer.scala:107 — it exists to share
# scans across sinks). The Spark mapping: build every INSERT's
# DataFrame, cache the ANALYZED plan of each source referenced by more
# than one sink (spark.catalog.cacheTable — Catalyst's CacheManager
# then substitutes the InMemoryRelation into every query whose plan
# contains that subtree, so the shared scan is executed once and the
# remaining sinks read the materialization), run the writes, uncache.
#
# Scale note (100 TB): sharing-by-materialization trades one extra
# write+read of the COMMON subtree for N-1 repeated scans; the cache is
# MEMORY_AND_DISK so it degrades to a disk spill, and only tables
# referenced by ≥2 sinks are ever cached. When the shared source is a
# raw 100 TB fact table it is often cheaper to re-scan (column-pruned
# parquet scans are cheap) — pass share_scans=False for that. Flink's
# runtime shares the scan operator inside ONE dataflow instead; Spark
# batch has no multi-sink job, so materialize-or-rescan is the honest
# choice space.
_STMT_SET_RE = re.compile(
    r"^\s*(?:EXECUTE\s+STATEMENT\s+SET\s+BEGIN\b|BEGIN\s+STATEMENT\s+SET\s*;)"
    r"(.+?)\bEND\s*;?\s*$",
    re.I | re.S,
)

# test/diagnostic hook: optimized-plan text per INSERT from the latest
# statement set (lets ITCases pin the shared-scan InMemoryRelation)
_LAST_STATEMENT_SET_PLANS: list[str] = []


def _split_statements(body: str) -> list[str]:
    """Split on top-level semicolons, respecting single-quoted strings
    and both SQL comment forms (``--`` to end-of-line, ``/* */`` —
    ADVICE r10: a ';' inside a comment must not end the statement)."""
    parts: list[str] = []
    buf: list[str] = []
    in_str = in_comment = in_block = False
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if in_block:
            buf.append(ch)
            if ch == "*" and i + 1 < n and body[i + 1] == "/":
                buf.append("/")
                i += 1
                in_block = False
        elif in_comment:
            buf.append(ch)
            if ch == "\n":
                in_comment = False
        elif in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == "-" and i + 1 < n and body[i + 1] == "-":
            in_comment = True
            buf.append(ch)
        elif ch == "/" and i + 1 < n and body[i + 1] == "*":
            in_block = True
            buf.append(ch)
        elif ch == ";":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _streaming_statement_set(
    spark: SparkSession, parsed: list[tuple[str, str, str]],
    stream_srcs: list[str], capture_plans: bool = False,
) -> DataFrame:
    """Streaming STATEMENT SET (r9; reference SqlBeginStatementSet +
    StreamTableEnvironment.createStatementSet — the statement set's
    PRIMARY use in Flink is streaming multi-sink, where the planner
    merges the statements into one job graph sharing the source scan,
    StreamCommonSubGraphBasedOptimizer.scala:107).

    Spark mapping: ONE readStream over the shared source drives a
    ``foreachBatch`` fan-out — per micro-batch the batch DataFrame is
    persisted once, the source's temp view is shadowed with it, and
    every INSERT's SELECT runs as batch SQL against that one
    materialization before being appended to its sink (so the shared
    scan executes once per micro-batch; the per-sink write plans read
    the InMemoryRelation, which the ITCase pins). Runs with
    ``trigger(availableNow=True)``: drain everything the source
    currently has through real micro-batches, then stop — the bounded
    execution mode; a production deployment would swap the trigger and
    keep the query handle. Restrictions (documented narrowing): exactly
    one streaming source per set (the fan-out shares one scan; Flink
    allows several), and sinks must be registered filesystem tables.

    At scale each micro-batch write is a normal distributed parquet
    append; the persist is one micro-batch's data, not the stream.

    ``capture_plans`` (r10, default False) gates the test-only
    instrumentation: with it on, every statement's optimized plan is
    accumulated on the driver per micro-batch (unbounded on a real
    continuous stream) and a second count action runs per sink. The
    production path is write-only — per-sink row counts come from an
    ``Observation`` attached to the single write action, so no plan
    strings accumulate and no extra job runs.
    """
    global _LAST_STATEMENT_SET_PLANS
    import tempfile

    if len(stream_srcs) != 1:
        raise ValueError(
            "streaming STATEMENT SET supports exactly one shared "
            f"streaming source; statements reference {stream_srcs}"
        )
    for mode, _sink, _q in parsed:
        if mode.upper() == "OVERWRITE":
            raise ValueError(
                "INSERT OVERWRITE is not allowed in a streaming "
                "STATEMENT SET (append-only), matching Flink's "
                "streaming-sink validation"
            )
    src = stream_srcs[0]
    spec = _REGISTERED[src]
    sdf = register_table(spark, spec)  # the single streaming scan
    counts: dict[str, int] = {s: 0 for _m, s, _q in parsed}
    plans: list[str] = []

    def fan_out(batch_df, batch_id: int) -> None:
        # foreachBatch hands the batch to a CLONED session; temp views
        # are session-scoped, so the shadow + SQL must run in the
        # batch's own session or the statements would still resolve the
        # source name to the streaming relation
        sess = batch_df.sparkSession
        batch_df.persist()
        try:
            # shadow the streaming view with THIS micro-batch so every
            # statement's SELECT text resolves to the one materialization
            batch_df.createOrReplaceTempView(src)
            for mode, sink, q in parsed:
                out = _build_insert(sess, sink, q)
                sspec = _REGISTERED[sink]
                fmt = sspec.options.get("format", "parquet")
                fmt_opts = {
                    k.split(".", 1)[1]: v
                    for k, v in sspec.options.items()
                    if k.startswith(f"{fmt}.")
                }
                if capture_plans:
                    plans.append(
                        out._jdf.queryExecution().optimizedPlan().toString()
                    )
                    out.cache()
                    try:
                        counts[sink] += out.count()
                        w = out.write.mode("append").format(fmt).options(
                            **fmt_opts
                        )
                        if sspec.partitioned:
                            w = w.partitionBy(*sspec.partitioned)
                        w.save(sspec.options["path"])
                    finally:
                        out.unpersist()
                else:
                    # production path: the write is the ONLY action; the
                    # Observation rides it, so counts cost nothing extra
                    from pyspark.sql import Observation
                    from pyspark.sql import functions as _F

                    obs = Observation()
                    out = out.observe(obs, _F.count(_F.lit(1)).alias("n"))
                    w = out.write.mode("append").format(fmt).options(
                        **fmt_opts
                    )
                    if sspec.partitioned:
                        w = w.partitionBy(*sspec.partitioned)
                    w.save(sspec.options["path"])
                    counts[sink] += obs.get["n"]
        finally:
            batch_df.unpersist()

    ckpt = spec.options.get("checkpoint")
    if ckpt is None:
        # ephemeral default checkpoint: a fresh dir per invocation means
        # re-running the same statement set re-ingests the whole source
        # and APPENDS duplicate rows to every sink — set 'checkpoint' in
        # the source's WITH options for resumable exactly-once progress.
        # mkdtemp only runs on this path (no stray dir when configured).
        ckpt = tempfile.mkdtemp(prefix="stmt_set_ckpt_")
    q = (
        sdf.writeStream.foreachBatch(fan_out)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    _LAST_STATEMENT_SET_PLANS = plans
    # refresh sink views so subsequent reads see the new files, and
    # restore the source's streaming view (fan_out shadowed it)
    for _mode, sink, _q in parsed:
        register_table(spark, _REGISTERED[sink])
    register_table(spark, spec)
    return spark.createDataFrame(
        sorted(counts.items()), "sink string, rows_inserted bigint"
    )


def _statement_set(
    spark: SparkSession, body: str, share_scans: bool = True,
    capture_plans: bool = False,
) -> DataFrame:
    """Execute a STATEMENT SET: N INSERTs submitted as one logical job.
    Returns one row per sink (sink, rows_inserted). Batch statements
    run inline; when a statement references a registered
    `scan.streaming` source the set runs as a streaming foreachBatch
    fan-out (see _streaming_statement_set)."""
    global _LAST_STATEMENT_SET_PLANS
    stmts = _split_statements(body)
    if not stmts:
        raise ValueError("STATEMENT SET: no statements between BEGIN and END")
    parsed: list[tuple[str, str, str]] = []  # (mode, sink, query)
    for s in stmts:
        im = _INSERT_RE.match(s)
        if not im:
            raise ValueError(
                "STATEMENT SET accepts INSERT statements only (Flink's "
                f"SqlBeginStatementSet contract); got: {s[:60]!r}"
            )
        sink = im.group(2)
        if sink not in _REGISTERED:
            raise ValueError(
                f"STATEMENT SET: sink table {sink!r} is not registered "
                "through this DDL front-end"
            )
        parsed.append((im.group(1), sink, im.group(3)))
    # count how many sinks reference each registered table; tables the
    # statements share become cached scans for the duration of the job
    refs: dict[str, int] = {}
    stream_srcs: list[str] = []
    for _mode, _sink, q in parsed:
        for name, spec in _REGISTERED.items():
            if re.search(rf"\b{re.escape(name)}\b", q):
                refs[name] = refs.get(name, 0) + 1
                if (
                    spec.options.get("scan.streaming", "false").lower()
                    == "true"
                    and name not in stream_srcs
                ):
                    stream_srcs.append(name)
    if stream_srcs:
        # streaming STATEMENT SET (r9): foreachBatch fan-out — the
        # reference's primary statement-set use case
        return _streaming_statement_set(
            spark, parsed, stream_srcs, capture_plans=capture_plans
        )
    shared = [n for n, c in refs.items() if c >= 2] if share_scans else []
    for n in shared:
        spark.catalog.cacheTable(n)  # lazy analyzed-plan cache: the
        # first write materializes it, later sinks read the cache
        # (never cache an EXECUTED DataFrame — that pins broadcasts)
    results: list[tuple[str, int]] = []
    plans: list[str] = []
    try:
        for mode, sink, q in parsed:
            qtext = q.strip().rstrip(";")
            if re.match(r"^PARTITION\b|^\(", qtext, re.I):
                plans.append("")  # partial-insert forms: skip plan capture
            else:
                probe = qtext
                if re.match(r"^VALUES\b", probe, re.I):
                    probe = f"SELECT * FROM ({probe})"
                plans.append(
                    spark.sql(probe)._jdf.queryExecution().optimizedPlan().toString()
                )
            n = _insert_into(spark, sink, mode, q).collect()[0][0]
            results.append((sink, n))
    finally:
        for n in shared:
            try:
                spark.catalog.uncacheTable(n)
            except Exception:
                pass
        _LAST_STATEMENT_SET_PLANS = plans
    return spark.createDataFrame(
        results, "sink string, rows_inserted bigint"
    )


# --------------------------------------- statement inventory (r8)
#
# The remaining SqlNode statements of the reference parser
# (flink-table/flink-sql-parser/src/main/codegen/data/Parser.tdd):
# SHOW TABLES/VIEWS/DATABASES/FUNCTIONS/COLUMNS, USE, CREATE DATABASE,
# EXPLAIN (SqlRichExplain, Parser.tdd:87), ANALYZE TABLE (Parser.tdd:76),
# ALTER VIEW, ALTER TABLE ADD/DROP PRIMARY KEY + COMPACT
# (Parser.tdd:39-41). Each maps onto the Spark catalog / ANALYZE /
# file-rewrite machinery; result column names follow Flink's
# ShowOperation output ("table name", "database name", ...).

# views created through this front-end's CREATE VIEW route (SHOW VIEWS
# needs to tell them apart from registered tables' temp views)
_VIEWS: set[str] = set()

_STATS_DB = "flink_ddl_stats"


def _one_col(spark: SparkSession, col: str, values: list[str]) -> DataFrame:
    from pyspark.sql.types import StringType, StructField, StructType

    return spark.createDataFrame(
        [(v,) for v in sorted(values)],
        StructType([StructField(col, StringType())]),
    )


def _describe_rows(spark: SparkSession, name: str) -> DataFrame:
    """Flink-style column report for a registered table — shared by
    DESCRIBE and SHOW COLUMNS (SqlRichDescribeTable / SqlShowColumns)."""
    spec = _REGISTERED[name]
    wm = (
        f"`{spec.watermark[0]}` - INTERVAL '{spec.watermark[1]}'"
        if spec.watermark
        else None
    )
    rows = []
    for c, t in spec.physical:
        key = "PRI(NOT ENFORCED)" if c in spec.primary_key else None
        extras = "PARTITIONED" if c in spec.partitioned else None
        rows.append((c, t.upper(), True, key, extras,
                     wm if spec.watermark and c == spec.watermark[0] else None))
    for c, t, k in spec.metadata:
        rows.append((c, t.upper(), True, None, f"METADATA FROM '{k}'", None))
    for c, expr in spec.computed:
        rows.append((c, "", True, None, f"AS {expr}", None))
    return spark.createDataFrame(
        rows,
        "name string, type string, `null` boolean, key string, "
        "extras string, watermark string",
    )


def _analyze_table(spark: SparkSession, name: str, cols_clause: str) -> DataFrame:
    """ANALYZE TABLE (reference SqlAnalyzeTable, Parser.tdd:76 —
    FlinkSqlParserImpl computes table/column stats into the catalog for
    the CBO). Spark mapping: mirror the registered filesystem table as
    an external catalog table (temp views cannot carry stats), run
    Spark's own `ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS]` on
    it — the SAME call the TPC-DS stats mode uses
    (queries_tpcds_real.py:174), so the stats feed the same CBO — then
    re-point the registered view at the catalog table so subsequent
    reads plan with those stats (sticky across re-registers via the
    __stats_table__ option)."""
    spec = _REGISTERED.get(name)
    if spec is None:
        # not ours: pass through to Spark's native ANALYZE (catalog tables)
        tail = f" {cols_clause}" if cols_clause else ""
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{tail}")
        return spark.createDataFrame([("OK",)], "result string")
    if spec.options.get("connector") != "filesystem":
        raise ValueError(
            f"ANALYZE TABLE {name}: only filesystem tables carry stats "
            "in this front-end"
        )
    if spec.options.get("format", "parquet") != "parquet":
        raise ValueError("ANALYZE TABLE: parquet tables only")
    path = spec.options["path"]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_STATS_DB}")
    cat = f"{_STATS_DB}.{name}"
    spark.sql(f"DROP TABLE IF EXISTS {cat}")
    if spec.partitioned:
        cols = ", ".join(f"{c} {t}" for c, t in spec.physical)
        parts = ", ".join(spec.partitioned)
        spark.sql(
            f"CREATE TABLE {cat} ({cols}) USING parquet "
            f"PARTITIONED BY ({parts}) LOCATION '{path}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {cat}")
    else:
        spark.sql(f"CREATE TABLE {cat} USING parquet LOCATION '{path}'")
    tail = f" {cols_clause}" if cols_clause else ""
    spark.sql(f"ANALYZE TABLE {cat} COMPUTE STATISTICS{tail}")
    # ANALYZE's whole point is stats-based planning: switch the CBO on,
    # exactly what the TPC-DS stats mode does (queries_tpcds_real.py:149)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    new_opts = dict(spec.options)
    new_opts["__stats_table__"] = cat
    spec = TableSpec(
        spec.name, list(spec.physical), list(spec.computed),
        spec.watermark, list(spec.primary_key), new_opts,
        list(spec.metadata), list(spec.partitioned),
    )
    register_table(spark, spec)
    return spark.createDataFrame([("OK",)], "result string")


def _compact_table(
    spark: SparkSession, name: str, partition: dict[str, str] | None
) -> DataFrame:
    """ALTER TABLE ... [PARTITION (...)] COMPACT (reference
    SqlAlterTableCompact, Parser.tdd:39-41 — the filesystem connector's
    small-file compaction). Rewrite the table's (or one partition's)
    files: read, repartition by the partition keys (one writer task —
    and so one output file — per live partition), write to a side
    directory, then atomically swap via the Hadoop FS rename. The
    rewrite is a single Spark job; at 100 TB you compact per-partition
    (pass PARTITION) so the job touches only the small-file dirs."""
    spec = _REGISTERED.get(name)
    if spec is None:
        raise ValueError(f"ALTER TABLE {name} COMPACT: table not registered")
    if spec.options.get("connector") != "filesystem":
        raise ValueError("COMPACT applies to filesystem tables")
    if partition and not spec.partitioned:
        raise ValueError(f"{name} is not partitioned")
    fmt = spec.options.get("format", "parquet")
    path = spec.options["path"].rstrip("/")
    fmt_opts = {
        k.split(".", 1)[1]: v
        for k, v in spec.options.items()
        if k.startswith(f"{fmt}.")
    }
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    if partition:
        bad = [c for c in partition if c not in spec.partitioned]
        if bad:
            raise ValueError(
                f"PARTITION spec column(s) {bad} are not partition keys "
                f"of {name} (declared: {spec.partitioned})"
            )
        sub = "/".join(f"{c}={partition[c]}" for c in spec.partitioned
                       if c in partition)
        src = f"{path}/{sub}"
        df = (
            spark.read.format(fmt).options(**fmt_opts).load(src)
        ).repartition(1)
    else:
        src = path
        reader = spark.read.format(fmt).options(**fmt_opts)
        df = reader.load(src)
        if spec.partitioned:
            df = df.repartition(*[F.col(c) for c in spec.partitioned])
    tmp = f"{path}__compact_tmp"
    writer = df.write.mode("overwrite").format(fmt).options(**fmt_opts)
    if not partition and spec.partitioned:
        writer = writer.partitionBy(*spec.partitioned)
    writer.save(tmp)
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    src_p = jvm.org.apache.hadoop.fs.Path(src)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(src_p, True)
    if partition:
        # the side write has no partition dirs (the read stripped the
        # partition columns); move the tmp dir to the partition path
        fs.mkdirs(src_p.getParent())
    fs.rename(tmp_p, src_p)
    register_table(spark, _REGISTERED[name])  # refresh the view
    return spark.createDataFrame([("OK",)], "result string")


_SHOW_RE = re.compile(
    r"^\s*SHOW\s+(TABLES|VIEWS|DATABASES|FUNCTIONS|CATALOGS|CURRENT\s+DATABASE|CURRENT\s+CATALOG)\s*;?\s*$",
    re.I,
)
_SHOW_COLUMNS_RE = re.compile(
    r"^\s*SHOW\s+COLUMNS\s+(?:FROM|IN)\s+(\w+)\s*;?\s*$", re.I
)
_USE_RE = re.compile(r"^\s*USE\s+(\w+)\s*;?\s*$", re.I)
_CREATE_DB_RE = re.compile(
    r"^\s*CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*;?\s*$", re.I
)
_EXPLAIN_RE = re.compile(
    r"^\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?(.+)$", re.I | re.S
)
_ANALYZE_RE = re.compile(
    r"^\s*ANALYZE\s+TABLE\s+(\w+)\s+COMPUTE\s+STATISTICS"
    r"(\s+FOR\s+(?:ALL\s+COLUMNS|COLUMNS\s+[\w\s,]+?))?\s*;?\s*$",
    re.I,
)
_ALTER_VIEW_RE = re.compile(
    r"^\s*ALTER\s+VIEW\s+(\w+)\s+(RENAME\s+TO\s+(\w+)|AS\s+(.+))$",
    re.I | re.S,
)
_COMPACT_RE = re.compile(
    r"^\s*(?:PARTITION\s*\(([^)]*)\)\s+)?COMPACT\s*$", re.I
)
_ADD_PK_RE = re.compile(
    r"^ADD\s+(?:CONSTRAINT\s+\w+\s+)?PRIMARY\s+KEY\s*\(([\w\s,]+)\)\s*"
    r"(NOT\s+ENFORCED)?\s*$",
    re.I,
)
_DROP_PK_RE = re.compile(r"^DROP\s+PRIMARY\s+KEY\s*$", re.I)


def _show_statement(spark: SparkSession, what: str) -> DataFrame:
    what = re.sub(r"\s+", " ", what.upper())
    if what == "TABLES":
        # Flink SHOW TABLES lists tables AND views of the current
        # database; here: every registered table + created view
        names = set(_REGISTERED) | _VIEWS
        return _one_col(spark, "table name", sorted(names))
    if what == "VIEWS":
        return _one_col(spark, "view name", sorted(_VIEWS))
    if what == "DATABASES":
        dbs = [r.namespace for r in spark.sql("SHOW DATABASES").collect()]
        return _one_col(spark, "database name", dbs)
    if what == "FUNCTIONS":
        fns = [f.name for f in spark.catalog.listFunctions()]
        return _one_col(spark, "function name", fns)
    if what == "CURRENT DATABASE":
        return _one_col(
            spark, "current database name", [spark.catalog.currentDatabase()]
        )
    if what == "CATALOGS":
        return _one_col(spark, "catalog name", sorted(_CATALOGS))
    if what == "CURRENT CATALOG":
        return _one_col(
            spark, "current catalog name", [_CURRENT_CATALOG[0]]
        )
    raise AssertionError(what)


def _raise_type(spark_t: str) -> str:
    """Spark SQL DDL type → Flink spelling (inverse of _lower_type for
    the supported surface; structs go back to ROW<...>)."""
    t = spark_t.strip()
    m = re.match(r"^struct<(.+)>$", t, re.I | re.S)
    if m:
        inner = ", ".join(
            f"{p.split(':', 1)[0].strip()} {_raise_type(p.split(':', 1)[1])}"
            for p in _split_top_commas(m.group(1))
        )
        return f"ROW<{inner}>"
    m = re.match(r"^array<(.+)>$", t, re.I | re.S)
    if m:
        return f"ARRAY<{_raise_type(m.group(1))}>"
    m = re.match(r"^map<(.+),(.+)>$", t, re.I | re.S)
    if m:
        return f"MAP<{_raise_type(m.group(1))}, {_raise_type(m.group(2))}>"
    return t.upper()


def show_create_table(spark: SparkSession, name: str) -> str:
    """Reconstruct the Flink-dialect DDL for a registered table —
    reference SqlShowCreateTable (Parser.tdd SHOW CREATE TABLE;
    ShowCreateUtil builds the canonical text from the resolved catalog
    table). Round-trippable: feeding the output back through
    execute_ddl registers an equivalent table."""
    spec = _REGISTERED.get(name)
    if spec is None:
        raise ValueError(
            f"SHOW CREATE TABLE {name}: table not registered through "
            "this DDL front-end"
        )
    # Spark DDL types are lower-case; Flink spells them upper-case, and
    # the parser re-lowers them — emit upper for dialect fidelity
    lines = [f"{c} {_raise_type(t)}" for c, t in spec.physical]
    lines += [
        f"{c} {_raise_type(t)} METADATA" + ("" if k == c else f" FROM '{k}'")
        for c, t, k in spec.metadata
    ]
    lines += [f"{c} AS {expr}" for c, expr in spec.computed]
    if spec.primary_key:
        lines.append(
            f"PRIMARY KEY ({', '.join(spec.primary_key)}) NOT ENFORCED"
        )
    if spec.watermark:
        col, delay = spec.watermark
        n, unit = delay.split()
        lines.append(
            f"WATERMARK FOR {col} AS {col} - "
            f"INTERVAL '{n}' {unit.rstrip('s').upper()}"
        )
    body = ",\n  ".join(lines)
    part = (
        f"\nPARTITIONED BY ({', '.join(spec.partitioned)})"
        if spec.partitioned
        else ""
    )
    opts = ",\n  ".join(f"'{k}' = '{v}'" for k, v in sorted(spec.options.items()))
    return (
        f"CREATE TABLE {spec.name} (\n  {body}\n){part}\nWITH (\n  {opts}\n)"
    )


_SHOW_CREATE_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+TABLE\s+(\w+)\s*;?\s*$", re.I
)
_DESCRIBE_RE = re.compile(r"^\s*DESC(?:RIBE)?\s+(\w+)\s*;?\s*$", re.I)


# --- CREATE / DROP / ALTER FUNCTION -----------------------------------
# Reference: SqlCreateFunction.java / SqlDropFunction.java /
# SqlAlterFunction.java (flink-table/flink-sql-parser/.../ddl/,
# Parser.tdd:52,62,36). Flink stores the identifier string in the
# catalog and instantiates at use; here LANGUAGE PYTHON resolves a
# named Python callable (``module.attr``) via importlib and registers
# it with spark.udf.register so SQL sees it (SHOW FUNCTIONS lists it
# via spark.catalog.listFunctions). JAVA/SCALA bodies need user jars —
# out of scope for a Python-first engine (documented narrowing, same
# class as ADD JAR); SQL-language functions are not in the reference's
# CREATE FUNCTION surface either.
#
# TEMPORARY vs persistent: Spark's Python UDF registration is always
# session-scoped, so persistence is what Flink's catalog actually
# stores — the (name -> identifier, language) record. Non-TEMPORARY
# functions are kept in the module-level _FUNCTIONS catalog and
# ``restore_functions(spark)`` re-resolves + re-registers them in a
# new session (the metastore-attach analog); TEMPORARY ones die with
# the session that created them, exactly like the reference's
# temporary catalog functions (FunctionCatalog.java).

_FUNCTIONS: dict[str, dict] = {}

_CREATE_FN_RE = re.compile(
    r"^\s*CREATE\s+(TEMPORARY\s+)?(SYSTEM\s+)?FUNCTION\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+'([^']+)'"
    r"(?:\s+LANGUAGE\s+(\w+))?\s*;?\s*$",
    re.I,
)
_DROP_FN_RE = re.compile(
    r"^\s*DROP\s+(TEMPORARY\s+)?(SYSTEM\s+)?FUNCTION\s+"
    r"(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$",
    re.I,
)
_ALTER_FN_RE = re.compile(
    r"^\s*ALTER\s+(TEMPORARY\s+)?(SYSTEM\s+)?FUNCTION\s+"
    r"(IF\s+EXISTS\s+)?([\w.]+)\s+AS\s+'([^']+)'"
    r"(?:\s+LANGUAGE\s+(\w+))?\s*;?\s*$",
    re.I,
)


def _resolve_callable(identifier: str):
    """``module.attr`` → the named Python callable (Flink's
    class-name-to-instance resolution, UserDefinedFunctionHelper)."""
    import importlib

    if "." not in identifier:
        raise ValueError(
            f"CREATE FUNCTION: identifier {identifier!r} must be a "
            f"qualified 'module.attr' path for LANGUAGE PYTHON"
        )
    mod_name, attr = identifier.rsplit(".", 1)
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as e:
        raise ValueError(
            f"CREATE FUNCTION: cannot import module {mod_name!r}: {e}"
        ) from e
    try:
        fn = getattr(mod, attr)
    except AttributeError:
        raise ValueError(
            f"CREATE FUNCTION: module {mod_name!r} has no attribute {attr!r}"
        ) from None
    if not callable(fn):
        raise ValueError(f"CREATE FUNCTION: {identifier!r} is not callable")
    return fn


def _register_function(spark: SparkSession, name: str, identifier: str,
                       language: str | None) -> None:
    lang = (language or "PYTHON").upper()
    if lang != "PYTHON":
        raise ValueError(
            f"CREATE FUNCTION LANGUAGE {lang}: only PYTHON bodies are "
            f"supported (JAVA/SCALA need user jars — see SURVEY §2.1 "
            f"ADD JAR narrowing)"
        )
    fn = _resolve_callable(identifier)
    if hasattr(fn, "asNondeterministic"):
        # already a @udf/@pandas_udf-wrapped function (the same duck
        # check spark.udf.register applies): register as-is, keeping
        # its Arrow-vectorized eval type and declared return type
        spark.udf.register(name, fn)
    else:
        rt = getattr(fn, "returnType", None) or "string"
        spark.udf.register(name, fn, rt)


def _function_ddl(spark: SparkSession, stripped: str) -> DataFrame | None:
    m = _CREATE_FN_RE.match(stripped)
    if m:
        temp, system, ine, name, ident, lang = m.groups()
        if system and not temp:
            raise ValueError("SYSTEM functions must be TEMPORARY "
                             "(reference parser: TEMPORARY SYSTEM)")
        if name in _FUNCTIONS and not ine:
            raise ValueError(f"function {name} already exists "
                             f"(use IF NOT EXISTS or ALTER FUNCTION)")
        if name in _FUNCTIONS and ine:
            return spark.createDataFrame([("OK",)], "result string")
        _register_function(spark, name, ident, lang)
        _FUNCTIONS[name] = {
            "identifier": ident,
            "language": (lang or "PYTHON").upper(),
            "temporary": bool(temp),
            "system": bool(system),
        }
        return spark.createDataFrame([("OK",)], "result string")
    m = _DROP_FN_RE.match(stripped)
    if m:
        _temp, _system, ife, name = m.groups()
        if name not in _FUNCTIONS:
            if ife:
                return spark.createDataFrame([("OK",)], "result string")
            raise ValueError(f"DROP FUNCTION: function {name} not found")
        _FUNCTIONS.pop(name)
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        return spark.createDataFrame([("OK",)], "result string")
    m = _ALTER_FN_RE.match(stripped)
    if m:
        _temp, _system, ife, name, ident, lang = m.groups()
        if name not in _FUNCTIONS:
            if ife:
                return spark.createDataFrame([("OK",)], "result string")
            raise ValueError(f"ALTER FUNCTION: function {name} not found")
        _register_function(spark, name, ident, lang)
        _FUNCTIONS[name].update(
            identifier=ident,
            language=(lang or _FUNCTIONS[name]["language"]).upper(),
        )
        return spark.createDataFrame([("OK",)], "result string")
    return None


# --- session SET / RESET and catalog statements -------------------------
# Reference: SqlSet / SqlReset (Parser.tdd:66-67), CREATE/DROP/USE
# CATALOG, SHOW CATALOGS / SHOW CURRENT CATALOG, DESCRIBE CATALOG /
# DATABASE, SHOW CREATE VIEW (Parser.tdd:50,59,73-77,90-101).
#
# SET 'k' = 'v' maps onto spark.conf.set; the keys a session sets are
# tracked so bare RESET restores all of them (Flink's
# SqlSetOperation/ResetOperation semantics). Catalogs: Spark's session
# has ONE catalog implementation, so Flink catalogs map to named
# namespaces tracked by this front-end — CREATE CATALOG records the
# name + properties, USE CATALOG switches the current one, and
# databases within live in the one Spark catalog (a documented
# narrowing: a multi-metastore deployment would back each name with a
# Spark catalog plugin instead).

_SESSION_CONF_KEYS: set[str] = set()
_CATALOGS: dict[str, dict[str, str]] = {
    "default_catalog": {"type": "generic_in_memory"},
}
_CURRENT_CATALOG = ["default_catalog"]
_VIEW_SQL: dict[str, str] = {}

_SET_RE = re.compile(
    r"^\s*SET(?:\s+'([^']+)'\s*=\s*'([^']*)'|\s+([\w.\-]+)\s*=\s*([^;\s]+))?"
    r"\s*;?\s*$",
    re.I,
)
_RESET_RE = re.compile(
    r"^\s*RESET(?:\s+'([^']+)'|\s+([\w.\-]+))?\s*;?\s*$", re.I
)
_CREATE_CATALOG_RE = re.compile(
    r"^\s*CREATE\s+CATALOG\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)"
    r"(?:\s+WITH\s*\((.*)\))?\s*;?\s*$",
    re.I | re.S,
)
_DROP_CATALOG_RE = re.compile(
    r"^\s*DROP\s+CATALOG\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*$", re.I
)
_USE_CATALOG_RE = re.compile(r"^\s*USE\s+CATALOG\s+(\w+)\s*;?\s*$", re.I)
_DESCRIBE_CATALOG_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+CATALOG\s+(?:EXTENDED\s+)?(\w+)\s*;?\s*$", re.I
)
_DESCRIBE_DB_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+DATABASE\s+(?:EXTENDED\s+)?(\w+)\s*;?\s*$", re.I
)
_SHOW_CREATE_VIEW_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+VIEW\s+(\w+)\s*;?\s*$", re.I
)

# --- modules and JAR resources (r10; the last unhandled Parser.tdd
# statements: SqlLoadModule/SqlUnloadModule/SqlUseModules/SqlShowModules
# Parser.tdd:64-65,96-97, SqlAddJar/SqlRemoveJar/SqlShowJars
# Parser.tdd:33,88-89). Flink's ModuleManager keeps an ordered registry
# of loaded modules with a used-subset that drives function resolution;
# module INSTANTIATION goes through JVM ModuleFactory discovery
# (FactoryUtil), which a Python-first engine deliberately does not have
# — the only discoverable module here is 'core' (the engine's built-in
# function battery), and loading any other identifier raises the
# reference's factory-not-found error shape. This is a documented
# narrowing (SURVEY deviation register). JARs: ADD JAR delegates to
# Spark's native resource machinery (real JVM classpath effect) and is
# tracked client-side for SHOW JARS, like SqlClient's resource list;
# REMOVE JAR drops the registry entry but cannot evict the jar from the
# live JVM classpath (Spark has no REMOVE JAR — second half of the same
# deviation row).

_MODULES: dict[str, bool] = {"core": True}  # name -> used; dict order = load order
_MODULE_FACTORIES = {"core"}  # identifiers a LOAD MODULE can instantiate
_JARS: list[str] = []

_LOAD_MODULE_RE = re.compile(
    r"^\s*LOAD\s+MODULE\s+(\w+)(?:\s+WITH\s*\((.*)\))?\s*;?\s*$", re.I | re.S
)
_UNLOAD_MODULE_RE = re.compile(
    r"^\s*UNLOAD\s+MODULE\s+(\w+)\s*;?\s*$", re.I
)
_USE_MODULES_RE = re.compile(
    r"^\s*USE\s+MODULES\s+(\w+(?:\s*,\s*\w+)*)\s*;?\s*$", re.I
)
_SHOW_MODULES_RE = re.compile(
    r"^\s*SHOW\s+(FULL\s+)?MODULES\s*;?\s*$", re.I
)
_ADD_JAR_RE = re.compile(r"^\s*ADD\s+JAR\s+'([^']+)'\s*;?\s*$", re.I)
_REMOVE_JAR_RE = re.compile(r"^\s*REMOVE\s+JAR\s+'([^']+)'\s*;?\s*$", re.I)
_SHOW_JARS_RE = re.compile(r"^\s*SHOW\s+JARS\s*;?\s*$", re.I)


def _module_statement(spark: SparkSession, stripped: str) -> DataFrame | None:
    m = _LOAD_MODULE_RE.match(stripped)
    if m:
        name = m.group(1).lower()
        if name in _MODULES:
            # ModuleManager.loadModule: duplicate names rejected
            raise ValueError(f"A module with name '{name}' already exists")
        if name not in _MODULE_FACTORIES:
            # reference-shaped refusal (FactoryUtil.discoverFactory):
            # there is no JVM factory discovery in this Python engine
            raise ValueError(
                f"Could not find any factory for identifier '{name}' "
                "that implements ModuleFactory (this engine discovers "
                "only the built-in 'core' module; JVM classpath module "
                "factories are a documented narrowing)"
            )
        _MODULES[name] = True  # loaded modules start used, like Flink
        return spark.createDataFrame([("OK",)], "result string")
    m = _UNLOAD_MODULE_RE.match(stripped)
    if m:
        name = m.group(1).lower()
        if name not in _MODULES:
            raise ValueError(f"No module with name '{name}' exists")
        _MODULES.pop(name)
        return spark.createDataFrame([("OK",)], "result string")
    m = _USE_MODULES_RE.match(stripped)
    if m:
        names = [n.strip().lower() for n in m.group(1).split(",")]
        if len(set(names)) != len(names):
            raise ValueError(
                f"Module names must be unique, but found duplicates in "
                f"{names}"
            )
        missing = [n for n in names if n not in _MODULES]
        if missing:
            raise ValueError(f"No module with name '{missing[0]}' exists")
        # USE MODULES re-declares the used subset AND its order; loaded-
        # but-unused modules stay loaded (ModuleManager.useModules)
        unused = [n for n in _MODULES if n not in names]
        _MODULES.clear()
        for n in names:
            _MODULES[n] = True
        for n in unused:
            _MODULES[n] = False
        return spark.createDataFrame([("OK",)], "result string")
    m = _SHOW_MODULES_RE.match(stripped)
    if m:
        if m.group(1):  # SHOW FULL MODULES: every loaded module + flag
            rows = [(n, u) for n, u in _MODULES.items()]
            return spark.createDataFrame(
                rows, "`module name` string, used boolean"
            )
        rows = [(n,) for n, u in _MODULES.items() if u]
        return spark.createDataFrame(rows, "`module name` string")
    m = _ADD_JAR_RE.match(stripped)
    if m:
        path = m.group(1)
        if not path.lower().endswith(".jar"):
            raise ValueError(f"ADD JAR only accepts .jar files: {path}")
        spark.sql(f"ADD JAR '{path}'")  # real JVM-side resource add
        if path not in _JARS:
            _JARS.append(path)
        return spark.createDataFrame([("OK",)], "result string")
    m = _REMOVE_JAR_RE.match(stripped)
    if m:
        path = m.group(1)
        if path not in _JARS:
            raise ValueError(
                f"The jar resource [{path}] hasn't been registered"
            )
        _JARS.remove(path)  # registry only; the live JVM classpath
        # retains the jar for the session (documented narrowing)
        return spark.createDataFrame([("OK",)], "result string")
    if _SHOW_JARS_RE.match(stripped):
        return spark.createDataFrame([(j,) for j in _JARS], "jars string")
    return None


def _session_statement(spark: SparkSession, stripped: str) -> DataFrame | None:
    m = _SET_RE.match(stripped)
    if m:
        key = m.group(1) or m.group(3)
        if key is None:
            # bare SET: list session config (Flink lists the set
            # properties; Spark's native SET returns all — same shape)
            return spark.sql("SET").toDF("key", "value")
        val = m.group(2) if m.group(1) else m.group(4)
        spark.conf.set(key, val)
        _SESSION_CONF_KEYS.add(key)
        return spark.createDataFrame([("OK",)], "result string")
    m = _RESET_RE.match(stripped)
    if m:
        key = m.group(1) or m.group(2)
        keys = [key] if key else sorted(_SESSION_CONF_KEYS)
        for k in keys:
            try:
                spark.conf.unset(k)
            except Exception:
                pass  # non-unsettable core key: leave as-is, like Flink
            _SESSION_CONF_KEYS.discard(k)
        return spark.createDataFrame([("OK",)], "result string")
    m = _CREATE_CATALOG_RE.match(stripped)
    if m:
        ine, name = m.group(1), m.group(2)
        props = _parse_options(m.group(3)) if m.group(3) else {}
        if name in _CATALOGS:
            if not ine:
                # Flink's CatalogManager raises on duplicate registration
                raise ValueError(f"CREATE CATALOG: catalog {name} already exists")
            return spark.createDataFrame([("OK",)], "result string")
        _CATALOGS[name] = props or {"type": "generic_in_memory"}
        return spark.createDataFrame([("OK",)], "result string")
    m = _DROP_CATALOG_RE.match(stripped)
    if m:
        ife, name = m.group(1), m.group(2)
        if name not in _CATALOGS:
            if ife:
                return spark.createDataFrame([("OK",)], "result string")
            raise ValueError(f"DROP CATALOG: catalog {name} not found")
        if name == _CURRENT_CATALOG[0]:
            raise ValueError("cannot drop the current catalog (Flink "
                             "CatalogManager.unregisterCatalog contract)")
        _CATALOGS.pop(name)
        return spark.createDataFrame([("OK",)], "result string")
    m = _USE_CATALOG_RE.match(stripped)
    if m:
        name = m.group(1)
        if name not in _CATALOGS:
            raise ValueError(f"USE CATALOG: catalog {name} not found")
        _CURRENT_CATALOG[0] = name
        return spark.createDataFrame([("OK",)], "result string")
    m = _DESCRIBE_CATALOG_RE.match(stripped)
    if m:
        name = m.group(1)
        if name not in _CATALOGS:
            raise ValueError(f"DESCRIBE CATALOG: catalog {name} not found")
        rows = [("name", name)] + sorted(_CATALOGS[name].items())
        return spark.createDataFrame(rows, "info_name string, info_value string")
    m = _DESCRIBE_DB_RE.match(stripped)
    if m:
        return spark.sql(f"DESCRIBE DATABASE {m.group(1)}")
    m = _SHOW_CREATE_VIEW_RE.match(stripped)
    if m:
        name = m.group(1)
        if name not in _VIEW_SQL:
            raise ValueError(f"SHOW CREATE VIEW: view {name} was not "
                             "created through this DDL front-end")
        text = f"CREATE VIEW {name} AS {_VIEW_SQL[name].strip()}"
        return spark.createDataFrame([(text,)], "result string")
    return None


# --- COMPILE PLAN / EXECUTE PLAN ---------------------------------------
# Reference: SqlCompilePlan.java / SqlExecutePlan.java /
# SqlCompileAndExecutePlan.java (Parser.tdd:49,84-85) and the
# CompiledPlan surface (flink-table/flink-table-api-java/src/main/java/
# org/apache/flink/table/api/CompiledPlan.java) — Flink persists a
# query's compiled exec plan to a JSON file so a statement can be
# re-submitted across restarts/upgrades with a STABLE topology, and
# REFUSES to restore when the catalog no longer matches.
#
# Spark mapping: Catalyst plans are bound to a live session and Spark
# re-optimizes at submit (AQE re-plans at runtime even within a job),
# so what is durable here is the plan RECIPE — the statement text, the
# engine plan-format version, and the canonical DDL (SHOW CREATE TABLE
# round-trip form) of every referenced front-end table. EXECUTE PLAN
# re-validates each table's canonical DDL against the live catalog and
# refuses on ANY drift (renamed column, changed type, different path —
# the same contract CompiledPlan.restore enforces), then resubmits the
# statement through the normal INSERT / STATEMENT SET machinery.

PLAN_FORMAT_VERSION = 1

_COMPILE_PLAN_RE = re.compile(
    r"^\s*COMPILE\s+(AND\s+EXECUTE\s+)?PLAN\s+'([^']+)'\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?FOR\s+(.+)$",
    re.I | re.S,
)
_EXECUTE_PLAN_RE = re.compile(
    r"^\s*EXECUTE\s+PLAN\s+'([^']+)'\s*;?\s*$", re.I
)


def _plan_referenced_tables(text: str) -> list[str]:
    return sorted(
        n for n in _REGISTERED if re.search(rf"\b{re.escape(n)}\b", text)
    )


def _compile_plan(spark: SparkSession, path: str, dml: str,
                  if_not_exists: bool, and_execute: bool) -> DataFrame:
    import json as _json
    import os as _os

    dml = dml.strip().rstrip(";")
    if not (_INSERT_RE.match(dml) or _STMT_SET_RE.match(dml)):
        raise ValueError(
            "COMPILE PLAN supports INSERT or STATEMENT SET only "
            "(reference SqlCompilePlan: RichSqlInsert | SqlStatementSet); "
            f"got: {dml[:60]!r}"
        )
    refs = _plan_referenced_tables(dml)
    if not refs:
        raise ValueError(
            "COMPILE PLAN: the statement references no table registered "
            "through this DDL front-end — nothing to pin the plan against"
        )
    if _os.path.exists(path) and not if_not_exists:
        raise ValueError(
            f"COMPILE PLAN: plan file {path!r} already exists "
            "(use IF NOT EXISTS to keep the existing plan)"
        )
    if not _os.path.exists(path):
        recipe = {
            "format_version": PLAN_FORMAT_VERSION,
            "statement": dml,
            "tables": {n: show_create_table(spark, n) for n in refs},
        }
        with open(path, "w") as f:
            _json.dump(recipe, f, indent=1)
    if and_execute:
        return _execute_plan(spark, path)
    return spark.createDataFrame([("OK",)], "result string")


def _execute_plan(spark: SparkSession, path: str) -> DataFrame:
    import json as _json

    try:
        with open(path) as f:
            recipe = _json.load(f)
    except OSError as e:
        raise ValueError(f"EXECUTE PLAN: cannot read {path!r}: {e}") from e
    ver = recipe.get("format_version")
    if ver != PLAN_FORMAT_VERSION:
        raise ValueError(
            f"EXECUTE PLAN: plan format version {ver} does not match "
            f"this engine's {PLAN_FORMAT_VERSION} — recompile the plan"
        )
    for name, ddl in recipe["tables"].items():
        if name not in _REGISTERED:
            raise ValueError(
                f"EXECUTE PLAN: table {name!r} from the compiled plan is "
                "no longer registered (CompiledPlan restore contract: "
                "the catalog must match)"
            )
        live = show_create_table(spark, name)
        if live != ddl:
            raise ValueError(
                f"EXECUTE PLAN: schema drift on table {name!r} — the live "
                f"canonical DDL differs from the compiled plan's.\n"
                f"compiled: {ddl}\nlive: {live}"
            )
    stmt = recipe["statement"]
    ssm = _STMT_SET_RE.match(stmt)
    if ssm:
        return _statement_set(spark, ssm.group(1))
    im = _INSERT_RE.match(stmt)
    assert im, stmt
    return _insert_into(spark, im.group(2), im.group(1), im.group(3))


def restore_functions(spark: SparkSession) -> int:
    """Re-register every PERSISTENT (non-TEMPORARY) function in a new
    session — the engine's metastore-attach analog for Python UDFs
    (Flink re-instantiates catalog functions from their stored class
    names the same way). Returns the number restored."""
    n = 0
    for name, rec in _FUNCTIONS.items():
        if not rec["temporary"]:
            _register_function(spark, name, rec["identifier"],
                               rec["language"])
            n += 1
    return n


def execute_ddl(
    spark: SparkSession, sql: str, capture_plans: bool = False
) -> DataFrame | None:
    """Route a Flink DDL statement; None if ``sql`` isn't DDL (caller
    should fall through to spark.sql). ``capture_plans`` turns on the
    test-only statement-set plan capture (see _streaming_statement_set)."""
    stripped = sql.strip()
    fm = _function_ddl(spark, stripped)
    if fm is not None:
        return fm
    mm0 = _module_statement(spark, stripped)
    if mm0 is not None:
        return mm0
    sm0 = _session_statement(spark, stripped)
    if sm0 is not None:
        return sm0
    cpm = _COMPILE_PLAN_RE.match(stripped)
    if cpm:
        return _compile_plan(
            spark, cpm.group(2), cpm.group(4),
            if_not_exists=bool(cpm.group(3)),
            and_execute=bool(cpm.group(1)),
        )
    epm = _EXECUTE_PLAN_RE.match(stripped)
    if epm:
        return _execute_plan(spark, epm.group(1))
    ssm = _STMT_SET_RE.match(stripped)
    if ssm:
        return _statement_set(spark, ssm.group(1),
                              capture_plans=capture_plans)
    is_create_table = re.match(
        r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\b", stripped, re.I
    )
    cm = _CTAS_RE.match(stripped.rstrip(";"))
    if cm:
        return _create_table_as(
            spark, cm.group(2), cm.group(3), cm.group(4),
            if_not_exists=bool(cm.group(1)),
        )
    am = _ALTER_RE.match(stripped)
    if am:
        return _alter_table(spark, am.group(1), am.group(2))
    sm = _SHOW_CREATE_RE.match(stripped)
    if sm:
        return spark.createDataFrame(
            [(show_create_table(spark, sm.group(1)),)], "result string"
        )
    dm2 = _DESCRIBE_RE.match(stripped)
    if dm2 and dm2.group(1) in _REGISTERED:
        # DESCRIBE on a DDL-registered table: Flink-style column report
        # (name, type, null, key, extras, watermark) — reference
        # SqlRichDescribeTable / DESCRIBE output shape
        return _describe_rows(spark, dm2.group(1))
    scm = _SHOW_COLUMNS_RE.match(stripped)
    if scm and scm.group(1) in _REGISTERED:
        # SqlShowColumns — same report shape as DESCRIBE in Flink
        return _describe_rows(spark, scm.group(1))
    shm = _SHOW_RE.match(stripped)
    if shm:
        return _show_statement(spark, shm.group(1))
    um = _USE_RE.match(stripped)
    if um:
        spark.sql(f"USE {um.group(1)}")
        return spark.createDataFrame([("OK",)], "result string")
    cdm = _CREATE_DB_RE.match(stripped)
    if cdm:
        ine = "IF NOT EXISTS " if cdm.group(1) else ""
        spark.sql(f"CREATE DATABASE {ine}{cdm.group(2)}")
        return spark.createDataFrame([("OK",)], "result string")
    anm = _ANALYZE_RE.match(stripped)
    if anm:
        return _analyze_table(spark, anm.group(1), (anm.group(2) or "").strip())
    avm = _ALTER_VIEW_RE.match(stripped.rstrip(";"))
    if avm:
        # SqlAlterView (Parser.tdd): RENAME TO re-points the temp view,
        # AS replaces the definition
        vname = avm.group(1)
        try:
            cur = spark.table(vname)
        except Exception:
            raise ValueError(f"ALTER VIEW {vname}: view not found")
        if avm.group(3):
            new_name = avm.group(3)
            cur.createOrReplaceTempView(new_name)
            spark.catalog.dropTempView(vname)
            if vname in _VIEWS:
                _VIEWS.discard(vname)
                _VIEWS.add(new_name)
            if vname in _VIEW_SQL:
                _VIEW_SQL[new_name] = _VIEW_SQL.pop(vname)
        else:
            spark.sql(avm.group(4)).createOrReplaceTempView(vname)
            _VIEW_SQL[vname] = avm.group(4)
        return spark.createDataFrame([("OK",)], "result string")
    exm = _EXPLAIN_RE.match(stripped.rstrip(";"))
    if exm:
        # SqlRichExplain (Parser.tdd:87) — one string column `result`,
        # like Flink's EXPLAIN output. INSERT targets explain the
        # schema-aligned sink plan; queries explain via Spark directly.
        target = exm.group(1).strip()
        if re.match(r"^(FORMATTED|EXTENDED|CODEGEN|COST)\b", target, re.I):
            # Spark-native explain mode: delegate verbatim
            return spark.sql(stripped.rstrip(";")).toDF("result")
        tim = _INSERT_RE.match(target)
        if tim and tim.group(2) in _REGISTERED:
            out = _build_insert(spark, tim.group(2), tim.group(3))
            jqe = out._jdf.queryExecution()
            text = (
                f"== Sink ==\nfilesystem: "
                f"{_REGISTERED[tim.group(2)].options.get('path')}\n" + str(jqe)
            )
        else:
            jqe = spark.sql(target)._jdf.queryExecution()
            text = str(jqe)
        return spark.createDataFrame([(text,)], "result string")
    if is_create_table and (
        _CREATE_RE.match(stripped.rstrip(";"))
        or _split_top_level_like(stripped.rstrip(";")) is not None
    ):
        register_table(spark, parse_create_table(stripped))
        return spark.createDataFrame([("OK",)], "result string")
    vm = _VIEW_RE.match(stripped.rstrip(";"))
    if vm:
        spark.sql(vm.group(2)).createOrReplaceTempView(vm.group(1))
        _VIEWS.add(vm.group(1))
        _VIEW_SQL[vm.group(1)] = vm.group(2)  # for SHOW CREATE VIEW
        return spark.createDataFrame([("OK",)], "result string")
    dm = _DROP_RE.match(stripped)
    if dm:
        spark.catalog.dropTempView(dm.group(2))
        _REGISTERED.pop(dm.group(2), None)
        _VIEWS.discard(dm.group(2))
        _VIEW_SQL.pop(dm.group(2), None)
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
