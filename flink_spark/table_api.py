"""PyFlink-style Table API over Spark DataFrames.

Mirrors the user-facing surface of the reference's Table API —
``pyflink/table/table.py`` (select:117 … flat_aggregate:860,
to_pandas:915) and ``pyflink/table/table_environment.py``
(sql_query:798, execute_sql:821, from_pandas:1453) — as a thin adapter:
every method builds a Spark DataFrame immediately, so Catalyst sees the
full declarative plan (no interpretation layer at runtime).

Expression strings accept Spark SQL plus the PyFlink attribute-agg
idiom (``"amount.sum"`` → ``sum(amount)``); group windows come from
``Tumble``/``Slide``/``Session`` descriptors (Table.java window():
flink-table/flink-table-api-java/.../api/Table.java; group-window
classes in pyflink/table/window.py) and OVER windows from ``Over``
(pyflink/table/window.py Over class), both mapping onto
``F.window``/``session_window``/``pyspark Window`` specs.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "TableEnvironment",
    "Table",
    "Tumble",
    "Slide",
    "Session",
    "Over",
    "col",
    "lit",
]

col = F.col
lit = F.lit

_ATTR_AGG = re.compile(
    r"\b(\w+)\.(sum|avg|min|max|count|first_value|last_value|stddev|variance)\b"
)
_AGG_MAP = {"stddev": "stddev_samp", "variance": "var_samp", "first_value": "first",
            "last_value": "last"}


def _rewrite(expr: str) -> str:
    """``amount.sum`` → ``sum(amount)`` (PyFlink attribute-agg idiom)."""
    return _ATTR_AGG.sub(
        lambda m: f"{_AGG_MAP.get(m.group(2), m.group(2))}({m.group(1)})", expr
    )


def _split_top_level(s: str) -> list[str]:
    """Split an expression list on commas not inside parens/quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _to_cols(exprs: tuple) -> list[Column]:
    out: list[Column] = []
    for e in exprs:
        if isinstance(e, Column):
            out.append(e)
        elif isinstance(e, str):
            out.extend(F.expr(_rewrite(p)) for p in _split_top_level(e))
        else:
            raise TypeError(f"expected Column or str, got {type(e)}")
    return out


# ---------------------------------------------------------------------------
# Group-window descriptors (pyflink/table/window.py analogues)
# ---------------------------------------------------------------------------

class _GroupWindow:
    """Resolved descriptor: produces the Spark window struct column."""

    def __init__(self, kind: str, ts: str, alias_: str, **params: str):
        self.kind, self.ts, self.alias, self.params = kind, ts, alias_, params

    def window_col(self) -> Column:
        from pyspark.sql.functions import session_window, window

        if self.kind == "tumble":
            return window(self.ts, self.params["size"])
        if self.kind == "slide":
            return window(self.ts, self.params["size"], self.params["slide"])
        if self.kind == "session":
            return session_window(self.ts, self.params["gap"])
        raise ValueError(self.kind)


class Tumble:
    """``Tumble.over("10 minutes").on("ts").alias("w")``."""

    def __init__(self):
        self._size = self._ts = None

    @staticmethod
    def over(size: str) -> "Tumble":
        t = Tumble()
        t._size = size
        return t

    def on(self, ts: str) -> "Tumble":
        self._ts = ts
        return self

    def alias(self, name: str) -> _GroupWindow:
        return _GroupWindow("tumble", self._ts, name, size=self._size)


class Slide:
    """``Slide.over("1 hour").every("10 minutes").on("ts").alias("w")``."""

    def __init__(self):
        self._size = self._slide = self._ts = None

    @staticmethod
    def over(size: str) -> "Slide":
        s = Slide()
        s._size = size
        return s

    def every(self, slide: str) -> "Slide":
        self._slide = slide
        return self

    def on(self, ts: str) -> "Slide":
        self._ts = ts
        return self

    def alias(self, name: str) -> _GroupWindow:
        return _GroupWindow("slide", self._ts, name, size=self._size, slide=self._slide)


class Session:
    """``Session.with_gap("30 minutes").on("ts").alias("w")``."""

    def __init__(self):
        self._gap = self._ts = None

    @staticmethod
    def with_gap(gap: str) -> "Session":
        s = Session()
        s._gap = gap
        return s

    def on(self, ts: str) -> "Session":
        self._ts = ts
        return self

    def alias(self, name: str) -> _GroupWindow:
        return _GroupWindow("session", self._ts, name, gap=self._gap)


class Over:
    """OVER-window descriptor → pyspark ``WindowSpec``.

    ``Over.partition_by("k").order_by("ts").preceding(10).following(0)``;
    ``preceding("unbounded")`` for UNBOUNDED PRECEDING, ``range_=True``
    via ``.range_between()`` for RANGE frames.
    """

    def __init__(self):
        self._partition: list[str] = []
        self._order: list[str] = []
        self._lo = Window.unboundedPreceding
        self._hi = Window.currentRow
        self._range = False
        self._explicit_rows = False

    @staticmethod
    def partition_by(*cols_: str) -> "Over":
        o = Over()
        o._partition = list(cols_)
        return o

    def order_by(self, *cols_: str) -> "Over":
        self._order = list(cols_)
        return self

    def preceding(self, n) -> "Over":
        self._lo = Window.unboundedPreceding if n == "unbounded" else -int(n)
        if n != "unbounded":
            self._explicit_rows = True
        return self

    def following(self, n) -> "Over":
        self._hi = Window.unboundedFollowing if n == "unbounded" else int(n)
        if n != "unbounded":
            self._explicit_rows = True
        return self

    def as_range(self) -> "Over":
        self._range = True
        return self

    def spec(self) -> WindowSpec:
        w = Window.partitionBy(*self._partition) if self._partition else Window.partitionBy()
        if self._order:
            w = w.orderBy(*[F.expr(c) for c in self._order])
        # Flink over-windows default to a RANGE frame (OverWindow
        # UNBOUNDED_RANGE; pyflink/table/window.py Over): with duplicate
        # order keys every peer row sees the same aggregate. Only an
        # explicit numeric preceding/following (a row-count frame) or
        # as_range() overrides the default.
        use_range = self._range or not self._explicit_rows
        return w.rangeBetween(self._lo, self._hi) if use_range else w.rowsBetween(
            self._lo, self._hi
        )


# ---------------------------------------------------------------------------
# Table
# ---------------------------------------------------------------------------

class _WindowedTable:
    def __init__(self, table: "Table", window: _GroupWindow):
        self._table, self._window = table, window

    def group_by(self, *exprs) -> "_WindowGroupedTable":
        keys = []
        for e in exprs:
            keys.extend(_split_top_level(e) if isinstance(e, str) else [e])
        return _WindowGroupedTable(self._table, self._window, keys)


class _WindowGroupedTable:
    def __init__(self, table: "Table", window: _GroupWindow, keys: list):
        self._table, self._window, self._keys = table, window, keys

    def select(self, *exprs) -> "Table":
        w = self._window
        df = self._table._df.withColumn(w.alias, w.window_col())
        group_cols = [
            F.col(w.alias) if k == w.alias else (k if isinstance(k, Column) else F.col(k))
            for k in self._keys
        ]
        parts: list[Column | str] = []
        for e in exprs:
            parts.extend(_split_top_level(e) if isinstance(e, str) else [e])
        final, aggs = _plan_agg_select(df, parts)
        grouped = df.groupBy(*group_cols)
        out = grouped.agg(*aggs) if aggs else grouped.count()
        return Table(out.select(*final), self._table._env)


class Table:
    """pyflink.table.Table surface over a DataFrame (Table.java analogue)."""

    def __init__(self, df: DataFrame, env: "TableEnvironment" | None = None):
        self._df = df
        self._env = env

    # -- projection / filter (Table.java select/filter/where) --------------
    def select(self, *exprs) -> "Table":
        return Table(self._df.select(*_to_cols(exprs)), self._env)

    def filter(self, predicate) -> "Table":
        p = predicate if isinstance(predicate, Column) else F.expr(_rewrite(predicate))
        return Table(self._df.filter(p), self._env)

    where = filter

    def alias(self, name: str) -> "Table":
        return Table(self._df.alias(name), self._env)

    def add_columns(self, *exprs) -> "Table":
        df = self._df
        return Table(df.select("*", *_to_cols(exprs)), self._env)

    def add_or_replace_columns(self, *exprs) -> "Table":
        df = self._df
        for c in _to_cols(exprs):
            name = df.select(c).columns[0]
            df = df.withColumn(name, c)
        return Table(df, self._env)

    def rename_columns(self, *renames: str) -> "Table":
        """``rename_columns("a as b", ...)`` (Table.renameColumns)."""
        df = self._df
        for r in renames:
            for part in _split_top_level(r):
                old, new = re.split(r"\s+as\s+", part, flags=re.I)
                df = df.withColumnRenamed(old.strip(), new.strip())
        return Table(df, self._env)

    def drop_columns(self, *cols_: str) -> "Table":
        return Table(self._df.drop(*cols_), self._env)

    # -- aggregation (Table.groupBy/distinct/aggregate) ---------------------
    def group_by(self, *keys) -> "_GroupedTable":
        return _GroupedTable(self, keys)

    def distinct(self) -> "Table":
        return Table(self._df.distinct(), self._env)

    # -- joins (Table.join/leftOuterJoin/.../fullOuterJoin:403-520) ---------
    def _join(self, right: "Table", on, how: str) -> "Table":
        cond = on if on is None or isinstance(on, Column) else F.expr(_rewrite(on))
        return Table(self._df.join(right._df, cond, how), self._env)

    def join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "inner")

    def left_outer_join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "left")

    def right_outer_join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "right")

    def full_outer_join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "full")

    def cross_join(self, right: "Table") -> "Table":
        return Table(self._df.crossJoin(right._df), self._env)

    def join_lateral(self, udtf_expr: str, on=None) -> "Table":
        """Table.joinLateral:403 — lateral table-function apply; the UDTF
        expression must be an explode/posexplode/inline call."""
        c = F.expr(_rewrite(udtf_expr))
        return Table(self._df.select("*", c), self._env)

    # -- set ops (Table.java union:554/minus:523/intersect:584) -------------
    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct(), self._env)

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df), self._env)

    def minus(self, other: "Table") -> "Table":
        # SQL EXCEPT (pyflink/table/table.py:408): distinct left rows not
        # in right — subtract(), NOT exceptAll().distinct() (which keeps a
        # left row even when it also appears in right: [a,a,b]-[a] must
        # be [b], not [a,b]).
        return Table(self._df.subtract(other._df), self._env)

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df), self._env)

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df), self._env)

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df), self._env)

    # -- sort / fetch (Table.orderBy:622/offset:642/fetch:660) --------------
    def order_by(self, *exprs) -> "Table":
        cols_: list[Column] = []
        for e in exprs:
            for part in _split_top_level(e) if isinstance(e, str) else [e]:
                if isinstance(part, str):
                    # PyFlink sort idiom: "amount.desc" / "amount.asc"
                    m = re.fullmatch(r"(.+)\.(desc|asc)", part.strip(), re.I)
                    if m:
                        c = F.expr(_rewrite(m.group(1)))
                        cols_.append(c.desc() if m.group(2).lower() == "desc" else c.asc())
                    else:
                        cols_.append(F.expr(_rewrite(part)))
                else:
                    cols_.append(part)
        return Table(self._df.orderBy(*cols_), self._env)

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n), self._env)

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n), self._env)

    def limit(self, n: int) -> "Table":
        return self.fetch(n)

    # -- windows (Table.window(): GroupWindow + OVER) -----------------------
    def window(self, window: _GroupWindow) -> _WindowedTable:
        return _WindowedTable(self, window)

    def over_column(self, name: str, agg: Column, over: Over) -> "Table":
        """OVER window projection (Table.java over windows; PyFlink
        Over.partitionBy...): adds ``name`` = agg over the spec."""
        return Table(self._df.withColumn(name, agg.over(over.spec())), self._env)

    # -- row-level map/flatMap (Table.map:938/flatMap:964) ------------------
    def map(self, *exprs) -> "Table":
        return self.select(*exprs)

    def flat_map(self, udtf_expr: str) -> "Table":
        return Table(self._df.select(F.expr(_rewrite(udtf_expr))), self._env)

    # -- materialization (pyflink Table.to_pandas:915 / execute) ------------
    def to_pandas(self):
        return self._df.toPandas()

    def execute(self) -> DataFrame:
        return self._df

    def explain(self, mode: str = "formatted") -> str:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self._df.explain(mode)
        return buf.getvalue()

    def get_schema(self):
        return self._df.schema

    def print_schema(self) -> None:
        self._df.printSchema()

    def to_data_frame(self) -> DataFrame:
        """Escape hatch to the native Spark DataFrame."""
        return self._df


class _GroupedTable:
    def __init__(self, table: Table, keys: tuple):
        self._table = table
        self._keys = _to_cols(keys)

    def select(self, *exprs) -> Table:
        parts: list[Column | str] = []
        for e in exprs:
            parts.extend(_split_top_level(e) if isinstance(e, str) else [e])
        final, aggs = _plan_agg_select(self._table._df, parts)
        grouped = self._table._df.groupBy(*self._keys)
        out = grouped.agg(*aggs) if aggs else grouped.count()
        return Table(out.select(*final), self._table._env)

    def aggregate(self, *aggs) -> Table:
        return Table(
            self._table._df.groupBy(*self._keys).agg(*_to_cols(aggs)),
            self._table._env,
        )

    def flat_aggregate(self, fn, output_type: str) -> Table:
        """TableAggregateFunction surface (pyflink Table.flat_aggregate:860,
        GroupedTable equivalent): ``fn(key_tuple, pdf) -> pdf`` may emit
        ANY number of rows per group (e.g. a top-2 emitter) — strictly
        more general than ``aggregate``'s one row. Runs on
        ``applyInPandas`` over the grouped table."""
        return Table(
            self._table._df.groupBy(*self._keys).applyInPandas(
                fn, schema=output_type
            ),
            self._table._env,
        )


# Aggregate detection matches *function invocations* (name followed by an
# open paren at a word boundary), never bare identifiers — a column named
# ``var_rate`` or ``min_value`` is a projection, while ``percentile(x, .5)``
# is an aggregate even though the old repr-substring list missed it.
_AGG_FNS = (
    "sum|avg|mean|min|max|count|count_if|first|last|first_value|last_value|"
    "any_value|stddev|stddev_samp|stddev_pop|std|variance|var_samp|var_pop|"
    "collect_list|collect_set|array_agg|approx_count_distinct|"
    "percentile|percentile_approx|approx_percentile|median|mode|"
    "corr|covar_samp|covar_pop|skewness|kurtosis|min_by|max_by|"
    "bool_and|bool_or|every|some|bit_and|bit_or|bit_xor|listagg|"
    "regr_count|regr_avgx|regr_avgy|regr_slope|regr_intercept|regr_r2|"
    "grouping|grouping_id|sum_distinct|count_distinct|hll_sketch_agg"
)
_AGG_CALL = re.compile(rf"\b(?:{_AGG_FNS})\s*\(", re.I)


def _is_agg(c: Column | str) -> bool:
    # For Column objects the repr embeds the expression text
    # (Column<'sum(amount)'>); for strings we test the expression itself.
    s = c if isinstance(c, str) else repr(c)
    return bool(_AGG_CALL.search(s))


def _plan_agg_select(df: DataFrame, parts: list) -> tuple[list[Column], list[Column]]:
    """Split a PyFlink-style select list into (final projection, agg list).

    Aggregate expressions run inside ``groupBy().agg()``; the final
    projection then references them by their planned output name (probed
    via a zero-row ``df.select`` — Catalyst names, no execution).
    """
    final: list[Column] = []
    aggs: list[Column] = []
    for p in parts:
        c = F.expr(_rewrite(p)) if isinstance(p, str) else p
        if _is_agg(c):
            out_name = df.select(c).columns[0]
            aggs.append(c)
            final.append(F.col(f"`{out_name}`"))
        else:
            final.append(c)
    return final, aggs


# ---------------------------------------------------------------------------
# TableEnvironment
# ---------------------------------------------------------------------------

class TableEnvironment:
    """pyflink.table.TableEnvironment surface (table_environment.py:
    sql_query:798, execute_sql:821, from_pandas:1453)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @staticmethod
    def create(spark: SparkSession | None = None) -> "TableEnvironment":
        if spark is None:
            from flink_spark.session import get_spark

            spark = get_spark("table_env")
        return TableEnvironment(spark)

    # -- source construction ------------------------------------------------
    def from_elements(self, elements: Iterable, schema=None) -> Table:
        return Table(self.spark.createDataFrame(list(elements), schema=schema), self)

    def from_pandas(self, pdf, schema=None) -> Table:
        return Table(self.spark.createDataFrame(pdf, schema=schema), self)

    def from_path(self, path: str) -> Table:
        return Table(self.spark.table(path), self)

    def from_data_stream(self, df: DataFrame) -> Table:
        """from_data_stream:1708 — a (streaming) DataFrame IS the stream."""
        return Table(df, self)

    def from_changelog_stream(
        self, df: DataFrame, keys: list[str], order_by: list
    ) -> Table:
        """from_changelog_stream:1817 — interpret a +I/-U/+U/-D `row_kind`
        stream as a table: the changelog is normalized to its current
        state (newest surviving version per key, by ``order_by``)."""
        from flink_spark.changelog import changelog_normalize

        return Table(changelog_normalize(df, keys, order_by), self)

    def to_changelog_stream(self, table: Table) -> DataFrame:
        """to_changelog_stream:1910 — emit the table as an insert-only
        changelog (`+I` per row; an updating table's retractions exist
        only in continuous mode, which micro-batch emission subsumes)."""
        from pyspark.sql import functions as F

        return table._df.withColumn("row_kind", F.lit("+I"))

    # -- SQL ----------------------------------------------------------------
    def sql_query(self, sql: str) -> Table:
        return Table(self.spark.sql(sql), self)

    def execute_sql(self, sql: str) -> DataFrame:
        """execute_sql:821 — Flink-dialect DDL (CREATE TABLE with
        WATERMARK/computed columns, CREATE VIEW, DROP) is handled by the
        DDL front-end (flink_spark/ddl.py, Parser.tdd:53-57); everything
        else goes straight to Spark SQL."""
        from flink_spark.ddl import execute_ddl

        handled = execute_ddl(self.spark, sql)
        if handled is not None:
            return handled
        return self.spark.sql(sql)

    def create_temporary_view(self, name: str, table: Table | DataFrame) -> None:
        df = table._df if isinstance(table, Table) else table
        df.createOrReplaceTempView(name)

    def drop_temporary_view(self, name: str) -> bool:
        return self.spark.catalog.dropTempView(name)

    def list_tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]
