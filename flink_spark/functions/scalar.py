"""Flink scalar-function surface → Spark expressions.

The reference defines ~185 built-in functions
(flink-table/flink-table-common/.../functions/BuiltInFunctionDefinitions.java)
plus ~240 SQL operators
(flink-table/flink-table-planner/.../functions/sql/FlinkSqlOperatorTable.java).
Nearly all are same-name Spark built-ins (SURVEY.md §2.8); this module
provides only the shims where the name or semantics differ. Everything
here stays JVM-side (no Python UDFs) so whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_index(col: Column | str, delimiter: str, index: int) -> Column:
    """Flink SPLIT_INDEX(str, sep, index) — 0-based, NULL when out of range.

    Reference: FlinkSqlOperatorTable.java:386. F.get is NULL-safe on
    out-of-bounds, matching Flink's behavior.
    """
    return F.get(F.split(F.col(col) if isinstance(col, str) else col, delimiter), index)


def is_decimal(col: Column) -> Column:
    """Flink IS_DECIMAL (FlinkSqlOperatorTable.java:276): parseable as a number."""
    return col.cast("string").rlike(r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?\s*$")


def is_digit(col: Column) -> Column:
    """Flink IS_DIGIT: every character is a digit (FlinkSqlOperatorTable.java:285)."""
    return col.cast("string").rlike(r"^[0-9]+$")


def is_alpha(col: Column) -> Column:
    """Flink IS_ALPHA: every character is a letter (FlinkSqlOperatorTable.java:294)."""
    return col.cast("string").rlike(r"^[A-Za-z]+$")


def hash_code(col: Column) -> Column:
    """Flink HASH_CODE (FlinkSqlOperatorTable.java:424) → Spark murmur hash.

    Note: the concrete hash values differ (Java String.hashCode vs
    Murmur3); parity is "a deterministic 32-bit hash", not bit equality.
    """
    return F.hash(col)


def to_base64(col: Column) -> Column:
    return F.base64(col)


def from_base64(col: Column) -> Column:
    return F.unbase64(col)


def truncate(col: Column, scale: int = 0) -> Column:
    """Flink TRUNCATE(numeric, int): truncate toward zero to `scale` decimals.

    Spark's trunc() is date-only, so compose it: sign(x)*floor(abs(x)*p)/p.
    """
    p = F.lit(10.0) ** F.lit(scale)
    return F.signum(col) * F.floor(F.abs(col) * p) / p


def rand_integer(bound: int, seed: int | None = None) -> Column:
    """Flink RAND_INTEGER(bound): uniform int in [0, bound)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * bound).cast("int")


def str_to_map(col: Column, pair_delim: str = ",", kv_delim: str = "=") -> Column:
    """Flink STR_TO_MAP (FlinkSqlOperatorTable.java:262) → same-name Spark fn."""
    return F.str_to_map(col, F.lit(pair_delim), F.lit(kv_delim))


def listagg(col: Column, sep: str = ",", *, distinct: bool = False, sorted_: bool = True) -> Column:
    """Flink LISTAGG aggregate (BuiltInFunctionDefinitions.java) as a composition.

    Deterministic by default: collect → sort → join. At scale this is a
    single-pass aggregate (collect_list is a partial-merge agg); the sort
    is per-group on the final value.
    """
    collected = F.collect_set(col) if distinct else F.collect_list(col)
    if sorted_:
        collected = F.sort_array(collected)
    return F.array_join(collected, sep)


def json_value(col: Column, path: str) -> Column:
    """Flink JSON_VALUE (BuiltInFunctionDefinitions.java:1883ff) → get_json_object."""
    return F.get_json_object(col, path)


def parse_url(col: Column, part: str, key: str | None = None) -> Column:
    """Flink PARSE_URL (FlinkSqlOperatorTable.java:539) → same-name Spark fn."""
    if key is not None:
        return F.parse_url(col, F.lit(part), F.lit(key))
    return F.parse_url(col, F.lit(part))


def json_query(col: Column, path: str) -> Column:
    """Flink JSON_QUERY (BuiltInFunctionDefinitions.java:1906) — returns the
    JSON TEXT of an array/object at ``path`` (vs JSON_VALUE's scalar).
    Spark's get_json_object already serializes non-scalar hits minified."""
    return F.get_json_object(col, path)


def json_exists(col: Column, path: str) -> Column:
    """Flink JSON_EXISTS (BuiltInFunctionDefinitions.java:1883): TRUE iff
    ``path`` resolves in the document (FALSE ON ERROR default)."""
    return F.get_json_object(col, path).isNotNull()


def is_json(col: Column) -> Column:
    """Flink IS JSON predicate (BuiltInFunctionDefinitions.java:1967):
    TRUE iff the string parses as JSON — Spark 4's try_parse_json
    returns NULL (not an error) on malformed input."""
    return F.try_parse_json(col).isNotNull()


def json_value_default(col: Column, path: str, default: str) -> Column:
    """JSON_VALUE(... DEFAULT d ON EMPTY / ON ERROR): get_json_object is
    NULL both for a missing path (EMPTY) and a malformed document
    (ERROR), so one coalesce covers Flink's two default clauses."""
    return F.coalesce(F.get_json_object(col, path), F.lit(default))


def overlay(col: Column, replace: str, pos: int, length: int | None = None) -> Column:
    """Flink OVERLAY(s PLACING r FROM p [FOR l]) → Spark same-name fn;
    FOR omitted replaces len(r) characters (both engines' default)."""
    if length is None:
        return F.overlay(col, F.lit(replace), F.lit(pos))
    return F.overlay(col, F.lit(replace), F.lit(pos), F.lit(length))


def encode_utf8(col: Column) -> Column:
    """Flink ENCODE(string, charset) → Spark encode (binary out)."""
    return F.encode(col, "utf-8")


def decode_utf8(col: Column) -> Column:
    """Flink DECODE(binary, charset) → Spark decode (string out)."""
    return F.decode(col, "utf-8")


def temporal_overlaps(
    s1: Column, e1: Column, s2: Column, e2: Column
) -> Column:
    """Flink temporalOverlaps / SQL (s1, e1) OVERLAPS (s2, e2)
    (BuiltInFunctionDefinitions.java `temporalOverlaps`): true when the
    two periods share any instant. Spark SQL has no OVERLAPS row syntax;
    this is the closed-endpoint (inclusive) interval test Calcite's
    convertOverlaps emits. Flink first normalizes each (timePoint, end)
    pair so lo <= hi before comparing — a caller passing a reversed
    period gets the same answer as Flink here."""
    lo1, hi1 = F.least(s1, e1), F.greatest(s1, e1)
    lo2, hi2 = F.least(s2, e2), F.greatest(s2, e2)
    return (lo1 <= hi2) & (lo2 <= hi1)
