"""Quick verification harness for the ADVICE r10 fixes: the two repros
must now DECLINE (rule returns None), the legitimate demo shapes must
still FIRE, and firing shapes must still be row-identical in DuckDB."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flink_spark.rewrite_rules import (
    channel_exists_to_union_flags,
    self_exists_distinct_to_groupwise,
)

SCHEMAS = {
    "outer_t": {"k": "int", "flag": "int"},
    "t1": {"x": "int", "p": "int"},
    "t2": {"x": "int", "p": "int"},
    "fact": {"k": "int", "w": "int"},
}


def columns_of(t):
    s = SCHEMAS.get(t)
    return set(s) if s else None


def types_of(t, c):
    s = SCHEMAS.get(t)
    return s.get(c) if s else None


con = duckdb.connect()
con.execute("create table outer_t as select * from (values (NULL, 1), (2, 1), (3, 0)) v(k, flag)")
con.execute("create table t1 as select * from (values (2, 1), (3, 1)) v(x, p)")
con.execute("create table t2 as select * from (values (2, 1),) v(x, p)")
con.execute("create table fact as select * from (values (1, 5), (1, 6), (2, 7)) v(k, w)")

failures = []


def check(name, sql, rule, should_fire, *rule_args):
    out = rule(sql, *rule_args)
    if should_fire != (out is not None):
        failures.append(f"{name}: expected fire={should_fire}, got {out!r}")
        return
    if out is not None:
        a = sorted(map(tuple, con.execute(sql).fetchall()))
        b = sorted(map(tuple, con.execute(out).fetchall()))
        if a != b:
            failures.append(f"{name}: REWRITE CHANGES RESULT\n  orig={a}\n  rewr={b}\n  sql={out}")


# --- ADVICE high: rule #2 under NOT(...) must decline ---
check(
    "r2_not_paren",
    "select k, flag from outer_t where not (flag = 1"
    " and exists (select * from t1 where x = k and p = 1)"
    " and exists (select * from t2 where x = k and p = 1))",
    channel_exists_to_union_flags, False, columns_of, types_of,
)
# --- ADVICE high: `(p and E1 and E2) is false` context must decline ---
check(
    "r2_is_false",
    "select k, flag from outer_t where (flag = 1"
    " and exists (select * from t1 where x = k and p = 1)"
    " and exists (select * from t2 where x = k and p = 1)) is false",
    channel_exists_to_union_flags, False, columns_of, types_of,
)
# --- rule #2 inside a CASE arm must decline ---
check(
    "r2_case_when",
    "select k, case when flag = 1"
    " and exists (select * from t1 where x = k and p = 1)"
    " and exists (select * from t2 where x = k and p = 1)"
    " then 1 else 0 end f from outer_t",
    channel_exists_to_union_flags, False, columns_of, types_of,
)
# --- legitimate top-level conjunct still fires and matches ---
check(
    "r2_plain",
    "select k, flag from outer_t where flag >= 0"
    " and exists (select * from t1 where x = k and p = 1)"
    " and exists (select * from t2 where x = k and p = 1)",
    channel_exists_to_union_flags, True, columns_of, types_of,
)
# --- legitimate with earlier IS NULL conjunct (the gate must not
#     over-decline: IS inside a COMPLETE earlier conjunct is harmless) ---
check(
    "r2_prior_is_null",
    "select k, flag from outer_t where flag is not null"
    " and exists (select * from t1 where x = k and p = 1)"
    " and exists (select * from t2 where x = k and p = 1)",
    channel_exists_to_union_flags, True, columns_of, types_of,
)
# --- legitimate OR-wrapped region after AND still fires ---
check(
    "r2_or_wrapped",
    "select k, flag from outer_t where flag = 1"
    " and (exists (select * from t1 where x = k and p = 1)"
    " or exists (select * from t2 where x = k and p = 1))",
    channel_exists_to_union_flags, True, columns_of, types_of,
)
# --- region in a subquery's WHERE still fires ---
check(
    "r2_subquery_where",
    "select * from (select k from outer_t where flag = 1"
    " and exists (select * from t1 where x = k and p = 1)"
    " and exists (select * from t2 where x = k and p = 1)) s",
    channel_exists_to_union_flags, True, columns_of, types_of,
)

# --- ADVICE medium: rule #4 derived-table alias shadow must decline ---
check(
    "r4_derived_alias",
    "select t1.k, t1.w from (select k, w + 1 as w from fact t1) t1"
    " where exists (select * from fact t2"
    " where t1.k = t2.k and t1.w <> t2.w)",
    self_exists_distinct_to_groupwise, False, columns_of,
)
# --- legitimate bare self-ref still fires and matches ---
check(
    "r4_plain",
    "select t1.k, t1.w from fact t1"
    " where exists (select * from fact t2"
    " where t1.k = t2.k and t1.w <> t2.w)",
    self_exists_distinct_to_groupwise, True, columns_of,
)
# --- rule #4 under NOT(...) must decline too (same scope gate) ---
check(
    "r4_not_paren",
    "select t1.k from fact t1 where not (t1.w > 0"
    " and exists (select * from fact t2"
    " where t1.k = t2.k and t1.w <> t2.w))",
    self_exists_distinct_to_groupwise, False, columns_of,
)

if failures:
    print("FAIL")
    for f in failures:
        print(" -", f)
    sys.exit(1)
print("all checks passed")
