from __future__ import annotations

import math
import os

import duckdb
import pytest

from flink_spark.catalog import TABLES
from flink_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


_ACTIVE_SESSION: dict = {}


@pytest.fixture(autouse=True, scope="module")
def _drain_session_state():
    """r12 (VERDICT r11 task #2): the suite's later streaming tests ran
    up to 10× slower in-suite than isolated (124 s vs ~10 s). The
    session accumulates storage blocks across ~960 tests — 6 persist()
    sites and 20 localCheckpoint() sites in the engine create cached
    RDD/DF blocks that only a Python gc + ContextCleaner round-trip
    reclaims. Drop them at every module boundary: clearCache() for
    persisted DataFrames, gc.collect() so py4j finalizers release
    checkpointed RDDs for the ContextCleaner."""
    yield
    s = _ACTIVE_SESSION.get("spark")
    if s is None:
        return
    try:
        s.catalog.clearCache()
    except Exception:
        pass
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="flink_spark_tests",
        shuffle_partitions=8,
        # r12 (VERDICT r11 task #2 — make the full suite fit the driver's
        # verify window): a list-backed createDataFrame fans local rows
        # into defaultParallelism (= 32 here) Python partitions, and the
        # tests' pervasive `.coalesce(1).write` then evaluates all 32
        # through the Python worker SEQUENTIALLY in one task (~170 ms
        # per partition attach ≈ 5 s per tiny fixture write — measured).
        # Two slices keep the same code paths at fixture scale.
        extra_conf={"spark.default.parallelism": "2"},
    )
    _ACTIVE_SESSION["spark"] = s
    yield s


@pytest.fixture(autouse=True)
def _isolate_state_store_provider(request):
    """transformWithState operators switch the session to the RocksDB
    state-store provider and (correctly) never switch it back — but in a
    session-scoped suite that makes every LATER streaming test pay
    RocksDB's per-batch provider init/snapshot for state the HDFS-backed
    default serves fine (the 174 s vs 52 s in-suite/isolated gap of
    test_stream_count_trigger_purges_closed_windows, r12). Restore the
    provider conf after each test so only tests that need RocksDB use it."""
    if "spark" not in request.fixturenames:
        yield
        return
    s = request.getfixturevalue("spark")
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = s.conf.get(key)
    except Exception:
        prev = None
    yield
    try:
        if prev is None:
            s.conf.unset(key)
        else:
            s.conf.set(key, prev)
    except Exception:
        pass


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 11 significant digits: strict enough to catch the cross-engine
        # float drift the driver's value-hash flags (real bugs differ way
        # above 1e-11 relative), loose enough to absorb diffs past double
        # precision on large magnitudes. Was 12g; r5's exact-integer q1
        # sum landed on a 12g half-way tie (…2745 exact vs …27449995
        # double-accumulated — 1 ulp apart) that string-rounds apart at
        # 12 digits. The driver itself rounds floats to 2dp.
        return f"{v:.11g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows — the same
    order-insensitive compare the driver applies."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def assert_matches_oracle(spark_df, ddb_con, oracle_sql: str, name: str = "?"):
    import pandas as pd

    sp = spark_df.toPandas()
    du = ddb_con.execute(oracle_sql).df()
    s_rows = normalize([tuple(r) for r in sp.itertuples(index=False)], list(sp.columns))
    d_rows = normalize([tuple(r) for r in du.itertuples(index=False)], list(du.columns))
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch {sorted(sp.columns)} vs {sorted(du.columns)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:5]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only: {diff_s}\n oracle-only: {diff_d}"
        )
