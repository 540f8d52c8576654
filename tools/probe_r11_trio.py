"""Round-11 probe (VERDICT r10 task #1): decompose the q17/q47/q75
calm-window 'regressions'.

r9 mins: q17 1.200 / q47 1.477 / q75 1.817.
r10 calm recording (TPCDS_SWEEP_r10_sf10d): 1.575 / 1.977 / 2.726.

There is NO code delta that can touch these rows: git diff r9..r10 on
the TPC-DS path shows only per-query changes (q14a/b rule-3 ship, q24a
repack) plus rule recognition that runs at PLAN BUILD (the sweep times
once-warm through the plan cache) and fires on none of the trio. So
the hypothesis space is purely environmental:
  A. cross-round container drift — fresh-session mins here return to
     ~r9 levels (<= r9min + 0.2 s);
  B. something stateful outside the repo (page cache, JIT, cgroup) —
     mins stay high even in a calm window with clean anchors.

Design: fresh session per (query, trial), queries interleaved so drift
hits all three equally, sweep condition (1 untimed warm + min-of-3
timed through the plan cache), 3 trials, Spark-floor + per-query live
DuckDB oracle anchors so the window label rides the artifact.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r11_trio.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "10")
SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF_DIR
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

import duckdb  # noqa: E402

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
import flink_spark.queries_tpcds_real as R  # noqa: E402

TRIO = ("17", "47", "75")
R9_MIN = {"17": 1.200, "47": 1.477, "75": 1.817}


def _recycle(spark):
    if spark is not None:
        spark.stop()
    R._stats_ready.clear()
    R._dfs.clear()
    R._cte_cache.clear()
    R._plan_cache.clear()
    R._views_cleared.clear()
    R._fixture_customer.clear()
    return get_spark(app_name="flink_spark_probe_r11_trio")


def _floor(spark, runs=5):
    for _ in range(3):
        spark.range(1).count()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    spark = _recycle(None)
    floor_pre = _floor(spark)

    out: dict[str, list[float]] = {q: [] for q in TRIO}
    oracle: dict[str, list[float]] = {q: [] for q in TRIO}
    for trial in range(3):
        for qid in TRIO:
            spark = _recycle(spark)
            fn = Q.QUERIES[f"tpcds_real_q{qid}"]
            fn(spark, "x").toPandas()  # warm (plan build outside timer)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, "x").toPandas()
                best = min(best, time.perf_counter() - t0)
            out[qid].append(round(best, 3))
            sql = Q.ORACLE[f"tpcds_real_q{qid}"]
            con.execute(sql).fetchall()
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            oracle[qid].append(round(time.perf_counter() - t0, 3))
            print(f"# trial {trial} q{qid}: spark {best:.3f}s "
                  f"oracle {oracle[qid][-1]:.3f}s", file=sys.stderr,
                  flush=True)
    floor_post = _floor(spark)
    spark.stop()
    res = {
        "trials": out,
        "oracle_trials": oracle,
        "min": {q: min(v) for q, v in out.items()},
        "r9_min": R9_MIN,
        "verdict_bar": {q: round(R9_MIN[q] + 0.2, 3) for q in TRIO},
        "within_bar": {q: min(out[q]) <= R9_MIN[q] + 0.2 for q in TRIO},
        "anchor": {"spark_floor_pre_s": floor_pre,
                   "spark_floor_post_s": floor_post,
                   "spark_floor_calm_reference_s": 0.125,
                   "oracle_min_s": {q: min(v) for q, v in oracle.items()}},
    }
    line = json.dumps(res)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
