"""Round-12 probe (VERDICT r11 task #3): decompose the sf10 q13/q79
Spark-only outliers.

r10e sweep recording: q13 1.496 s / q79 0.667 s.
r11 sweep recording:  q13 10.399 s / q79 4.008 s — while both queries'
DuckDB oracle times IMPROVED (q13 0.711→0.564), and no code change
touches either text (neither is in the rule library's firing set nor a
hand rewrite). Hypothesis space, exactly as the r11 trio decomposition
(tools/probe_r11_trio.py):
  A. container/window drift — fresh-session mins return to ~r10 levels
     (<= r10min + 0.3 s);
  B. a real plan pathology (e.g. lost filter pushdown on q13's 10-way
     OR-of-ANDs) — mins stay high in a calm window with clean anchors.

Design: fresh session per (query, trial), interleaved, 1 untimed warm
+ min-of-3 timed, 3 trials, Spark-floor + live DuckDB anchors.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r12_q13_q79.py [out.json]
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

PAIR = ("13", "79")
R10_MIN = {"13": 1.496, "79": 0.667}


def _recycle(spark):
    if spark is not None:
        spark.stop()
    R._stats_ready.clear()
    R._dfs.clear()
    R._cte_cache.clear()
    R._plan_cache.clear()
    R._views_cleared.clear()
    R._fixture_customer.clear()
    return get_spark(app_name="flink_spark_probe_r12_q13_q79")


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

    out: dict[str, list[float]] = {q: [] for q in PAIR}
    oracle: dict[str, list[float]] = {q: [] for q in PAIR}
    for trial in range(3):
        for qid in PAIR:
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
        "r10_min": R10_MIN,
        "drift_bar": {q: round(R10_MIN[q] + 0.3, 3) for q in PAIR},
        "within_bar": {q: min(out[q]) <= R10_MIN[q] + 0.3 for q in PAIR},
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
