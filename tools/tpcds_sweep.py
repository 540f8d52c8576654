"""Sweep ALL 103 real TPC-DS query texts at fact volume — plan-pathology
hunter. The 19-query bench (bench_tpcds_real.py) covers the named
families; this sweep times every query once-warm in both engines so
scale-regressing plans outside the bench set (like q72's pre-CBO
item-only inventory join, or q50/q93's composite-key probe cliff) have
nowhere to hide.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/tpcds_sweep.py [out.json]
TPCDS_SWEEP_RUNS=N (default 2, r6): timed runs per engine per query,
min reported — the straggler guard the r5 once-warm sweep lacked (its
q12 "59x" collapsed to 0.68 s on re-probe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "1")
_FACT_SCALE = {"1": 15, "10": 150}[_SCALE]
SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF1_DIR
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

import duckdb  # noqa: E402

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.queries_tpcds_real import _TPCDS_REAL  # noqa: E402
from flink_spark.tpcds_data import generate  # noqa: E402


def _ensure() -> None:
    mf = os.path.join(SF1_DIR, "_MANIFEST")
    try:
        ok = open(mf).read().strip().endswith(f"@{_FACT_SCALE}")
    except OSError:
        ok = False
    if not ok:
        print(f"# generating fact-volume corpus (fact_scale={_FACT_SCALE})...",
              file=sys.stderr)
        generate(SF1_DIR, fact_scale=_FACT_SCALE)


RUNS = int(os.environ.get("TPCDS_SWEEP_RUNS", "2"))


# Recycle the Spark session every N queries: a single local-mode JVM
# degrades over 100+ queries x RUNS timed executions (accumulated
# broadcast blocks / shuffle litter / plan-cache growth) — the r6
# min-of-2 sweep measured q14a at 28.9 s late in a 206-run session vs
# 5.3 s in a fresh one. Recycling keeps every row a steady-state
# measurement; restart wall-clock is outside the per-query timers.
RECYCLE_EVERY = int(os.environ.get("TPCDS_SWEEP_RECYCLE", "25"))


def _spark_floor(spark, runs: int = 5) -> float:
    """Empty-compute job round trip (min of runs, after untimed warms
    — a fresh session's first jobs pay codegen/JIT and overstate the
    floor by 0.05-0.1 s) — the Spark-side quietness anchor: calm
    recordings read ~0.12 s, Spark-penalized container windows 0.2+ s
    while DuckDB is unaffected (r9)."""
    for _ in range(3):
        spark.range(1).count()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    _ensure()
    spark = get_spark(app_name="flink_spark_tpcds_sweep")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    floor_pre = _spark_floor(spark)

    spark_s: dict[str, float] = {}
    duck_s: dict[str, float] = {}
    n_jobs: dict[str, int] = {}
    n_done = 0
    for qid in sorted(_TPCDS_REAL, key=lambda s: (len(s), s)):
        if n_done and n_done % RECYCLE_EVERY == 0:
            spark.stop()
            import flink_spark.queries_tpcds_real as _R
            _R._stats_ready.clear()  # tables persist; re-USE the stats db
            _R._dfs.clear()
            _R._cte_cache.clear()
            _R._plan_cache.clear()  # plans are bound to the dead session
            _R._views_cleared.clear()
            _R._fixture_customer.clear()
            spark = get_spark(app_name="flink_spark_tpcds_sweep")
            print(f"# session recycled after {n_done} queries", file=sys.stderr)
        n_done += 1
        name = f"tpcds_real_q{qid}"
        fn = Q.QUERIES[name]
        fn(spark, "/root/testdata/sf0.01").toPandas()  # warm
        best = float("inf")
        for i in range(RUNS):
            # r12 (VERDICT r11 task #4): count the jobs each timed run
            # schedules so the floor decomposition (n_jobs × measured
            # per-job floor) is per-query and judge-checkable.
            gid = f"sweep_{qid}_{i}"
            spark.sparkContext.setJobGroup(gid, name)
            t0 = time.perf_counter()
            fn(spark, "/root/testdata/sf0.01").toPandas()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            if dt < best:
                best = dt
                n_jobs[qid] = len(
                    spark.sparkContext.statusTracker().getJobIdsForGroup(gid)
                )
        spark_s[qid] = round(best, 3)
        sql = Q.ORACLE[name]
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck_s[qid] = round(best, 3)
        print(
            f"# q{qid}: spark {spark_s[qid]:.3f}s duckdb {duck_s[qid]:.3f}s "
            f"ratio {spark_s[qid] / max(duck_s[qid], 1e-9):.2f}",
            file=sys.stderr, flush=True,
        )

    floor_post = _spark_floor(spark)
    total_s, total_d = sum(spark_s.values()), sum(duck_s.values())
    # floor-subtracted composite: per-query max(spark - n_jobs*floor, 0)
    floor = min(floor_pre, floor_post)
    adj_total = sum(
        max(spark_s[k] - n_jobs.get(k, 0) * floor, 0.0) for k in spark_s
    )
    worst = sorted(
        spark_s, key=lambda q: spark_s[q] / max(duck_s[q], 1e-9), reverse=True
    )[:10]
    # r8 (VERDICT r7 #3): the PRIMARY ratio uses the pinned quiet-machine
    # oracle baseline (ORACLE_BASELINE.json, tools/pin_oracle_baseline.py)
    # so the denominator cannot roll between runs; the live re-measure
    # stays as the secondary column.
    pinned: dict[str, float] = {}
    try:
        with open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ORACLE_BASELINE.json",
        )) as f:
            pinned = json.load(f).get(f"sf{_SCALE}", {}).get("oracle_s", {})
    except (OSError, json.JSONDecodeError):
        pass
    out = {
        "metric": f"tpcds_real_sweep_sf{_SCALE}",
        "value": round(total_s, 3),
        "unit": "sec",
        "n_queries": len(spark_s),
        "sf": f"{_SCALE} (fact volume: {_FACT_SCALE}x the correctness corpus)",
        "queries": {f"q{k}": v for k, v in spark_s.items()},
        "oracle_s": {f"q{k}": v for k, v in duck_s.items()},
        "headline_ratio": round(total_s / total_d, 3),
        "n_jobs": {f"q{k}": v for k, v in n_jobs.items()},
        "floor_s": round(floor, 4),
        "floor_subtracted_total_s": round(adj_total, 3),
        "floor_subtracted_ratio": round(adj_total / total_d, 3),
        "worst_ratio": {
            f"q{k}": round(spark_s[k] / max(duck_s[k], 1e-9), 2) for k in worst
        },
    }
    # Quietness anchor (r10, VERDICT r9 task #2): pre/post Spark floor
    # (detects Spark-penalized windows the oracle can't see) + live
    # oracle total vs the pinned calm-machine baseline (detects
    # both-slowed windows). The artifact carries its own window label.
    window = "calm"
    if max(floor_pre, floor_post) > 0.175:  # calm ~0.12-0.13 s
        window = "spark_penalized"
    out["anchor"] = {
        "spark_floor_pre_s": floor_pre,
        "spark_floor_post_s": floor_post,
        "spark_floor_calm_reference_s": 0.125,
        "oracle_live_total_s": round(total_d, 3),
        "window": window,
    }
    if pinned and all(f"q{k}" in pinned for k in spark_s):
        pinned_total = sum(pinned[f"q{k}"] for k in spark_s)
        out["headline_ratio_pinned"] = round(total_s / pinned_total, 3)
        out["oracle_pinned_total_s"] = round(pinned_total, 3)
        out["anchor"]["oracle_pinned_total_s"] = round(pinned_total, 3)
        if total_d > 1.2 * pinned_total:
            out["anchor"]["window"] = "box_degraded"
        worst_p = sorted(
            spark_s, key=lambda q: spark_s[q] / max(pinned[f"q{q}"], 1e-9),
            reverse=True,
        )[:10]
        out["worst_ratio_pinned"] = {
            f"q{k}": round(spark_s[k] / max(pinned[f"q{k}"], 1e-9), 2)
            for k in worst_p
        }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
