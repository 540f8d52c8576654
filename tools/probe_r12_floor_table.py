"""r12 (VERDICT r11 task #8): per-query floor decomposition for the most
expensive untouched headline rows.

For each query: count the Spark jobs one warm run schedules (via a job
group + statusTracker), measure the per-job scheduling floor in the same
session, and compute the floor-subtracted ratio

    (spark_warm_min - n_jobs * floor) / duckdb_warm_min

against a live same-process DuckDB run of the oracle SQL. A row whose
floor-subtracted ratio is ~1 is scheduling-floor-bound at this SF — the
per-query proof VERDICT asked for in place of the aggregate
floor-adjusted number bench.py already emits.

Usage: python tools/probe_r12_floor_table.py [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import bench  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "tpcds_q49_shape",
    "tpcds_q19_shape",
    "tpcds_q72_shape",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
]


def _floor(spark, runs=5):
    for _ in range(3):
        spark.range(1).count()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    names = sys.argv[2:] or DEFAULT
    sf_dir = bench._resolve_sf_dir()
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="probe_r12_floor_table")
    sc = spark.sparkContext
    con = bench._duckdb_conn(sf_dir, threads)

    floor_pre = _floor(spark)
    rows = {}
    for name in names:
        fn = Q.QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best, n_jobs = float("inf"), None
        for i in range(3):
            gid = f"floor_probe_{name}_{i}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
            if dt < best:
                best, n_jobs = dt, jobs
        sql = Q.ORACLE[name]
        con.execute(sql).fetchall()  # warm
        obest = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            obest = min(obest, time.perf_counter() - t0)
        rows[name] = {
            "spark_s": round(best, 3),
            "n_jobs": n_jobs,
            "oracle_s": round(obest, 3),
        }
        print(f"# {name}: spark {best:.3f}s jobs {n_jobs} "
              f"oracle {obest:.3f}s", file=sys.stderr, flush=True)
    floor_post = _floor(spark)
    floor = min(floor_pre, floor_post)
    for name, r in rows.items():
        adj = max(r["spark_s"] - r["n_jobs"] * floor, 0.0)
        r["floor_budget_s"] = round(r["n_jobs"] * floor, 3)
        r["ratio_raw"] = round(r["spark_s"] / r["oracle_s"], 2)
        r["ratio_floor_subtracted"] = round(adj / r["oracle_s"], 2)
    res = {
        "sf_dir": sf_dir,
        "floor_s": round(floor, 4),
        "anchor": {
            "spark_floor_pre_s": round(floor_pre, 3),
            "spark_floor_post_s": round(floor_post, 3),
            "spark_floor_calm_reference_s": 0.125,
        },
        "rows": rows,
    }
    spark.stop()
    line = json.dumps(res)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
