"""q81/q77 sf10 decomposition probe (VERDICT r7 task #9 / wrong #4).

The two ~1 s sf10 rows >7x without current-code notes. For each: wall
(min-of-2 through the engine's real path, plan cache included),
planning-vs-execution split, and a final-AQE-plan audit (scan counts
per table + ReusedExchange presence) — the q2/q5 treatment. Findings
land as BASELINE.md rows.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_q81_q77.py
"""

from __future__ import annotations

import json
import os
import re
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

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
import flink_spark.queries_tpcds_real as R  # noqa: E402


def _final_plan(df) -> str:
    """Executed-plan text, final AQE section only (the toString
    double-prints '== Initial Plan ==' after execution — split first)."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    return txt.split("== Initial Plan ==")[0]


def main() -> None:
    spark = get_spark(app_name="probe_q81_q77")
    out = {}
    for qid in ("81", "77"):
        name = f"tpcds_real_q{qid}"
        fn = Q.QUERIES[name]
        fn(spark, "/root/testdata/sf0.01").toPandas()  # warm (fills plan cache)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, "/root/testdata/sf0.01").toPandas()
            best = min(best, time.perf_counter() - t0)
        # planning vs execution split on a FRESH text parse (the cached
        # path skips analysis; this isolates what the constant would be)
        R._register_tpcds(spark)
        text = R._TPCDS_REAL[qid][0]
        t0 = time.perf_counter()
        df = spark.sql(text)
        df._jdf.queryExecution().optimizedPlan()
        plan_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.toPandas()
        exec_s = time.perf_counter() - t0
        plan = _final_plan(df)
        scans = {}
        for m in re.finditer(r"Scan parquet[^\[]*\.(\w+)\[", plan):
            scans[m.group(1)] = scans.get(m.group(1), 0) + 1
        out[f"q{qid}"] = {
            "wall_min2_s": round(best, 3),
            "plan_s": round(plan_s, 3),
            "exec_s": round(exec_s, 3),
            "scans": scans,
            "reused_exchange": plan.count("ReusedExchange"),
            "reused_subquery": plan.count("ReusedSubquery"),
        }
        print(f"# q{qid}: {out[f'q{qid}']}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": _SCALE, **out}))


if __name__ == "__main__":
    main()
