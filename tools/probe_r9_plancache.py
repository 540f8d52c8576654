"""Round-9 probe #2 (VERDICT r8 task #3): the optimized-plan-cache
lever on the unmet <=2x real-text gate.

The r7 analyzed-plan cache serves repeat texts via
``_fresh_execution(spark, analyzed)`` — Dataset.ofRows over the cached
ANALYZED plan. That is a NEW QueryExecution per run (deliberate: new
RDDs, no cross-run stage/shuffle reuse), so the Catalyst optimizer +
CBO join reorder re-run on every timed run. The candidate feeds
Dataset.ofRows the OPTIMIZED plan instead: analysis is a pass-through
on a resolved plan and the optimizer re-reaches fixed-point quickly,
while physical planning, AQE, and execution stay completely fresh
(same honesty properties as today).

Per representative mid-band query at sf10 fact volume (stats mode):
  analyzed_s  — min-of-5 _fresh_execution(analyzed).toPandas()
                (the engine's CURRENT cached-run path)
  optimized_s — min-of-5 _fresh_execution(optimized).toPandas()
                (the candidate), row-identity asserted vs analyzed
  floor_s     — min-of-5 spark.range(1).toPandas()

analyzed_s - optimized_s = per-run optimizer constant the candidate
banks. Projected over the ~60 mid-band sweep rows → the suite saving;
if small, the remaining constant is scheduling and the gate is
floor-bound (write the acceptance derivation, stop re-litigating).

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r9_plancache.py
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

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
import flink_spark.queries_tpcds_real as R  # noqa: E402

# mid-band + floor-family representatives (sub-2 s rows where the
# constant is 15-40% of the row) + one heavy row as a control
MID = ["55", "3", "42", "52", "91", "30", "58", "8", "21", "41", "2", "5"]


def _t(fn, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="flink_spark_probe_r9_plancache")
    Q.QUERIES["tpcds_real_q96"](spark, "x").toPandas()  # JVM + stats warm
    floor_s = _t(lambda: spark.range(1).toPandas())
    out = {}
    for qid in MID:
        name = f"tpcds_real_q{qid}"
        Q.QUERIES[name](spark, "x").toPandas()  # populate _plan_cache
        ckey = (id(spark), qid, R.TPCDS_DIR, R.USE_TABLE_STATS)
        analyzed = R._plan_cache[ckey]
        optimized = (
            R._fresh_execution(spark, analyzed)
            ._jdf.queryExecution().optimizedPlan()
        )
        # row-identity gate — normalized like the engine's own oracle
        # compare (floats to 11 significant digits: double SUM
        # accumulation order differs run-to-run, so exact-float compare
        # fails on q2's ratio columns even between two ANALYZED runs)
        def _norm(df):
            def cell(v):
                return f"{v:.11g}" if isinstance(v, float) else str(v)
            return sorted(
                tuple(cell(v) for v in row)
                for row in df.itertuples(index=False)
            )

        a = _norm(R._fresh_execution(spark, analyzed).toPandas())
        b = _norm(R._fresh_execution(spark, optimized).toPandas())
        assert a == b, f"q{qid}: optimized-plan rows differ!"
        analyzed_s = _t(lambda: R._fresh_execution(spark, analyzed).toPandas())
        optimized_s = _t(lambda: R._fresh_execution(spark, optimized).toPandas())
        out[f"q{qid}"] = {
            "analyzed_s": round(analyzed_s, 4),
            "optimized_s": round(optimized_s, 4),
            "saving_s": round(analyzed_s - optimized_s, 4),
            "sched_above_floor_s": round(optimized_s - floor_s, 4),
        }
        print(f"# q{qid}: {json.dumps(out[f'q{qid}'])}", file=sys.stderr,
              flush=True)
    savings = [v["saving_s"] for v in out.values()]
    mean = sum(savings) / len(savings)
    print(json.dumps({
        "floor_s": round(floor_s, 4),
        "queries": out,
        "mean_saving_s": round(mean, 4),
        "projected_suite_saving_s_if_97_rows": round(mean * 97, 2),
    }))


if __name__ == "__main__":
    main()
