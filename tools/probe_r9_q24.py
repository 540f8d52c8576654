"""Round-9 probe #1 (VERDICT r8 task #2): decompose q24b's
probe-vs-sweep gap (r8 probe 2.75 s vs r8 sweep 3.61 s) and its
regression vs r7 (2.61 s).

Hypothesis A — sweep position: q24b is query #101 of the 103-query
sweep, i.e. the FIRST query after the n_done==100 session recycle
(tools/tpcds_sweep.py RECYCLE_EVERY=25). Its timed runs ride a cold
JVM (C2 JIT, codegen caches, shuffle/broadcast infrastructure all
cold) while the r8 probe measured it mid-session. q24a (#100) runs
LAST in a 25-query-warm session — which would explain why the pair's
sweep times converged (3.53/3.61) while their probed times differ.

Hypothesis B — the r8 xxhash64 packed-key rewrite is a loss under
sweep conditions (interacting with the CTE materialization).

Design: one process, conditions interleaved per trial so container
drift hits all arms equally.
  coldA  — fresh session, 1 warm + min-of-3 q24b, CURRENT code
  coldB  — fresh session, 1 warm + min-of-3 q24b, UNPACKED keys
  warmA  — same sessions, after 5 mixed warm queries, CURRENT code
  warmB  — ditto, UNPACKED
Row sets asserted identical (packed vs unpacked) before timing.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r9_q24.py
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

PACKED_24B = R._SPARK_REWRITE.get("24b")
WARMUP_QIDS = ["3", "42", "52", "55", "96"]  # cheap star-joins


def _recycle(spark):
    if spark is not None:
        spark.stop()
    R._stats_ready.clear()
    R._dfs.clear()
    R._cte_cache.clear()
    R._plan_cache.clear()
    R._views_cleared.clear()
    R._fixture_customer.clear()
    return get_spark(app_name="flink_spark_probe_r9_q24")


def _rows(spark, qid):
    df = Q.QUERIES[f"tpcds_real_q{qid}"](spark, "/root/testdata/sf0.01")
    return sorted(map(tuple, df.toPandas().itertuples(index=False)))


def _time(spark, qid, runs=3):
    fn = Q.QUERIES[f"tpcds_real_q{qid}"]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, "/root/testdata/sf0.01").toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = _recycle(None)
    # row-identity gate: packed vs unpacked on the live corpus
    a = _rows(spark, "24b")
    R._SPARK_REWRITE.pop("24b", None)
    R._plan_cache.clear()
    b = _rows(spark, "24b")
    assert a == b, "packed vs unpacked q24b row sets differ!"
    R._SPARK_REWRITE["24b"] = PACKED_24B
    print("# row-identity gate passed", file=sys.stderr)

    out = {"cold_packed": [], "cold_unpacked": [],
           "warm_packed": [], "warm_unpacked": []}
    for trial in range(3):
        for packed in (True, False):
            if packed:
                R._SPARK_REWRITE["24b"] = PACKED_24B
            else:
                R._SPARK_REWRITE.pop("24b", None)
            spark = _recycle(spark)
            # COLD: mimic sweep position 101 — fresh session, one
            # untimed warm (the sweep's warm run), then min-of-3.
            Q.QUERIES["tpcds_real_q24b"](spark, "x").toPandas()
            cold = _time(spark, "24b")
            # WARM: mimic the r8 probe — 5 mixed queries first.
            for w in WARMUP_QIDS:
                Q.QUERIES[f"tpcds_real_q{w}"](spark, "x").toPandas()
            warm = _time(spark, "24b")
            k = "packed" if packed else "unpacked"
            out[f"cold_{k}"].append(round(cold, 3))
            out[f"warm_{k}"].append(round(warm, 3))
            print(f"# trial {trial} {k}: cold {cold:.3f} warm {warm:.3f}",
                  file=sys.stderr, flush=True)
    R._SPARK_REWRITE["24b"] = PACKED_24B
    summary = {k: min(v) for k, v in out.items()}
    print(json.dumps({"trials": out, "min": summary}))


if __name__ == "__main__":
    main()
