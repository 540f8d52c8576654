"""Round-10 probe (VERDICT r9 task #1): decompose the q24a regression.

r8 sweep: ~2.7 s (packed xxhash64 keys + CTE-materialized ssales).
r9 sweep: 3.83 s min across two (window-degraded) recordings, after the
q24 packing revert — which was A/B'd on q24b ONLY (tools/probe_r9_q24.py
measured unpacked faster in all three cold trials for q24b); q24a was
reverted alongside without its own fresh-session A/B, and r8's original
probe had read the pack "neutral-to-better" for q24a (2.97 -> 2.66).

Hypotheses:
  A. the packing revert hurt q24a specifically (pack back = win);
  B. both r9 recordings rode the degraded window and current-unpacked
     is fine (arms tie in a calm window).

Design: fresh session per arm-trial, arms interleaved so container
drift hits both equally, sweep-cold condition (1 untimed warm +
min-of-3), row identity asserted before timing. A Spark-floor anchor
is recorded pre/post so the window label rides the artifact.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r10_q24a.py [out.json]
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

# the r8 pack, reverted in r9 (commit c06854e): ssales' ss ⋈ sr on the
# composite (ticket, item) through the materialized CTE build
PACK_24A = (
    (
        "where ss_ticket_number = sr_ticket_number",
        "where xxhash64(ss_ticket_number, ss_item_sk)"
        " = xxhash64(sr_ticket_number, sr_item_sk)\n"
        "  and ss_ticket_number - sr_ticket_number = 0",
    ),
    ("and ss_item_sk = sr_item_sk", "and ss_item_sk - sr_item_sk = 0"),
)


def _recycle(spark):
    if spark is not None:
        spark.stop()
    R._stats_ready.clear()
    R._dfs.clear()
    R._cte_cache.clear()
    R._plan_cache.clear()
    R._views_cleared.clear()
    R._fixture_customer.clear()
    return get_spark(app_name="flink_spark_probe_r10_q24a")


def _rows(spark):
    df = Q.QUERIES["tpcds_real_q24a"](spark, "/root/testdata/sf0.01")
    return sorted(map(tuple, df.toPandas().itertuples(index=False)))


def _time(spark, runs=3):
    fn = Q.QUERIES["tpcds_real_q24a"]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, "x").toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def _floor(spark, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = _recycle(None)
    floor_pre = _floor(spark)
    # row-identity gate on the live corpus
    a = _rows(spark)
    R._SPARK_REWRITE["24a"] = PACK_24A
    R._plan_cache.clear()
    b = _rows(spark)
    R._SPARK_REWRITE.pop("24a", None)
    assert a == b, "packed vs unpacked q24a row sets differ!"
    print("# row-identity gate passed", file=sys.stderr)

    out = {"cold_unpacked": [], "cold_packed": []}
    for trial in range(3):
        for packed in (False, True):
            if packed:
                R._SPARK_REWRITE["24a"] = PACK_24A
            else:
                R._SPARK_REWRITE.pop("24a", None)
            spark = _recycle(spark)
            Q.QUERIES["tpcds_real_q24a"](spark, "x").toPandas()  # warm
            cold = _time(spark)
            k = "packed" if packed else "unpacked"
            out[f"cold_{k}"].append(round(cold, 3))
            print(f"# trial {trial} {k}: {cold:.3f}", file=sys.stderr,
                  flush=True)
    R._SPARK_REWRITE.pop("24a", None)  # leave shipped state (unpacked)
    floor_post = _floor(spark)
    res = {
        "trials": out,
        "min": {k: min(v) for k, v in out.items()},
        "anchor": {"spark_floor_pre_s": floor_pre,
                   "spark_floor_post_s": floor_post,
                   "spark_floor_calm_reference_s": 0.125},
    }
    line = json.dumps(res)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
