"""Round-10 probe #2: does rule #3's set-op collapse beat the shipped
q14a/q14b form?

Shipped (r8): each intersect arm is rewritten to `item WHERE i_item_sk
IN (fact semi)` (3 fact semi joins, then INTERSECT of item-sized sets),
plus _CTE_MATERIALIZE on cross_items/avg_sales.

Candidate: pop the pair rewrite and let rule #3 fire on the verbatim
text — the three-arm INTERSECT becomes one UNION ALL of the fact⋈item⋈
date projections grouped to (brand, class, category) flags (the tuple
domain is item-bounded, so the group-by is map-side-combinable), still
under the same CTE materialization.

Fresh-session interleaved A/B, sweep-cold (1 untimed warm + min-of-3),
row identity asserted at fact volume first.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r10_q14.py [out.json]
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

PAIRS = {q: R._SPARK_REWRITE[q] for q in ("14a", "14b")}


def _recycle(spark):
    if spark is not None:
        spark.stop()
    R._stats_ready.clear()
    R._dfs.clear()
    R._cte_cache.clear()
    R._plan_cache.clear()
    R._views_cleared.clear()
    R._fixture_customer.clear()
    return get_spark(app_name="flink_spark_probe_r10_q14")


def _set(arm: str) -> None:
    if arm == "shipped":
        R._SPARK_REWRITE.update(PAIRS)
    else:  # rule3: no pair rewrite -> rule #3 auto-fires in _run_real
        R._SPARK_REWRITE.pop("14a", None)
        R._SPARK_REWRITE.pop("14b", None)
    R._plan_cache.clear()


def _rows(spark, qid):
    df = Q.QUERIES[f"tpcds_real_q{qid}"](spark, "x")
    return sorted(
        tuple("NULL" if v is None else str(v) for v in r)
        for r in df.toPandas().itertuples(index=False)
    )


def _time(spark, qid, runs=3):
    fn = Q.QUERIES[f"tpcds_real_q{qid}"]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, "x").toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = _recycle(None)
    for qid in ("14a", "14b"):
        _set("shipped")
        a = _rows(spark, qid)
        _set("rule3")
        b = _rows(spark, qid)
        assert a == b, f"q{qid}: shipped vs rule3 row sets differ!"
    print("# row-identity gates passed", file=sys.stderr)

    out = {f"{arm}_{q}": [] for arm in ("shipped", "rule3")
           for q in ("14a", "14b")}
    for trial in range(3):
        for arm in ("shipped", "rule3"):
            _set(arm)
            spark = _recycle(spark)
            for qid in ("14a", "14b"):
                Q.QUERIES[f"tpcds_real_q{qid}"](spark, "x").toPandas()
                t = _time(spark, qid)
                out[f"{arm}_{qid}"].append(round(t, 3))
                print(f"# trial {trial} {arm} q{qid}: {t:.3f}",
                      file=sys.stderr, flush=True)
    _set("shipped")  # restore shipped state
    res = {"trials": out, "min": {k: min(v) for k, v in out.items()}}
    line = json.dumps(res)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
