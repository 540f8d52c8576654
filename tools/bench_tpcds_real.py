"""Benchmark the REAL TPC-DS query texts at sf1 fact volume.

The correctness corpus (benchdata/tpcds) is ~sf0.07; this tool runs a
representative subset of the verbatim benchmark texts against
``benchdata/tpcds_sf1`` (fact_scale=15 → 2.92M store_sales rows — real
TPC-DS sf1's fact volume, the scale the reference's batch gate uses:
test_tpcds.sh SCALE="1") in BOTH engines: Spark via the registry
entries, DuckDB via the generated oracle SQL (same text, same parquet).
Warm min-of-2 each, one JSON line out.

Usage: python tools/bench_tpcds_real.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "1")  # "1" -> fact_scale 15, "10" -> 150
_FACT_SCALE = {"1": 15, "10": 150}[_SCALE]
SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
# must be set before flink_spark.queries_tpcds_real binds TPCDS_DIR
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF1_DIR
# the reference's --useTableStats analogue: catalog tables + column
# stats + CBO join reorder (q72 needs the DP reorder at fact volume)
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

import duckdb  # noqa: E402

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.tpcds_data import generate  # noqa: E402

# star family + the hard families the reference's gate stresses
QIDS = [
    "3", "7", "19", "42", "55", "68", "34", "73",   # star
    "4", "11", "74",                                  # year-over-year CTE
    "14a", "23a",                                     # cross-channel CTE reuse
    "72",                                             # 9-relation inventory join
    "67",                                             # rollup + rank
    "95",                                             # reachability semi-joins
    "78",                                             # three-channel anti-join
    "50", "93",                                       # returns joins
]


def _ensure_sf1() -> None:
    mf = os.path.join(SF1_DIR, "_MANIFEST")
    try:
        ok = open(mf).read().strip().endswith(f"@{_FACT_SCALE}")
    except OSError:
        ok = False
    if not ok:
        print(f"# generating fact-volume corpus (fact_scale={_FACT_SCALE})...",
              file=sys.stderr)
        generate(SF1_DIR, fact_scale=_FACT_SCALE)


def tmin(fn, runs=2):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    _ensure_sf1()
    spark = get_spark(app_name="flink_spark_tpcds_real_bench")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")

    spark_s: dict[str, float] = {}
    duck_s: dict[str, float] = {}
    for qid in QIDS:
        name = f"tpcds_real_q{qid}"
        fn = Q.QUERIES[name]
        spark_s[qid] = tmin(lambda: fn(spark, "/root/testdata/sf0.01").toPandas())
        sql = Q.ORACLE[name]
        duck_s[qid] = tmin(lambda: con.execute(sql).fetchall())
        print(
            f"# q{qid}: spark {spark_s[qid]:.3f}s duckdb {duck_s[qid]:.3f}s "
            f"ratio {spark_s[qid] / duck_s[qid]:.2f}",
            file=sys.stderr,
        )

    total_s, total_d = sum(spark_s.values()), sum(duck_s.values())
    out = {
        "metric": f"tpcds_real_sf{_SCALE}_wall",
        "value": round(total_s, 3),
        "unit": "sec",
        "sf": f"{_SCALE} (fact volume: {_FACT_SCALE}x the correctness corpus)",
        "queries": {f"q{k}": v for k, v in spark_s.items()},
        "oracle_s": {f"q{k}": v for k, v in duck_s.items()},
        "ratio": {
            f"q{k}": round(spark_s[k] / duck_s[k], 2) for k in spark_s
        },
        "headline_ratio": round(total_s / total_d, 3),
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
