"""Scaling study: the same headline queries at sf=1 and sf=10, both
engines, warm min-of-2 — measuring how wall-clock grows with data
(the slope), which is the evidence the 100 TB claim rests on:

- compute-bound queries should scale ~linearly (slope ≈ 10 on 10× data)
  while the fixed job floor stays constant (its share → 0);
- DuckDB scales on the same slope, so the per-query RATIO should hold
  or improve where Spark's parallelism dominates.

Usage: python tools/scale_study.py [out.json]
Writes one JSON with per-query {sf1_s, sf10_s, slope} per engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from flink_spark import queries as Q  # noqa: E402
from flink_spark.catalog import TABLES  # noqa: E402
from flink_spark.session import get_spark  # noqa: E402

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpcds_q19_shape",
    "tvf_hop_2h_1h",
    "over_range_time_frame",
    "doc_token_stats",
    "doc_minhash_lsh_pairs",
    "emb_cosine_topk",
    "agg_count_distinct",
    # r5: the weak-watch rows the r4 verdict asked to extend the study to
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "tpcds_q4_shape",
    "tpcds_q49_shape",
    "tpcds_q72_shape",
    "tvf_tumble_daily",
    # r5: the new Gopher repetition tier (n-gram hash aggregates)
    "doc_gopher_quality",
    "doc_top_bigram_frac",
    "doc_dup_5gram_frac",
    # r6 (VERDICT r5 #10): the two newest heavy LLM entries had
    # sf1-only ratios; plus the classifier after its vocab-tier fix
    "doc_dup_groups",
    "doc_dup_span_coverage",
    "doc_quality_classifier",
]

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata")
SFS = {"sf1": os.path.join(BASE, "sf1"), "sf10": os.path.join(BASE, "sf10")}


def time_min(fn, runs=2):
    fn()  # warm-up
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    # optional subset: argv[2:] names restrict the run (addendum mode)
    global QUERIES
    if len(sys.argv) > 2:
        QUERIES = [n for n in QUERIES if n in sys.argv[2:]]
    out: dict = {"queries": {}}
    spark = get_spark(app_name="scale_study")
    spark.sparkContext.setLogLevel("ERROR")
    spark_t: dict[str, dict[str, float]] = {}
    for sf, d in SFS.items():
        for name in QUERIES:
            t = time_min(lambda: Q.QUERIES[name](spark, d).count())
            spark_t.setdefault(name, {})[sf] = t
            print(f"# spark {sf} {name}: {t}s", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()

    duck_t: dict[str, dict[str, float]] = {}
    for sf, d in SFS.items():
        con = duckdb.connect()
        con.execute(f"SET threads = {os.cpu_count() or 8}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
            )
        for name in QUERIES:
            sql = Q.ORACLE[name]
            tt = time_min(lambda: con.execute(sql).fetchall())
            duck_t.setdefault(name, {})[sf] = tt
            print(f"# duckdb {sf} {name}: {tt}s", file=sys.stderr)
        con.close()

    for name in QUERIES:
        s1, s10 = spark_t[name]["sf1"], spark_t[name]["sf10"]
        d1, d10 = duck_t[name]["sf1"], duck_t[name]["sf10"]
        out["queries"][name] = {
            "spark_sf1_s": s1, "spark_sf10_s": s10,
            "spark_slope": round(s10 / s1, 2) if s1 else None,
            "duckdb_sf1_s": d1, "duckdb_sf10_s": d10,
            "duckdb_slope": round(d10 / d1, 2) if d1 else None,
            "ratio_sf1": round(s1 / d1, 2) if d1 else None,
            "ratio_sf10": round(s10 / d10, 2) if d10 else None,
        }
    dst = sys.argv[1] if len(sys.argv) > 1 else "SCALE_STUDY_r05.json"
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
