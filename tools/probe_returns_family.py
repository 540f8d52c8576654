"""Measure the remaining returns-join family (q17 q24a q25 q29 q64 q85)
at fact volume, to decide which get the _SPARK_REWRITE key packing.

Usage: python tools/probe_returns_family.py [sf] [qids...]
Prints warm min-of-2 per query (Spark side only — the decision input
is Spark's own before/after delta, not the DuckDB ratio).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "10"
QIDS = sys.argv[2:] or ["17", "24a", "25", "29", "64", "85"]
os.environ["SPARK_GRAFT_TPCDS_DIR"] = f"/root/repo/benchdata/tpcds_sf{SF}"
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402

spark = get_spark(app_name="probe_returns_family")
for qid in QIDS:
    name = f"tpcds_real_q{qid}"
    df = Q.QUERIES[name](spark, "/root/testdata/sf0.01")
    df.count()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.count()
        best = min(best, time.perf_counter() - t0)
    print(f"# {name} sf{SF} warm: {best:.3f}s")
