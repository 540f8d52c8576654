"""Probe q50/q93 plans at sf10 fact volume (the two scale-regressing
returns-join rows in BENCH_TPCDS_REAL_r05_sf10.json: 20.0x / 14.6x).

Both share a mechanism: a date-/reason-filtered store_returns is tiny
(~33k rows at sf10) but Spark shuffles the 29.2M-row store_sales side
anyway. This prints the optimized + physical plans in stats mode so we
can see whether CBO (a) reorders the filtered dim onto store_returns
first and (b) broadcasts the filtered intermediate.

Usage: python tools/probe_q50_q93.py [sf] [qids...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "10"
QIDS = sys.argv[2:] or ["50", "93"]
os.environ["SPARK_GRAFT_TPCDS_DIR"] = f"/root/repo/benchdata/tpcds_sf{SF}"
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402

spark = get_spark(app_name="probe_q50_q93")
for qid in QIDS:
    name = f"tpcds_real_q{qid}"
    df = Q.QUERIES[name](spark, "/root/testdata/sf0.01")
    print(f"\n================ {name} (sf{SF}) ================")
    df.explain("formatted")
    df.count()  # warm
    t0 = time.perf_counter()
    df.count()
    print(f"# {name} warm wall: {time.perf_counter() - t0:.3f}s")
