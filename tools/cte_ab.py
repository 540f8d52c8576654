"""Interleaved A/B of the opt-in CTE materialization rule at sf10 fact
volume: 3 alternating (inline, materialized) pairs per query, report
medians — robust to the container's run-to-run drift.
Run: python3 tools/cte_ab.py [qids...]"""
import statistics
import sys, os, time, traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_TPCDS_DIR"] = "/root/repo/benchdata/tpcds_sf10"
os.environ["SPARK_GRAFT_TPCDS_STATS"] = "1"
from flink_spark.session import get_spark
from flink_spark import queries as Q
import flink_spark.queries_tpcds_real as R

spark = get_spark(app_name="cte_ab2")


def once(qid):
    fn = Q.QUERIES[f"tpcds_real_q{qid}"]
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.01").count()
    return time.perf_counter() - t0


CASES = {
    "1": ("customer_total_return",),
    "30": ("customer_total_return",),
    "81": ("customer_total_return",),
}
only = set(sys.argv[1:])
for qid, ctes in CASES.items():
    if only and qid not in only:
        continue
    try:
        R._CTE_MATERIALIZE.clear()
        once(qid)  # warm both data + codegen
        R._CTE_MATERIALIZE[qid] = ctes
        once(qid)
        base, mat = [], []
        for _ in range(3):
            R._CTE_MATERIALIZE.clear()
            base.append(once(qid))
            R._CTE_MATERIALIZE[qid] = ctes
            mat.append(once(qid))
        b, m = statistics.median(base), statistics.median(mat)
        print(
            f"AB q{qid}: inline {b:.3f}s {[round(x,2) for x in base]}  "
            f"materialized {m:.3f}s {[round(x,2) for x in mat]}  "
            f"delta {100*(m-b)/b:+.0f}%",
            flush=True,
        )
    except Exception:
        print(f"AB q{qid}: FAILED", flush=True)
        traceback.print_exc()
R._CTE_MATERIALIZE.clear()
