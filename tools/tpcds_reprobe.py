"""Min-of-N re-probe of named real-TPC-DS queries at fact volume — the
straggler filter VERDICT r5 #3 asks for before grading a sweep row as a
real plan problem (the once-warm sweep's q12 "59x" collapsed to 0.68 s
on re-probe). Both engines, same corpus, min of N timed runs each.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/tpcds_reprobe.py [out.json] q2 q5 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "10")
_FACT_SCALE = {"1": 15, "10": 150}[_SCALE]
SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF_DIR
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

import duckdb  # noqa: E402

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.tpcds_data import generate  # noqa: E402

RUNS = int(os.environ.get("TPCDS_REPROBE_RUNS", "2"))


def _ensure() -> None:
    mf = os.path.join(SF_DIR, "_MANIFEST")
    try:
        ok = open(mf).read().strip().endswith(f"@{_FACT_SCALE}")
    except OSError:
        ok = False
    if not ok:
        print(f"# generating corpus (fact_scale={_FACT_SCALE})...", file=sys.stderr)
        generate(SF_DIR, fact_scale=_FACT_SCALE)


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    if args and args[0].endswith(".json"):
        out_path, args = args[0], args[1:]
    qids = [a.lstrip("q") for a in args] or ["2", "5", "8", "16", "24a", "65", "94"]

    _ensure()
    spark = get_spark(app_name="tpcds_reprobe")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")

    rows = {}
    for qid in qids:
        name = f"tpcds_real_q{qid}"
        fn = Q.QUERIES[name]
        fn(spark, "/root/testdata/sf0.01").toPandas()  # warm
        s_best = min(
            (lambda t0=time.perf_counter(): (
                fn(spark, "/root/testdata/sf0.01").toPandas(),
                time.perf_counter() - t0)[1])()
            for _ in range(RUNS)
        )
        sql = Q.ORACLE[name]
        con.execute(sql).fetchall()  # warm
        d_best = min(
            (lambda t0=time.perf_counter(): (
                con.execute(sql).fetchall(), time.perf_counter() - t0)[1])()
            for _ in range(RUNS)
        )
        rows[f"q{qid}"] = {
            "spark_s": round(s_best, 3),
            "duckdb_s": round(d_best, 3),
            "ratio": round(s_best / max(d_best, 1e-9), 2),
        }
        print(f"# q{qid}: spark {s_best:.3f}s duckdb {d_best:.3f}s "
              f"ratio {s_best / max(d_best, 1e-9):.2f}", file=sys.stderr, flush=True)

    out = {"metric": f"tpcds_real_reprobe_sf{_SCALE}", "runs": RUNS, "rows": rows}
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
