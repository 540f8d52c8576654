"""One-shot machine-quietness anchor: DuckDB oracle subset vs the
pinned calm baseline + the Spark empty-job floor. Prints one JSON line;
use before recording any perf artifact (memory note
container-perf-oscillates; r10 formalization of the protocol).

Usage: python tools/quiet_anchor.py [--no-spark]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(BASE, "benchdata", "tpcds_sf10")
# a fixed 8-query subset spanning scan/join/agg shapes, ~3.5 s pinned
SUBSET = ["q3", "q7", "q28", "q43", "q64", "q72", "q88", "q95"]


def main() -> None:
    import glob

    with open(os.path.join(BASE, "ORACLE_BASELINE.json")) as f:
        pinned = json.load(f)["sf10"]["oracle_s"]
    os.environ.setdefault("SPARK_GRAFT_TPCDS_DIR", CORPUS)
    from flink_spark import queries as Q  # noqa: E402
    import flink_spark.queries_tpcds_real  # noqa: F401,E402

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    for p in glob.glob(f"{CORPUS}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    live = {}
    for q in SUBSET:
        sql = Q.ORACLE[f"tpcds_real_{q}"]
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        live[q] = round(best, 3)
    live_total = sum(live.values())
    pin_total = sum(pinned[q] for q in SUBSET)
    out = {
        "oracle_live_s": round(live_total, 3),
        "oracle_pinned_s": round(pin_total, 3),
        "live_over_pinned": round(live_total / pin_total, 2),
    }
    if "--no-spark" not in sys.argv:
        from flink_spark.session import get_spark

        spark = get_spark(app_name="quiet_anchor")
        for _ in range(3):  # fresh-session first jobs overstate (JIT)
            spark.range(1).count()
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            spark.range(1).count()
            best = min(best, time.perf_counter() - t0)
        out["spark_floor_s"] = round(best, 3)
        out["spark_floor_calm_reference_s"] = 0.125
        spark.stop()
    out["window"] = (
        "box_degraded" if out["live_over_pinned"] > 1.2
        else "spark_penalized"
        if out.get("spark_floor_s", 0) > 0.175 else "calm"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
