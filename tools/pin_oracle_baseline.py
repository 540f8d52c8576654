"""Pin the DuckDB oracle baseline (VERDICT r7 task #3).

The sf1/sf10 sweep ratio moved ±0.4 between same-day runs on identical
code because BOTH sides were re-measured live and the DuckDB
denominator rolls with machine load (r7: 2.79 / 3.25 / 3.24 across
three recordings). This tool records ONE quiet-machine min-of-N DuckDB
run per query per scale into ORACLE_BASELINE.json; tpcds_sweep.py then
quotes Spark seconds against the pinned denominator (keeping its live
re-measure as a secondary column), so the ≤2x gate conversation stops
moving on oracle rolls.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/pin_oracle_baseline.py
       (run once per scale; results merge into ORACLE_BASELINE.json)
ORACLE_PIN_RUNS=N (default 3): timed runs per query, min recorded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "1")
_FACT_SCALE = {"1": 15, "10": 150}[_SCALE]
SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF_DIR

import duckdb  # noqa: E402

from flink_spark import queries as Q  # noqa: E402
from flink_spark.queries_tpcds_real import _TPCDS_REAL  # noqa: E402
from flink_spark.tpcds_data import generate  # noqa: E402

RUNS = int(os.environ.get("ORACLE_PIN_RUNS", "3"))
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ORACLE_BASELINE.json",
)


def main() -> None:
    mf = os.path.join(SF_DIR, "_MANIFEST")
    try:
        ok = open(mf).read().strip().endswith(f"@{_FACT_SCALE}")
    except OSError:
        ok = False
    if not ok:
        print(f"# generating corpus (fact_scale={_FACT_SCALE})...", file=sys.stderr)
        generate(SF_DIR, fact_scale=_FACT_SCALE)

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    pinned: dict[str, float] = {}
    for qid in sorted(_TPCDS_REAL, key=lambda s: (len(s), s)):
        sql = Q.ORACLE[f"tpcds_real_q{qid}"]
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        pinned[f"q{qid}"] = round(best, 4)
        print(f"# q{qid}: {best:.3f}s", file=sys.stderr, flush=True)

    try:
        doc = json.load(open(OUT))
    except (OSError, json.JSONDecodeError):
        doc = {}
    doc[f"sf{_SCALE}"] = {
        "oracle_s": pinned,
        "total_s": round(sum(pinned.values()), 3),
        "runs": RUNS,
        "fact_scale": _FACT_SCALE,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({
        "pinned": f"sf{_SCALE}", "n_queries": len(pinned),
        "total_s": doc[f"sf{_SCALE}"]["total_s"],
    }))


if __name__ == "__main__":
    main()
