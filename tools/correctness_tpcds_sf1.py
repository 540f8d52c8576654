"""Hash-checked correctness sweep of ALL 103 real TPC-DS query texts at
sf1 FACT VOLUME — the reference's own gate scale (test_tpcds.sh:22
SCALE="1"; answer-set comparison TpcdsResultComparator.java:53).

The driver's CORRECTNESS window pins these texts at ~sf0.01 only;
volume-dependent wrongness (decimal overflow on bigger sums, spill
paths, stats-mode plan divergence) is invisible there. This tool runs
every query against benchdata/tpcds_sf1 (fact_scale=15 → real sf1 fact
row counts) in BOTH engines with the driver's own comparison
discipline: sort columns by name, normalize (floats → round 2dp,
timestamps → isoformat, None → "NULL"), sort rows, compare sets.

Usage: python tools/correctness_tpcds_sf1.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", "tpcds_sf1",
)
# must be set before flink_spark.queries_tpcds_real binds TPCDS_DIR
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF1_DIR
# run the correctness sweep in the same mode the perf numbers use —
# a stats-mode plan divergence is precisely what we want to catch
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

import duckdb  # noqa: E402

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.queries_tpcds_real import _TPCDS_REAL  # noqa: E402
from flink_spark.tpcds_data import generate  # noqa: E402

FACT_SCALE = 15


def _ensure() -> None:
    mf = os.path.join(SF1_DIR, "_MANIFEST")
    try:
        ok = open(mf).read().strip().endswith(f"@{FACT_SCALE}")
    except OSError:
        ok = False
    if not ok:
        print(f"# generating fact-volume corpus (fact_scale={FACT_SCALE})...",
              file=sys.stderr)
        generate(SF1_DIR, fact_scale=FACT_SCALE)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v, 2):.2f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def main() -> None:
    _ensure()
    spark = get_spark(app_name="flink_spark_tpcds_sf1_correctness")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")

    results: dict[str, dict] = {}
    fails: list[str] = []
    t_start = time.perf_counter()
    for qid in sorted(_TPCDS_REAL, key=lambda s: (len(s), s)):
        name = f"tpcds_real_q{qid}"
        rec: dict = {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "spark_rows": None,
            "oracle_rows": None, "err": None,
        }
        try:
            sp = Q.QUERIES[name](spark, SF1_DIR).toPandas()
            du = con.execute(Q.ORACLE[name]).df()
            rec["spark_rows"], rec["oracle_rows"] = len(sp), len(du)
            rec["rows_match"] = len(sp) == len(du)
            rec["schema_match"] = sorted(sp.columns) == sorted(du.columns)
            if rec["schema_match"]:
                order = sorted(sp.columns)
                s_rows = sorted(
                    tuple(_norm(x) for x in r)
                    for r in sp[order].itertuples(index=False)
                )
                d_rows = sorted(
                    tuple(_norm(x) for x in r)
                    for r in du[order].itertuples(index=False)
                )
                rec["hash_match"] = s_rows == d_rows
                if not rec["hash_match"]:
                    so = [r for r in s_rows if r not in set(d_rows)][:2]
                    do = [r for r in d_rows if r not in set(s_rows)][:2]
                    rec["err"] = f"value mismatch; spark_only={so} oracle_only={do}"
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            fails.append(name)
        results[name] = rec
        print(f"# {name}: {'OK' if ok else 'FAIL'} "
              f"spark={rec['spark_rows']} oracle={rec['oracle_rows']}",
              file=sys.stderr, flush=True)

    summary = {
        "sf": "tpcds sf1 fact volume (fact_scale=15)",
        "stats_mode": os.environ.get("SPARK_GRAFT_TPCDS_STATS"),
        "n": len(results),
        "n_green": len(results) - len(fails),
        "fails": fails,
        "wall_s": round(time.perf_counter() - t_start, 1),
    }
    out = {"_summary": summary, **results}
    line = json.dumps(out, indent=1)
    print(json.dumps(summary))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
