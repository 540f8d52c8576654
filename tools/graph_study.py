"""Graph-tier scale recording (VERDICT r6 #3): re-measure the four
graph-driven entries at sf1 AFTER the r6 ≤2-actions/round restructure
and the r7 part-compaction fix — the 9.51× transitive-closure number on
file (SCALE_STUDY_r05_graph.json) was measured on the OLD 4-action loop
and is stale.

Usage: python tools/graph_study.py [out.json]
Same discipline as the r5 recording: warm once, min-of-2 timed, DuckDB
oracle on the same parquet with the same thread count.
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

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", "sf1",
)

NAMES = [
    "graph_transitive_closure",
    "graph_pagerank",
    "graph_triangles",
    "doc_dup_groups",  # LSH pairs -> connected components -> keeper
    "example_word_count",
]


def main() -> None:
    spark = get_spark(app_name="flink_spark_graph_study")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF1}/{t}.parquet'")
    out = {}
    for name in NAMES:
        fn = Q.QUERIES[name]
        rows = fn(spark, SF1).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF1).count()
            best = min(best, time.perf_counter() - t0)
        sql = Q.ORACLE[name]
        orows = len(con.execute(sql).fetchall())  # warm
        obest = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            obest = min(obest, time.perf_counter() - t0)
        out[name] = {
            "spark_s": round(best, 3),
            "duckdb_s": round(obest, 3),
            "ratio": round(best / max(obest, 1e-9), 2),
            "rows": rows,
            "oracle_rows": orows,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
