"""Scaffold runner for extending the real-TPC-DS query set.

For each requested query id: load the reference's verbatim text
(tpcds-tool/query/query{N}.sql — benchmark SQL, not engine code), run it
through spark.sql on the dsdgen-lite corpus, auto-derive canonical output
names + type-stabilizing casts from the result schema, build the DuckDB
oracle with the same wrapper queries_tpcds_real uses, and compare
normalized row sets. On PASS, emit a ready-to-paste entry literal to
tools/scaffold_out/q{id}.py.

Usage: python tools/tpcds_scaffold.py 6 8 10 ...
       python tools/tpcds_scaffold.py --all-pending
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

QDIR = (
    "/root/reference/flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query"
)
OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaffold_out")


def load_text(qid: str) -> str:
    with open(os.path.join(QDIR, f"query{qid}.sql")) as f:
        # strip trailing ';' — spark.sql rejects it
        return f.read().rstrip().rstrip(";")


def derive_names(fields) -> list[str]:
    names, seen = [], set()
    for f in fields:
        n = re.sub(r"[^a-z0-9_]+", "_", f.name.lower()).strip("_") or "col"
        if n[0].isdigit():
            n = "c_" + n
        base, k = n, 2
        while n in seen:
            n = f"{base}_{k}"
            k += 1
        seen.add(n)
        names.append(n)
    return names


def derive_casts(fields, names) -> dict[str, str]:
    casts = {}
    for f, n in zip(fields, names):
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            scale = int(t.rstrip(")").split(",")[1])
            casts[n] = "double6" if scale > 2 else "double"
        elif t in ("double", "float"):
            casts[n] = "double"
        elif t in ("bigint", "int", "smallint", "tinyint"):
            casts[n] = "bigint"
        elif t == "date":
            casts[n] = "string"
    return casts


def normalize(df: pd.DataFrame) -> set:
    df = df[sorted(df.columns)]
    rows = set()
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
                out.append("NULL")
            elif isinstance(v, float):
                out.append(f"{v:.2f}")
            else:
                out.append(str(v))
        rows.add(tuple(out))
    return rows


def main(qids: list[str]) -> None:
    os.makedirs(OUTDIR, exist_ok=True)
    from flink_spark.session import get_spark
    import flink_spark.queries_tpcds_real as R

    spark = get_spark()
    results = {}
    for qid in qids:
        try:
            text = load_text(qid)
            R._register_tpcds(spark)
            df = spark.sql(text)
            names = derive_names(df.schema.fields)
            casts = derive_casts(df.schema.fields, names)
            R._TPCDS_REAL[qid] = (text, names, casts)
            sdf = R._run_real(spark, "/root/testdata/sf0.01", qid).toPandas()
            osql = R._oracle_real(qid)
            odf = duckdb.sql(osql).df()
            s, o = normalize(sdf), normalize(odf)
            if s == o and len(s) > 0:
                results[qid] = f"PASS rows={len(sdf)}"
                with open(os.path.join(OUTDIR, f"q{qid}.py"), "w") as f:
                    f.write(
                        f"    {qid!r}: (\n        r'''\n{text}\n''',\n"
                        f"        {names!r},\n        {casts!r},\n    ),\n"
                    )
            elif s == o:
                results[qid] = "EMPTY (sets match but 0 rows)"
            else:
                only_s = list(s - o)[:2]
                only_o = list(o - s)[:2]
                results[qid] = (
                    f"MISMATCH spark={len(s)} oracle={len(o)} "
                    f"only_spark={only_s} only_oracle={only_o}"
                )
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            results[qid] = f"ERROR {type(e).__name__}: {msg}"
            if os.environ.get("SCAFFOLD_TRACE"):
                traceback.print_exc()
    print("\n==== SCAFFOLD RESULTS ====")
    for qid, r in results.items():
        print(f"q{qid}: {r}")


if __name__ == "__main__":
    main(sys.argv[1:])
