"""Drive __spark_entry__.py the way the round driver does:
fresh import, entry() smoke at sf0.001, queries() vs oracle_sql() at sf0.01."""
import math
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"

# Driver-like session: deliberately NOT flink_spark.session.get_spark(),
# so conf the driver doesn't set (e.g. parquet nanosAsLong) is absent —
# round-1 ERRs only reproduced on a foreign session.
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("drive_entry")
    .getOrCreate()
)

# 1. smoke: entry()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[(f.name, f.dataType.simpleString()) for f in df.schema.fields]}")
assert len(rows) > 0

# 2. contract shape
qs, osql = E.queries(), E.oracle_sql()
print(f"queries: {len(qs)}, with oracle: {len(osql)}, oracle keys all in queries: {set(osql) <= set(qs)}")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v,2):.2f}"
    if hasattr(v, "isoformat"): return v.isoformat()
    return str(v)

fails = []
for name in sorted(qs):
    sdf = qs[name](spark, SF)
    sp = sdf.toPandas()
    if name not in osql:
        print(f"  {name}: rows-only, {len(sp)} rows")
        continue
    du = con.execute(osql[name]).df()
    ok_cols = sorted(sp.columns) == sorted(du.columns)
    order = sorted(sp.columns)
    s_rows = sorted(tuple(norm(x) for x in r) for r in sp[order].itertuples(index=False))
    d_rows = sorted(tuple(norm(x) for x in r) for r in du[order].itertuples(index=False)) if ok_cols else []
    ok = ok_cols and s_rows == d_rows
    status = "OK " if ok else "FAIL"
    print(f"  {name}: {status} spark={len(s_rows)} oracle={len(du)}")
    if not ok:
        fails.append(name)
        if ok_cols:
            so = [r for r in s_rows if r not in set(d_rows)][:2]
            do = [r for r in d_rows if r not in set(s_rows)][:2]
            print(f"    spark-only={so}\n    oracle-only={do}")
        else:
            print(f"    cols spark={sorted(sp.columns)} oracle={sorted(du.columns)}")

print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
