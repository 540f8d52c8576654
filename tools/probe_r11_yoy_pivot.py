"""A/B probe (r11 optimization): year-pivot (conditional aggregation)
spelling of the year-over-year CTE self-join shapes (tpcds_q2_shape /
q11_shape / q4_shape) vs the incumbent self-join spelling.

Catalyst inlines each deterministic CTE once PER REFERENCE, so q4's
three channel CTEs plan as 4 lineitem⋈orders joins + 2 orders scans +
4 SortMergeJoins at customer grain (34 Exchange entries in the before
plan).  Pivoting each channel on year — sum(CASE WHEN y=1996 ...),
count_if presence flags — computes every channel ONCE (web+cat even
share one scan: both are lineitem⋈orders split by l_linestatus), and
the growth predicate becomes a WHERE over one row per customer.  Same
rows by construction: an inner self-join edge (s1.ck = s2.ck with
s1.y=1996, s2.y=1997) holds iff both year groups exist, i.e. both
count_if flags > 0.

Row identity asserted before timing; 1 warm + min-of-3, interleaved.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_spark.catalog import Catalog
from flink_spark.queries import QUERIES
from flink_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"

_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,4)))"
)

Q2_PIVOT = f"""
WITH m AS (
  SELECT p_brand AS b, CAST(month(o_orderdate) AS INT) AS mo,
         sum(CASE WHEN year(o_orderdate) = 1996 THEN {_REV} END) AS r96,
         count_if(year(o_orderdate) = 1996) AS n96,
         sum(CASE WHEN year(o_orderdate) = 1997 THEN {_REV} END) AS r97,
         count_if(year(o_orderdate) = 1997) AS n97
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY p_brand, month(o_orderdate))
SELECT b AS brand, mo AS mon,
       CAST(r96 AS DOUBLE) AS rev_1996,
       CAST(r97 AS DOUBLE) AS rev_1997
FROM m WHERE n96 > 0 AND n97 > 0
ORDER BY brand, mon
"""

Q11_PIVOT = f"""
WITH store AS (
  SELECT o_custkey AS ck,
         sum(CASE WHEN year(o_orderdate) = 1996
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS t96,
         count_if(year(o_orderdate) = 1996) AS n96,
         sum(CASE WHEN year(o_orderdate) = 1997
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS t97,
         count_if(year(o_orderdate) = 1997) AS n97
  FROM orders
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey),
web AS (
  SELECT o_custkey AS ck,
         sum(CASE WHEN year(o_orderdate) = 1996 THEN {_REV} END) AS w96,
         count_if(year(o_orderdate) = 1996) AS wn96,
         sum(CASE WHEN year(o_orderdate) = 1997 THEN {_REV} END) AS w97,
         count_if(year(o_orderdate) = 1997) AS wn97
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_linestatus = 'O' AND year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey)
SELECT c_name,
       CAST(t97 AS DOUBLE) AS store_1997,
       CAST(w97 AS DOUBLE) AS web_1997
FROM store JOIN web USING (ck) JOIN customer ON c_custkey = ck
WHERE n96 > 0 AND n97 > 0 AND wn96 > 0 AND wn97 > 0
  AND t96 > 0 AND w96 > 0
  AND w97 * t96 > t97 * w96
ORDER BY c_name
LIMIT 100
"""

Q4_PIVOT = f"""
WITH store AS (
  SELECT o_custkey AS ck,
         sum(CASE WHEN year(o_orderdate) = 1996
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS t96,
         count_if(year(o_orderdate) = 1996) AS n96,
         sum(CASE WHEN year(o_orderdate) = 1997
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS t97,
         count_if(year(o_orderdate) = 1997) AS n97
  FROM orders
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey),
wc AS (
  SELECT o_custkey AS ck,
         sum(CASE WHEN l_linestatus = 'O' AND year(o_orderdate) = 1996
                  THEN {_REV} END) AS w96,
         count_if(l_linestatus = 'O' AND year(o_orderdate) = 1996) AS wn96,
         sum(CASE WHEN l_linestatus = 'O' AND year(o_orderdate) = 1997
                  THEN {_REV} END) AS w97,
         count_if(l_linestatus = 'O' AND year(o_orderdate) = 1997) AS wn97,
         sum(CASE WHEN l_linestatus = 'F' AND year(o_orderdate) = 1996
                  THEN {_REV} END) AS c96,
         count_if(l_linestatus = 'F' AND year(o_orderdate) = 1996) AS cn96,
         sum(CASE WHEN l_linestatus = 'F' AND year(o_orderdate) = 1997
                  THEN {_REV} END) AS c97,
         count_if(l_linestatus = 'F' AND year(o_orderdate) = 1997) AS cn97
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_linestatus IN ('O', 'F') AND year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey)
SELECT c_name,
       CAST(w97 AS DOUBLE) AS web_1997,
       CAST(c97 AS DOUBLE) AS cat_1997
FROM store JOIN wc USING (ck) JOIN customer ON c_custkey = ck
WHERE n96 > 0 AND n97 > 0
  AND wn96 > 0 AND wn97 > 0 AND cn96 > 0 AND cn97 > 0
  AND t96 > 0 AND w96 > 0 AND c96 > 0
  AND w97 * t96 > t97 * w96
  AND w97 * c96 > c97 * w96
ORDER BY c_name
LIMIT 100
"""


def main() -> None:
    spark = get_spark(app_name="probe_r11_yoy")
    Catalog(spark, SF_DIR).register_all()
    out = {}
    for name, pivot_sql in (
        ("tpcds_q2_shape", Q2_PIVOT),
        ("tpcds_q11_shape", Q11_PIVOT),
        ("tpcds_q4_shape", Q4_PIVOT),
    ):
        def mk_a():
            return QUERIES[name](spark, SF_DIR)

        def mk_b():
            Catalog(spark, SF_DIR).register_all()
            return spark.sql(pivot_sql)

        ra = [tuple(r) for r in mk_a().collect()]
        rb = [tuple(r) for r in mk_b().collect()]
        assert ra == rb, (
            f"{name}: ROW MISMATCH a={len(ra)} b={len(rb)} "
            f"first_diff={next(((x, y) for x, y in zip(ra, rb) if x != y), None)}"
        )
        print(f"# {name}: row-identical ({len(ra)} rows)", file=sys.stderr)
        trials = {"a": [], "b": []}
        for _ in range(4):
            for key, mk in (("a", mk_a), ("b", mk_b)):
                t0 = time.perf_counter()
                mk().count()
                trials[key].append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "a_trials": trials["a"], "b_trials": trials["b"],
            "a_min": min(trials["a"][1:]), "b_min": min(trials["b"][1:]),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
