"""A/B probe (r11 optimization, batch 2): single-pass spellings for the
remaining multiply-scanned-CTE shapes — q31/q39/q39b/q74 (period pivot,
same mechanism as PROBE_r11_yoy_pivot), q88 (4 band scans -> one
conditional-count scan), q14 (INTERSECT of two period scans -> one scan
with period presence flags).

Row identity asserted before timing; 1 warm + min-of-3, interleaved.
Pre-registered bar: row-identical AND b_min <= a_min AND majority of
trial-pair wins; losers are NOT shipped.
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
_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
_DEC_REVENUE = _REV

PIVOTS = {}

PIVOTS["tpcds_q31_shape"] = f"""
WITH store AS (
  SELECT c_nationkey AS nk,
         sum(CASE WHEN quarter(o_orderdate) = 1
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS t1,
         count_if(quarter(o_orderdate) = 1) AS n1,
         sum(CASE WHEN quarter(o_orderdate) = 2
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS t2,
         count_if(quarter(o_orderdate) = 2) AS n2
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY c_nationkey),
web AS (
  SELECT c_nationkey AS nk,
         sum(CASE WHEN quarter(o_orderdate) = 1 THEN {_REV} END) AS w1,
         count_if(quarter(o_orderdate) = 1) AS wn1,
         sum(CASE WHEN quarter(o_orderdate) = 2 THEN {_REV} END) AS w2,
         count_if(quarter(o_orderdate) = 2) AS wn2
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    AND l_linestatus = 'O'
  GROUP BY c_nationkey)
SELECT n_name AS nation,
       CAST(w2 AS DOUBLE) / CAST(w1 AS DOUBLE) AS web_growth,
       CAST(t2 AS DOUBLE) / CAST(t1 AS DOUBLE) AS store_growth
FROM store JOIN web USING (nk) JOIN nation ON n_nationkey = nk
WHERE n1 > 0 AND n2 > 0 AND wn1 > 0 AND wn2 > 0
  AND t1 > 0 AND w1 > 0
  AND w2 * t1 > t2 * w1
ORDER BY nation
"""

PIVOTS["tpcds_q39_shape"] = f"""
WITH m AS (
  SELECT l_partkey AS pk,
         sum(CASE WHEN quarter(l_shipdate) = 1 THEN {_QTY} END) AS s1,
         sum(CASE WHEN quarter(l_shipdate) = 1 THEN {_QTY} * {_QTY} END) AS ss1,
         count_if(quarter(l_shipdate) = 1) AS n1,
         sum(CASE WHEN quarter(l_shipdate) = 2 THEN {_QTY} END) AS s2,
         sum(CASE WHEN quarter(l_shipdate) = 2 THEN {_QTY} * {_QTY} END) AS ss2,
         count_if(quarter(l_shipdate) = 2) AS n2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_partkey)
SELECT pk AS partkey,
       CAST(s1 AS DOUBLE) / n1 AS mean_q1,
       CAST(s2 AS DOUBLE) / n2 AS mean_q2
FROM m
WHERE n1 > 1 AND n2 > 1
  AND 4 * n1 * (n1 * CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      > CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * (n1 - 1)
  AND 4 * n2 * (n2 * CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      > CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) * (n2 - 1)
ORDER BY partkey
"""

PIVOTS["tpcds_q39b_shape"] = f"""
WITH m AS (
  SELECT l_partkey AS pk,
         sum(CASE WHEN quarter(l_shipdate) = 1 THEN {_QTY} END) AS s1,
         sum(CASE WHEN quarter(l_shipdate) = 1 THEN {_QTY} * {_QTY} END) AS ss1,
         count_if(quarter(l_shipdate) = 1) AS n1,
         sum(CASE WHEN quarter(l_shipdate) = 2 THEN {_QTY} END) AS s2,
         count_if(quarter(l_shipdate) = 2) AS n2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_partkey)
SELECT pk AS partkey,
       CAST(s1 AS DOUBLE) / n1 AS mean_q1,
       CAST(s2 AS DOUBLE) / n2 AS mean_q2
FROM m
WHERE n1 > 1 AND n2 > 1
  AND 4 * n1 * (n1 * CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      > CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * (n1 - 1)
  AND s2 * n1 < s1 * n2
ORDER BY partkey
"""

PIVOTS["tpcds_q74_shape"] = f"""
WITH yc AS (
  SELECT c_name AS cust,
         sum(CASE WHEN l_linestatus IS DISTINCT FROM 'O'
                   AND year(o_orderdate) = 1996 THEN {_QTY} END) AS s96,
         count_if(l_linestatus IS DISTINCT FROM 'O'
                  AND year(o_orderdate) = 1996) AS sn96,
         sum(CASE WHEN l_linestatus IS DISTINCT FROM 'O'
                   AND year(o_orderdate) = 1997 THEN {_QTY} END) AS s97,
         count_if(l_linestatus IS DISTINCT FROM 'O'
                  AND year(o_orderdate) = 1997) AS sn97,
         sum(CASE WHEN l_linestatus = 'O'
                   AND year(o_orderdate) = 1996 THEN {_QTY} END) AS w96,
         count_if(l_linestatus = 'O' AND year(o_orderdate) = 1996) AS wn96,
         sum(CASE WHEN l_linestatus = 'O'
                   AND year(o_orderdate) = 1997 THEN {_QTY} END) AS w97,
         count_if(l_linestatus = 'O' AND year(o_orderdate) = 1997) AS wn97
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY c_name)
SELECT cust
FROM yc
WHERE sn96 > 0 AND sn97 > 0 AND wn96 > 0 AND wn97 > 0
  AND s96 > 0 AND w96 > 0
  AND w97 * s96 > s97 * w96
ORDER BY cust
LIMIT 100
"""

PIVOTS["tpcds_q88_shape"] = """
SELECT count_if(l_quantity BETWEEN 1 AND 12) AS band_low,
       count_if(l_quantity BETWEEN 13 AND 25) AS band_mid_low,
       count_if(l_quantity BETWEEN 26 AND 38) AS band_mid_high,
       count_if(l_quantity BETWEEN 39 AND 50) AS band_high
FROM lineitem
"""

PIVOTS["tpcds_q14_shape"] = f"""
WITH both_years AS (
  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey
  HAVING count_if(o_orderdate < TIMESTAMP '1997-01-01') > 0
     AND count_if(o_orderdate >= TIMESTAMP '1997-01-01') > 0)
SELECT p_brand AS brand,
       CAST(sum({_DEC_REVENUE}) AS DOUBLE) AS cross_year_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN both_years ON lineitem.l_partkey = both_years.l_partkey
GROUP BY p_brand
ORDER BY cross_year_revenue DESC, brand
LIMIT 100
"""


def main() -> None:
    spark = get_spark(app_name="probe_r11_pivot2")
    Catalog(spark, SF_DIR).register_all()
    out = {}
    for name, pivot_sql in PIVOTS.items():
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
        wins = sum(b < a for a, b in zip(trials["a"][1:], trials["b"][1:]))
        out[name] = {
            "a_trials": trials["a"], "b_trials": trials["b"],
            "a_min": min(trials["a"][1:]), "b_min": min(trials["b"][1:]),
            "b_pair_wins": f"{wins}/3",
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
