"""A/B probe (r11 optimization, batch 3): q60 (two year-branch fact
aggregates UNION ALL'd -> one year-pivot pass) and q75 (UNION ALL of
two disjoint status scans feeding a twice-inlined CTE self-join — four
lineitem scans total -> one pass with year pivot).

Row identity asserted before timing; 1 warm + min-of-3, interleaved.
Pre-registered bar: row-identical AND b_min <= a_min AND majority wins.
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

PIVOTS = {}

# q60: total_rev = exact-DECIMAL sum over both years' rows (decimal
# addition is associative, so one sum over the union equals the sum of
# the two branch sums); n_channels = how many year branches had a row.
PIVOTS["tpcds_q60_shape"] = f"""
WITH m AS (
  SELECT p_brand,
         sum({_REV}) AS rev_all,
         count_if(year(o_orderdate) = 1996) AS n96,
         count_if(year(o_orderdate) = 1997) AS n97
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY p_brand)
SELECT p_brand AS brand, CAST(rev_all AS DOUBLE) AS total_rev,
       CAST((CASE WHEN n96 > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN n97 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_channels
FROM m
ORDER BY total_rev DESC, brand
LIMIT 100
"""

# q75: the O/F union branches are disjoint slices of lineitem, so one
# scan with l_linestatus IN ('O','F') produces the identical multiset;
# the cur/prev self-join pivots on year with presence flags.
PIVOTS["tpcds_q75_shape"] = f"""
WITH all_ch AS (
  SELECT p_brand AS b,
         sum(CASE WHEN year(o_orderdate) = 1996 THEN {_QTY} END) AS q96,
         sum(CASE WHEN year(o_orderdate) = 1996 THEN {_REV} END) AS r96,
         count_if(year(o_orderdate) = 1996) AS n96,
         sum(CASE WHEN year(o_orderdate) = 1997 THEN {_QTY} END) AS q97,
         sum(CASE WHEN year(o_orderdate) = 1997 THEN {_REV} END) AS r97,
         count_if(year(o_orderdate) = 1997) AS n97
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE l_linestatus IN ('O', 'F')
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY p_brand)
SELECT b AS brand,
       CAST(q96 AS DOUBLE) AS prev_qty,
       CAST(q97 AS DOUBLE) AS cur_qty,
       CAST(r97 - r96 AS DOUBLE) AS rev_diff
FROM all_ch
WHERE n96 > 0 AND n97 > 0
  AND q97 * 100 < q96 * 97
ORDER BY rev_diff, brand
"""


def main() -> None:
    spark = get_spark(app_name="probe_r11_pivot3")
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
