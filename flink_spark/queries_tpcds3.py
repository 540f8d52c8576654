"""TPC-DS-shaped queries, round-4 breadth (part 2): remaining families.

Continues queries_tpcds2.py (same determinism + scale rules; same spec
source: flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java).

  q21-shape  before/after-pivot quantity ratio band per (supplier, brand)
  q22-shape  3-level ROLLUP average-quantity hierarchy
  q30-shape  per-customer returns over 1.2× nation average (window)
  q31-shape  quarter-over-quarter growth compared across two channels
  q35-shape  EXISTS + (EXISTS OR EXISTS) customer demographics
  q36-shape  margin ROLLUP + rank within grouping level (LOCHIERARCHY)
  q38-shape  3-way INTERSECT distinct-customer count
  q39-shape  coefficient-of-variation self-join across two months
  q43-shape  month-pivot CASE battery per nation
  q51-shape  cumulative-window FULL OUTER comparison of two channels
  q58-shape  3-channel per-brand revenue within a mutual band
  q65-shape  items at or under 0.3× their supplier's average revenue
  q69-shape  EXISTS + two NOT EXISTS demographic counts
  q75-shape  year-over-year quantity decline across UNION ALL'd channels
  q77-shape  per-channel sales FULL OUTER returns + ROLLUP
  q87-shape  EXCEPT-chain distinct-customer count
  q89-shape  monthly deviation below 0.9× of the yearly average (window)
  q92-shape  excess-discount: lines over 1.3× the part's average discount
  q93-shape  returns netting via LEFT JOIN against a returns aggregate
  q94-shape  EXISTS + NOT EXISTS order filter (late line, never returned)
  q97-shape  FULL OUTER of two period key sets → only-A/only-B/both counts
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_spark.catalog import Catalog
from flink_spark.queries import query


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    Catalog(spark, sf_dir).register_all()
    return spark.sql(text)


_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,4)))"
)
_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
_DEC0 = "CAST(0 AS DECIMAL(18,2))"


_Q21 = f"""
WITH w AS (
  SELECT s_name AS supp, p_brand AS brand,
         sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                  THEN {_QTY} ELSE {_DEC0} END) AS before_q,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                  THEN {_QTY} ELSE {_DEC0} END) AS after_q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_shipdate >= TIMESTAMP '1997-07-01'
    AND l_shipdate < TIMESTAMP '1998-07-01'
  GROUP BY s_name, p_brand)
SELECT supp, brand,
       CAST(before_q AS DOUBLE) AS qty_before,
       CAST(after_q AS DOUBLE) AS qty_after
FROM w
WHERE before_q > 0
  AND after_q * 3 >= before_q * 2
  AND after_q * 2 <= before_q * 3
ORDER BY supp, brand
LIMIT 100
"""


@query("tpcds_q21_shape", _Q21)
def tpcds_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 shape: quantity before vs after a pivot date per
    (supplier, brand), kept when the after/before ratio lies in
    [2/3, 3/2] — the original's inventory-shift band. The ratio band is
    cross-multiplied in DECIMAL; one fact shuffle on the group key with
    both dims broadcast."""
    return _sql(spark, sf_dir, _Q21)


_Q22 = f"""
SELECT p_type AS ty, p_brand AS brand, p_size AS sz,
       CAST(sum({_QTY}) AS DOUBLE) / count(*) AS avg_qty,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(p_type) AS BIGINT) AS g_ty,
       CAST(grouping(p_brand) AS BIGINT) AS g_brand,
       CAST(grouping(p_size) AS BIGINT) AS g_sz
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP (p_type, p_brand, p_size)
ORDER BY g_ty, g_brand, g_sz, ty, brand, sz
LIMIT 100
"""


@query("tpcds_q22_shape", _Q22)
def tpcds_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q22 shape: average quantity-on-hand over a 3-level ROLLUP
    hierarchy (type → brand → size). AVG is spelled as an exact DECIMAL
    sum divided by the count once, post-aggregation. The ORDER BY leads
    with the grouping flags so the LIMIT never straddles NULL-ordering
    differences between engines."""
    return _sql(spark, sf_dir, _Q22)


_Q30 = f"""
WITH ret AS (
  SELECT o_custkey AS ck, sum({_REV}) AS r
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey),
w AS (
  SELECT ck, r, c_name, c_acctbal, c_nationkey,
         sum(r) OVER (PARTITION BY c_nationkey) AS s_nat,
         count(*) OVER (PARTITION BY c_nationkey) AS n_nat
  FROM ret JOIN customer ON c_custkey = ck)
SELECT c_name, CAST(c_acctbal AS DOUBLE) AS acctbal,
       CAST(r AS DOUBLE) AS return_total
FROM w
WHERE r * n_nat * 10 > s_nat * 12
ORDER BY c_name
LIMIT 100
"""


@query("tpcds_q30_shape", _Q30)
def tpcds_q30_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q30 shape: customers whose return total exceeds 1.2× their
    nation's average return — q1's correlated threshold on the RETURNS
    channel with customer detail output. Decorrelated into per-nation
    windows over the aggregate; comparison cross-multiplied exact."""
    return _sql(spark, sf_dir, _Q30)


_Q31 = f"""
WITH store AS (
  SELECT c_nationkey AS nk, CAST(quarter(o_orderdate) AS INT) AS q,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY c_nationkey, quarter(o_orderdate)),
web AS (
  SELECT c_nationkey AS nk, CAST(quarter(o_orderdate) AS INT) AS q,
         sum({_REV}) AS total
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' AND l_linestatus = 'O'
  GROUP BY c_nationkey, quarter(o_orderdate))
SELECT n_name AS nation,
       CAST(ws2.total AS DOUBLE) / CAST(ws1.total AS DOUBLE) AS web_growth,
       CAST(ss2.total AS DOUBLE) / CAST(ss1.total AS DOUBLE) AS store_growth
FROM store ss1
JOIN store ss2 ON ss1.nk = ss2.nk
JOIN web ws1 ON ws1.nk = ss1.nk
JOIN web ws2 ON ws2.nk = ss1.nk
JOIN nation ON n_nationkey = ss1.nk
WHERE ss1.q = 1 AND ss2.q = 2 AND ws1.q = 1 AND ws2.q = 2
  AND ss1.total > 0 AND ws1.total > 0
  AND ws2.total * ss1.total > ss2.total * ws1.total
ORDER BY nation
"""


# r11 optimization (guide §2.4, the PROBE_r11_yoy_pivot mechanism):
# Catalyst inlines each channel CTE once per reference, so the
# self-join spelling scans orders⋈customer twice and
# lineitem⋈orders⋈customer twice. The executed spelling pivots each
# channel on quarter — conditional sums + count_if presence flags
# replacing the aligned self-join edges — and narrows the date range
# to the two quarters the join actually keeps ([Jan, Jul) ≡ quarter ∈
# {1, 2} for 1996 dates). Row-identical at sf1; 3/3 trial wins,
# 1.011 → 0.732 s min-of-3 (PROBE_r11_pivot2.json). Oracle unchanged.
_Q31_SPARK = f"""
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


@query("tpcds_q31_shape", _Q31)
def tpcds_q31_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: quarter-over-quarter growth of two channels per
    nation, keeping nations where the web channel grew faster than the
    store channel. The filter is cross-multiplied exact; the emitted
    growth ratios are one DOUBLE division of exact DECIMAL sums.

    Executes the quarter-pivot spelling (_Q31_SPARK — one pass per
    channel); the oracle runs the original self-join text."""
    return _sql(spark, sf_dir, _Q31_SPARK)


# q35: Spark's optimizer (like the reference's decorrelation,
# FlinkSubQueryRemoveRule) cannot decorrelate EXISTS under OR in all
# versions, so the Spark spelling uses explicit distinct key sets; the
# oracle keeps the literal EXISTS OR EXISTS form — same semantics.
_Q35_SPARK = """
WITH k96 AS (SELECT DISTINCT o_custkey AS ck FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
ku AS (SELECT DISTINCT o_custkey AS ck FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_orderpriority = '1-URGENT'),
kl AS (SELECT DISTINCT o_custkey AS ck FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_orderpriority = '5-LOW'),
kor AS (SELECT ck FROM ku UNION SELECT ck FROM kl)
SELECT c_mktsegment AS seg, n_name AS nation,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE c_custkey IN (SELECT ck FROM k96)
  AND c_custkey IN (SELECT ck FROM kor)
GROUP BY c_mktsegment, n_name
ORDER BY seg, nation
"""

_Q35_ORACLE = """
SELECT c_mktsegment AS seg, n_name AS nation,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
  AND (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_orderpriority = '1-URGENT')
       OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' AND o_orderpriority = '5-LOW'))
GROUP BY c_mktsegment, n_name
ORDER BY seg, nation
"""


@query("tpcds_q35_shape", _Q35_ORACLE)
def tpcds_q35_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q35 shape: customer demographics gated by EXISTS plus a
    disjunction of two more EXISTS. Spark spelling decorrelates the OR
    branch by hand (distinct key sets → UNION → semi-join), exactly what
    the reference's subquery-remove rule emits; the DuckDB oracle keeps
    the literal correlated form, proving semantic equivalence."""
    return _sql(spark, sf_dir, _Q35_SPARK)


_Q36 = f"""
WITH r AS (
  SELECT p_type AS ty, p_brand AS brand,
         sum({_REV}) AS rev,
         CAST(grouping(p_type) AS BIGINT) + CAST(grouping(p_brand) AS BIGINT)
           AS lvl
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY ROLLUP (p_type, p_brand))
SELECT ty, brand, CAST(rev AS DOUBLE) AS revenue,
       lvl AS lochierarchy,
       CAST(rank() OVER (
         PARTITION BY lvl, CASE WHEN lvl = 0 THEN ty END
         ORDER BY rev DESC, brand) AS BIGINT) AS rank_within_parent
FROM r
ORDER BY lochierarchy DESC, ty, brand, rank_within_parent
"""


@query("tpcds_q36_shape", _Q36)
def tpcds_q36_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape: ROLLUP hierarchy with a rank window partitioned
    by grouping level and parent (the original's LOCHIERARCHY /
    RANK() OVER (PARTITION BY lochierarchy, CASE WHEN ...) pattern) —
    Expand output feeding a window whose partition key is derived from
    GROUPING() flags."""
    return _sql(spark, sf_dir, _Q36)


_Q38 = """
SELECT CAST(count(*) AS BIGINT) AS n_loyal
FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
"""


@query("tpcds_q38_shape", _Q38)
def tpcds_q38_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38 shape: customers present in all three periods — a
    3-way INTERSECT (distinct semantics) collapsed to a count. Each
    branch aggregates to its key set before the semi-join chain."""
    return _sql(spark, sf_dir, _Q38)


_Q39 = f"""
WITH m AS (
  SELECT l_partkey AS pk,
         CAST(quarter(l_shipdate) AS INT) AS mo,
         sum({_QTY}) AS s, sum({_QTY} * {_QTY}) AS ss,
         count(*) AS n
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_partkey, quarter(l_shipdate))
SELECT m1.pk AS partkey,
       CAST(m1.s AS DOUBLE) / m1.n AS mean_q1,
       CAST(m2.s AS DOUBLE) / m2.n AS mean_q2
FROM m m1
JOIN m m2 ON m1.pk = m2.pk
WHERE m1.mo = 1 AND m2.mo = 2
  AND m1.n > 1 AND m2.n > 1
  AND 4 * m1.n * (m1.n * CAST(m1.ss AS DOUBLE) - CAST(m1.s AS DOUBLE) * CAST(m1.s AS DOUBLE))
      > CAST(m1.s AS DOUBLE) * CAST(m1.s AS DOUBLE) * (m1.n - 1)
  AND 4 * m2.n * (m2.n * CAST(m2.ss AS DOUBLE) - CAST(m2.s AS DOUBLE) * CAST(m2.s AS DOUBLE))
      > CAST(m2.s AS DOUBLE) * CAST(m2.s AS DOUBLE) * (m2.n - 1)
ORDER BY partkey
"""


# r11 optimization (guide §2.4): the quarter self-join inlines `m`
# twice — two identical lineitem scans + aggregates. The executed
# spelling pivots on quarter (s/ss/n per quarter in ONE aggregate);
# presence is subsumed by the n > 1 predicates. Row-identical at sf1;
# 3/3 trial wins, 1.181 → 0.741 s min-of-3 (PROBE_r11_pivot2.json).
_Q39_SPARK = f"""
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


@query("tpcds_q39_shape", _Q39)
def tpcds_q39_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 shape: parts whose quantity coefficient-of-variation
    exceeds 0.5 in BOTH of two consecutive quarters (the fixture's
    uniform quantities cap CoV near 0.74, and per-month item groups are
    singletons at small SF). CoV > ½ ⟺
    4·stdev² > mean² is cross-multiplied into ``4n(n·Σx² − (Σx)²) >
    (Σx)²(n−1)`` over exact integer-valued operands, so no sqrt or
    float-boundary compare can flip a row between engines.

    Executes the quarter-pivot spelling (_Q39_SPARK — one lineitem
    pass); the oracle runs the original self-join text."""
    return _sql(spark, sf_dir, _Q39_SPARK)


_Q43 = f"""
SELECT n_name AS nation,
       CAST(sum(CASE WHEN month(l_shipdate) IN (1, 2, 3) THEN {_QTY} ELSE {_DEC0} END) AS DOUBLE) AS q1_qty,
       CAST(sum(CASE WHEN month(l_shipdate) IN (4, 5, 6) THEN {_QTY} ELSE {_DEC0} END) AS DOUBLE) AS q2_qty,
       CAST(sum(CASE WHEN month(l_shipdate) IN (7, 8, 9) THEN {_QTY} ELSE {_DEC0} END) AS DOUBLE) AS q3_qty,
       CAST(sum(CASE WHEN month(l_shipdate) IN (10, 11, 12) THEN {_QTY} ELSE {_DEC0} END) AS DOUBLE) AS q4_qty
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY nation
"""


@query("tpcds_q43_shape", _Q43)
def tpcds_q43_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43 shape: the day-of-week sales pivot re-grained to
    calendar quarters (week numbering is not portable across engines) —
    a single scan with a CASE-pivot battery per nation."""
    return _sql(spark, sf_dir, _Q43)


_Q51 = f"""
WITH web AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
         sum({_REV}) AS r
  FROM lineitem WHERE l_linestatus = 'O'
  GROUP BY year(l_shipdate) * 100 + month(l_shipdate)),
store AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
         sum({_REV}) AS r
  FROM lineitem WHERE l_linestatus = 'F'
  GROUP BY year(l_shipdate) * 100 + month(l_shipdate)),
j AS (
  SELECT COALESCE(web.ym, store.ym) AS ym, web.r AS wr, store.r AS sr
  FROM web FULL OUTER JOIN store ON web.ym = store.ym),
c AS (
  SELECT ym,
         sum(COALESCE(wr, CAST(0 AS DECIMAL(22,4)))) OVER (ORDER BY ym) AS cw,
         sum(COALESCE(sr, CAST(0 AS DECIMAL(22,4)))) OVER (ORDER BY ym) AS cs
  FROM j)
SELECT ym, CAST(cw AS DOUBLE) AS web_cumulative,
       CAST(cs AS DOUBLE) AS store_cumulative
FROM c
WHERE cw > cs
ORDER BY ym
"""


@query("tpcds_q51_shape", _Q51)
def tpcds_q51_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: FULL OUTER join of two channels' month series,
    cumulative SUM windows over the combined axis, keep months where the
    web running total leads the store one. The window ORDER key (ym) is
    unique, so the running DECIMAL sums are deterministic."""
    return _sql(spark, sf_dir, _Q51)


_Q58 = f"""
WITH a AS (
  SELECT p_brand AS b, sum({_REV}) AS r FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'A' GROUP BY p_brand),
nf AS (
  SELECT p_brand AS b, sum({_REV}) AS r FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'N' GROUP BY p_brand),
rf AS (
  SELECT p_brand AS b, sum({_REV}) AS r FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'R' GROUP BY p_brand)
SELECT a.b AS brand,
       CAST(a.r AS DOUBLE) AS ch_a, CAST(nf.r AS DOUBLE) AS ch_n,
       CAST(rf.r AS DOUBLE) AS ch_r
FROM a JOIN nf ON a.b = nf.b JOIN rf ON a.b = rf.b
WHERE a.r * 30 BETWEEN (a.r + nf.r + rf.r) * 9 AND (a.r + nf.r + rf.r) * 11
  AND nf.r * 30 BETWEEN (a.r + nf.r + rf.r) * 9 AND (a.r + nf.r + rf.r) * 11
  AND rf.r * 30 BETWEEN (a.r + nf.r + rf.r) * 9 AND (a.r + nf.r + rf.r) * 11
ORDER BY brand
"""


@query("tpcds_q58_shape", _Q58)
def tpcds_q58_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 shape: brands whose revenue is balanced across three
    channels — each channel within ±10% of the three-channel average,
    spelled ``ch·3·10 BETWEEN total·9 AND total·11`` in exact DECIMAL.
    Three brand-grain aggregates equi-joined (all broadcastable)."""
    return _sql(spark, sf_dir, _Q58)


_Q65 = f"""
WITH sp AS (
  SELECT l_suppkey AS sk, l_partkey AS pk, sum({_REV}) AS r
  FROM lineitem GROUP BY l_suppkey, l_partkey),
sa AS (
  SELECT sk, sum(r) AS tot, count(*) AS n FROM sp GROUP BY sk)
SELECT s_name AS supp, p_name AS part_name, CAST(r AS DOUBLE) AS revenue
FROM sp
JOIN sa ON sp.sk = sa.sk
JOIN supplier ON s_suppkey = sp.sk
JOIN part ON p_partkey = sp.pk
WHERE r * n * 10 <= tot * 3
ORDER BY supp, part_name, revenue, pk
LIMIT 100
"""


# r11 optimization (guide §2.4): `sp` was inlined twice (once for the
# per-supplier totals CTE, once for the detail rows) — two lineitem
# scans + aggregates. The executed spelling derives the totals with a
# window over the single sp aggregate (sum/count OVER (PARTITION BY
# sk) — exact DECIMAL, same row set), the same decorrelation q30
# already uses. Row-set-identical at sf1; 3/3 trial wins, 3.766 →
# 2.358 s min-of-3 (PROBE_r11_q65.json). Oracle runs the 2-CTE text.
_Q65_SPARK = f"""
WITH sp AS (
  SELECT l_suppkey AS sk, l_partkey AS pk, sum({_REV}) AS r
  FROM lineitem GROUP BY l_suppkey, l_partkey),
w AS (
  SELECT sk, pk, r,
         sum(r) OVER (PARTITION BY sk) AS tot,
         count(*) OVER (PARTITION BY sk) AS n
  FROM sp)
SELECT s_name AS supp, p_name AS part_name, CAST(r AS DOUBLE) AS revenue
FROM w
JOIN supplier ON s_suppkey = sk
JOIN part ON p_partkey = pk
WHERE r * n * 10 <= tot * 3
ORDER BY supp, part_name, revenue, pk
LIMIT 100
"""


@query("tpcds_q65_shape", _Q65)
def tpcds_q65_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: (supplier, part) pairs whose revenue sits at or
    under 0.3× the supplier's average item revenue — an aggregate joined
    against its own re-aggregation, threshold cross-multiplied exact."""
    return _sql(spark, sf_dir, _Q65_SPARK)


_Q69 = """
SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cnt
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
                  AND o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  JOIN lineitem ON l_orderkey = o2.o_orderkey
                  WHERE o2.o_custkey = c_custkey
                  AND o2.o_orderdate >= TIMESTAMP '1996-01-01' AND o2.o_orderdate < TIMESTAMP '1997-01-01'
                  AND l_returnflag = 'R')
GROUP BY c_mktsegment
ORDER BY seg
"""


@query("tpcds_q69_shape", _Q69)
def tpcds_q69_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q69 shape: customers active in one channel and absent from
    two others — one EXISTS plus two NOT EXISTS (one of them through a
    join), decorrelated by both engines into a semi + two anti joins."""
    return _sql(spark, sf_dir, _Q69)


_Q75 = f"""
WITH all_ch AS (
  SELECT p_brand AS b, CAST(year(o_orderdate) AS INT) AS y,
         sum(q) AS q, sum(r) AS r
  FROM (
    SELECT l_partkey, l_orderkey, {_QTY} AS q, {_REV} AS r
    FROM lineitem WHERE l_linestatus = 'O'
    UNION ALL
    SELECT l_partkey, l_orderkey, {_QTY} AS q, {_REV} AS r
    FROM lineitem WHERE l_linestatus = 'F'
  ) u
  JOIN orders ON u.l_orderkey = o_orderkey
  JOIN part ON u.l_partkey = p_partkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY p_brand, year(o_orderdate))
SELECT cur.b AS brand,
       CAST(prev.q AS DOUBLE) AS prev_qty,
       CAST(cur.q AS DOUBLE) AS cur_qty,
       CAST(cur.r - prev.r AS DOUBLE) AS rev_diff
FROM all_ch cur
JOIN all_ch prev ON cur.b = prev.b
WHERE cur.y = 1997 AND prev.y = 1996
  AND cur.q * 100 < prev.q * 97
ORDER BY rev_diff, brand
"""


# r11 optimization (guide §2.4): the incumbent pays FOUR lineitem
# scans — the O/F union branches twice each, because the all_ch CTE is
# inlined once per self-join reference. One pass produces the same
# rows: the O/F branches are disjoint slices of lineitem (a row has
# exactly one status), so l_linestatus IN ('O','F') yields the
# identical multiset, and the cur/prev self-join pivots on year with
# count_if presence flags. Row-identical; 3/3 trial wins, 2.402 →
# 1.036 s min-of-3 in a degraded window (PROBE_r11_pivot3.json).
# Oracle runs the UNION-ALL self-join text.
_Q75_SPARK = f"""
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


@query("tpcds_q75_shape", _Q75)
def tpcds_q75_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape: channel scans re-aggregated to (brand, year),
    keeping brands whose quantity declined more than 3% year-over-year
    (cross-multiplied ``cur·100 < prev·97``) with the revenue delta.

    Executes the year-pivot spelling (_Q75_SPARK — one fact pass); the
    oracle runs the original UNION ALL + self-join text."""
    return _sql(spark, sf_dir, _Q75_SPARK)


_Q77 = f"""
WITH sales AS (
  SELECT n_name AS id,
         sum(CASE WHEN l_returnflag <> 'R' THEN {_REV}
                  ELSE CAST(0 AS DECIMAL(22,4)) END) AS s
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_name),
returns AS (
  SELECT n_name AS id, sum({_REV}) AS r
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY n_name)
SELECT sales.id AS id,
       CAST(sum(s) AS DOUBLE) AS sales,
       CAST(sum(COALESCE(r, CAST(0 AS DECIMAL(22,4)))) AS DOUBLE) AS returns,
       CAST(sum(s - COALESCE(r, CAST(0 AS DECIMAL(22,4)))) AS DOUBLE) AS profit,
       CAST(grouping(sales.id) AS BIGINT) AS g_id
FROM sales LEFT JOIN returns ON sales.id = returns.id
GROUP BY ROLLUP (sales.id)
ORDER BY g_id, id
"""


@query("tpcds_q77_shape", _Q77)
def tpcds_q77_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q77 shape: channel sales outer-joined with channel returns
    at the id grain, netted, then ROLLUP'd to a grand total — the
    join-then-rollup variant of q5's union-then-rollup."""
    return _sql(spark, sf_dir, _Q77)


_Q87 = """
SELECT CAST(count(*) AS BIGINT) AS n_lapsed
FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
"""


@query("tpcds_q87_shape", _Q87)
def tpcds_q87_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q87 shape: customers in the first period but neither later
    one — an EXCEPT chain (distinct anti-join ladder) collapsed to a
    count."""
    return _sql(spark, sf_dir, _Q87)


_Q89 = f"""
WITH m AS (
  SELECT p_type AS ty, p_brand AS brand,
         CAST(month(l_shipdate) AS INT) AS mo, sum({_REV}) AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY p_type, p_brand, month(l_shipdate)),
w AS (
  SELECT ty, brand, mo, r,
         sum(r) OVER (PARTITION BY ty, brand) AS tot,
         count(*) OVER (PARTITION BY ty, brand) AS n
  FROM m)
SELECT ty, brand, mo,
       CAST(r AS DOUBLE) AS month_rev,
       CAST(tot AS DOUBLE) / n AS avg_month_rev
FROM w
WHERE r * n * 10 < tot * 9
ORDER BY ty, brand, mo
LIMIT 100
"""


@query("tpcds_q89_shape", _Q89)
def tpcds_q89_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89 shape: months whose revenue falls under 0.9× the
    (type, brand) yearly monthly average — aggregate feeding per-group
    SUM/COUNT windows, deviation test cross-multiplied exact."""
    return _sql(spark, sf_dir, _Q89)


_Q92 = f"""
WITH ad AS (
  SELECT l_partkey AS pk,
         sum(CAST(l_discount AS DECIMAL(18,6))) AS s, count(*) AS n
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(count(*) AS BIGINT) AS n_excess,
       CAST(sum({_REV}) AS DOUBLE) AS excess_revenue
FROM lineitem JOIN ad ON ad.pk = l_partkey
WHERE CAST(l_discount AS DECIMAL(18,6)) * n * 10 > s * 13
"""


@query("tpcds_q92_shape", _Q92)
def tpcds_q92_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q92 shape (excess discount): lines discounted over 1.3×
    their part's average discount — the fact joined against its own
    per-key average, threshold cross-multiplied in DECIMAL(18,6)."""
    return _sql(spark, sf_dir, _Q92)


_Q93 = f"""
WITH ret AS (
  SELECT l_orderkey AS ok, l_partkey AS pk, sum({_QTY}) AS rq
  FROM lineitem WHERE l_returnflag = 'R'
  GROUP BY l_orderkey, l_partkey)
SELECT c_name, CAST(sum(eff) AS DOUBLE) AS net_qty
FROM (
  SELECT o_custkey AS ck,
         {_QTY} - COALESCE(rq, CAST(0 AS DECIMAL(18,2))) AS eff
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  LEFT JOIN ret ON ret.ok = l_orderkey AND ret.pk = l_partkey
  WHERE l_returnflag <> 'R') x
JOIN customer ON c_custkey = ck
GROUP BY c_name
ORDER BY net_qty, c_name
LIMIT 100
"""


@query("tpcds_q93_shape", _Q93)
def tpcds_q93_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 shape: effective sales after returns — sales lines
    LEFT JOINed against a (order, part)-grain returns aggregate,
    netted per line, rolled up per customer, lowest first."""
    return _sql(spark, sf_dir, _Q93)


_Q94 = """
SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY pri
"""


@query("tpcds_q94_shape", _Q94)
def tpcds_q94_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q94 shape: finished orders with at least one line shipped
    90+ days late and no returned line — correlated EXISTS + NOT EXISTS
    on the same fact (the original's ws_warehouse mismatch + no-return
    filter; also TPC-H q21's family), planned as semi + anti joins."""
    return _sql(spark, sf_dir, _Q94)


_Q97 = """
WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
b AS (SELECT DISTINCT o_custkey AS ck FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT
  CAST(sum(CASE WHEN a.ck IS NOT NULL AND b.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1996,
  CAST(sum(CASE WHEN a.ck IS NULL AND b.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1997,
  CAST(sum(CASE WHEN a.ck IS NOT NULL AND b.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_years
FROM a FULL OUTER JOIN b ON a.ck = b.ck
"""


@query("tpcds_q97_shape", _Q97)
def tpcds_q97_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 shape: FULL OUTER join of two periods' distinct buyer
    sets, classified into only-A / only-B / both counts in one pass."""
    return _sql(spark, sf_dir, _Q97)
