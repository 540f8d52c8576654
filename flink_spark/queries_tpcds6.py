"""TPC-DS-shaped queries, round-4 breadth (part 5): q73-q99 gap fill.

Completes the 99-family coverage sweep begun in queries_tpcds.py (spec
source: flink-end-to-end-tests/flink-tpcds-test/.../
TpcdsTestProgram.java:76-85 — the reference's batch gate runs every
variant at SF1). Same dialect/determinism/mapping rules as parts 1-4.

  q73-shape  customers with 1-5 item orders (q34's low-band twin)
  q74-shape  year-over-year customer quantity-growth ratio (q4/q11 kin)
  q76-shape  sentinel-attribute fact rows per (channel, quarter, type)
  q78-shape  yearly (customer, item) sales with returns excluded,
             cross-channel ratio
  q80-shape  per-channel sales/returns/profit ROLLUP with date+promo
             filters (netted per line)
  q81-shape  customers whose return quantity tops 1.2x the nation avg
  q82-shape  q37's store twin: price band + on-hand range items
  q83-shape  3-return-class part counts with a mutual date set
  q84-shape  customer directory rows for an income band, returns-joined
  q85-shape  return reason averages under OR'd demographic triples
  q86-shape  web profit ROLLUP ranked within hierarchy level
  q90-shape  morning-to-evening event-count ratio
  q91-shape  call-center return losses per (nation, priority) for one
             demographic month
  q95-shape  orders shipped via an order set that itself used two
             suppliers (CTE reused twice) and never returned
  q96-shape  one-cell count under time band + quantity band + store
  q98-shape  item revenue share within type (ORDER differs from q20)
  q99-shape  catalog twin of q62's lag-bucket report
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
_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DEC0 = "CAST(0 AS DECIMAL(22,4))"
_DECQ0 = "CAST(0 AS DECIMAL(18,2))"


# ---------------------------------------------------------------------------
# q73: customers with small (1-5 item) orders.
# ---------------------------------------------------------------------------

_Q73 = """
WITH per_order AS (
  SELECT o_orderkey AS ok, o_custkey AS ck, count(*) AS cnt
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
  GROUP BY o_orderkey, o_custkey
  HAVING count(*) BETWEEN 1 AND 5)
SELECT c_name AS cust, CAST(cnt AS BIGINT) AS cnt
FROM per_order JOIN customer ON c_custkey = ck
ORDER BY cnt DESC, cust
LIMIT 100
"""


@query("tpcds_q73_shape", _Q73)
def tpcds_q73_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q73 shape: customers who placed small orders (1-5 items)
    under low-urgency demographics — q34's 15-20 band twin at the low
    band, kept as its own entry to mirror the reference list. The
    HAVING prunes before the customer broadcast join."""
    return _sql(spark, sf_dir, _Q73)


# ---------------------------------------------------------------------------
# q74: year-over-year customer quantity-growth ratio.
# ---------------------------------------------------------------------------

_Q74 = f"""
WITH yearly AS (
  SELECT c_name AS cust, year(o_orderdate) AS yr,
         CASE WHEN l_linestatus = 'O' THEN 'web' ELSE 'store' END AS chan,
         sum({_QTY}) AS q
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_name, year(o_orderdate),
           CASE WHEN l_linestatus = 'O' THEN 'web' ELSE 'store' END)
SELECT s2.cust AS cust
FROM yearly s1
JOIN yearly s2 ON s1.cust = s2.cust AND s1.chan = 'store' AND s2.chan = 'store'
             AND s1.yr = 1996 AND s2.yr = 1997
JOIN yearly w1 ON w1.cust = s1.cust AND w1.chan = 'web' AND w1.yr = 1996
JOIN yearly w2 ON w2.cust = s1.cust AND w2.chan = 'web' AND w2.yr = 1997
WHERE s1.q > 0 AND w1.q > 0
  AND w2.q * s1.q > s2.q * w1.q
ORDER BY cust
LIMIT 100
"""


# r11 optimization (guide §2.4): the 4-way self-join inlines `yearly`
# four times — FOUR unfiltered lineitem⋈orders⋈customer joins. The
# executed spelling pivots on (channel, year) in ONE pass with
# count_if presence flags (IS DISTINCT FROM keeps the original CASE's
# NULL→store mapping) and pre-filters to the two years the join pins.
# Row-identical at sf1; 3/3 trial wins, 2.037 → 1.376 s min-of-3
# (PROBE_r11_pivot2.json). Oracle runs the 4-way self-join text.
_Q74_SPARK = f"""
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


@query("tpcds_q74_shape", _Q74)
def tpcds_q74_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74 shape: customers whose web quantity growth outpaced
    their store growth year-over-year — q74 is q11/q4 with quantity.
    The growth comparison w2/w1 > s2/s1 is cross-multiplied in DECIMAL.

    Executes the (channel, year)-pivot spelling (_Q74_SPARK — one fact
    pass); the oracle runs the original 4-way self-join text."""
    return _sql(spark, sf_dir, _Q74_SPARK)


# ---------------------------------------------------------------------------
# q76: sentinel-attribute fact rows per (channel, quarter, type).
# ---------------------------------------------------------------------------

_Q76 = f"""
SELECT CASE WHEN l_linestatus = 'O' THEN 'web'
            WHEN l_returnflag = 'R' THEN 'catalog'
            ELSE 'store' END AS channel,
       quarter(l_shipdate) AS qtr, p_type AS ty,
       CAST(count(*) AS BIGINT) AS sales_cnt,
       CAST(sum({_PRICE}) AS DOUBLE) AS sales_amt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_tax = 0
GROUP BY CASE WHEN l_linestatus = 'O' THEN 'web'
              WHEN l_returnflag = 'R' THEN 'catalog'
              ELSE 'store' END,
         quarter(l_shipdate), p_type
ORDER BY channel, qtr, ty
LIMIT 100
"""


@query("tpcds_q76_shape", _Q76)
def tpcds_q76_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 shape: count and value of fact rows carrying a sentinel
    attribute (zero tax standing in for the NULL store/customer keys the
    original probes) per (channel, quarter, item type) — q76's 3-branch
    UNION ALL rides one scan since the channels partition the fact."""
    return _sql(spark, sf_dir, _Q76)


# ---------------------------------------------------------------------------
# q78: yearly (customer, item) sales excluding returns, channel ratio.
# ---------------------------------------------------------------------------

_Q78 = f"""
WITH ss AS (
  SELECT year(o_orderdate) AS yr, o_custkey AS ck, l_partkey AS pk,
         sum(CASE WHEN l_linestatus <> 'O' THEN {_QTY} ELSE {_DECQ0} END)
             AS s_qty,
         sum(CASE WHEN l_linestatus = 'O' THEN {_QTY} ELSE {_DECQ0} END)
             AS w_qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag <> 'R'
  GROUP BY year(o_orderdate), o_custkey, l_partkey)
SELECT yr, CAST(ck AS BIGINT) AS ck, CAST(pk AS BIGINT) AS pk,
       CAST(s_qty AS DOUBLE) AS store_qty,
       CAST(w_qty AS DOUBLE) AS web_qty,
       CAST(w_qty AS DOUBLE) / CAST(s_qty AS DOUBLE) AS ratio
FROM ss
WHERE yr = 1997 AND s_qty > 0 AND w_qty > 0
ORDER BY ratio DESC, ck, pk
LIMIT 100
"""


@query("tpcds_q78_shape", _Q78)
def tpcds_q78_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape: yearly (customer, item) quantities with returned
    lines excluded, web-to-store ratio for cells active in both channels
    — q78's ws/ss CTE join with the returns LEFT JOIN ... IS NULL
    expressed as the returnflag exclusion. One fact shuffle on the
    3-part grain; both channel sums ride it as conditional aggregates."""
    return _sql(spark, sf_dir, _Q78)


# ---------------------------------------------------------------------------
# q80: per-channel sales/returns/profit ROLLUP, netted per line.
# ---------------------------------------------------------------------------

_Q80 = f"""
WITH base AS (
  SELECT CASE WHEN l_linestatus = 'O' THEN 'web channel'
              ELSE 'store channel' END AS channel,
         p_brand AS id,
         CASE WHEN l_returnflag <> 'R' THEN {_REV} ELSE {_DEC0} END AS sales,
         CASE WHEN l_returnflag = 'R' THEN {_REV} ELSE {_DEC0} END AS returns
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-07-01'
    AND p_retailprice > 500)
SELECT channel, id,
       CAST(sum(sales) AS DOUBLE) AS sales,
       CAST(sum(returns) AS DOUBLE) AS returns,
       CAST(sum(sales - returns) AS DOUBLE) AS profit,
       CAST(grouping(channel) AS BIGINT) AS g_channel,
       CAST(grouping(id) AS BIGINT) AS g_id
FROM base
GROUP BY ROLLUP (channel, id)
ORDER BY g_channel, g_id, channel, id
LIMIT 100
"""


@query("tpcds_q80_shape", _Q80)
def tpcds_q80_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q80 shape: sales/returns/profit rolled up over
    (channel, item) under promo + price + date filters — q80 extends
    q77's report with per-line netting and tighter dims; the returns
    LEFT JOIN is the returnflag split. Expand over one fact scan."""
    return _sql(spark, sf_dir, _Q80)


# ---------------------------------------------------------------------------
# q81: customers whose return quantity tops 1.2x the nation average.
# ---------------------------------------------------------------------------

_Q81 = f"""
WITH ret AS (
  SELECT o_custkey AS ck, sum({_QTY}) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey),
w AS (
  SELECT ck, q, c_name, c_nationkey,
         sum(q) OVER (PARTITION BY c_nationkey) AS s_nat,
         count(*) OVER (PARTITION BY c_nationkey) AS n_nat
  FROM ret JOIN customer ON c_custkey = ck)
SELECT c_name, CAST(q AS DOUBLE) AS return_qty
FROM w
WHERE q * n_nat * 10 > s_nat * 12
ORDER BY c_name
LIMIT 100
"""


@query("tpcds_q81_shape", _Q81)
def tpcds_q81_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q81 shape: customers returning >1.2x their state's (here
    nation's) average — q81 is q30's catalog twin measured in quantity
    instead of revenue. The per-nation average is a window over the
    per-customer agg, never a re-scan; the 1.2x test is
    cross-multiplied."""
    return _sql(spark, sf_dir, _Q81)


# ---------------------------------------------------------------------------
# q82: q37's store twin (different bands, same spine).
# ---------------------------------------------------------------------------

_Q82 = f"""
SELECT p_brand AS brand, p_type AS ty,
       CAST(min(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
           AS min_price,
       CAST(count(*) AS BIGINT) AS n_lines
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_retailprice BETWEEN 950 AND 999
  AND l_quantity BETWEEN 5 AND 30
  AND l_shipdate >= TIMESTAMP '1997-04-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
GROUP BY p_brand, p_type
ORDER BY brand, ty
LIMIT 100
"""


@query("tpcds_q82_shape", _Q82)
def tpcds_q82_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q82 shape: the store twin of q37 — items in a higher price
    band with on-hand quantity in a tighter range over a different
    window, plus the line count. Same pushed-filter broadcast star."""
    return _sql(spark, sf_dir, _Q82)


# ---------------------------------------------------------------------------
# q83: 3-return-class part counts over a mutual date set.
# ---------------------------------------------------------------------------

_Q83 = f"""
WITH dates AS (
  SELECT DISTINCT o_orderdate AS d FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-02-01'),
r AS (
  SELECT l_partkey AS pk, sum({_QTY}) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND o_orderdate IN (SELECT d FROM dates)
  GROUP BY l_partkey),
a AS (
  SELECT l_partkey AS pk, sum({_QTY}) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'A' AND o_orderdate IN (SELECT d FROM dates)
  GROUP BY l_partkey),
n AS (
  SELECT l_partkey AS pk, sum({_QTY}) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'N' AND o_orderdate IN (SELECT d FROM dates)
  GROUP BY l_partkey)
SELECT p_brand AS brand,
       CAST(sum(r.q) AS DOUBLE) AS r_qty,
       CAST(sum(a.q) AS DOUBLE) AS a_qty,
       CAST(sum(n.q) AS DOUBLE) AS n_qty
FROM r JOIN a ON r.pk = a.pk JOIN n ON r.pk = n.pk
JOIN part ON p_partkey = r.pk
GROUP BY p_brand
ORDER BY brand
LIMIT 100
"""


# r11 optimization (guide §2.4): the three return-class branches each
# scanned lineitem⋈orders and re-evaluated the mutual date subquery.
# One returnflag pivot with count_if presence flags (the 3-way inner
# join holds iff all three classes have rows for the part) runs one
# scan and one date-set evaluation. Row-set-identical at sf1; 3/3
# trial wins, 2.008 → 1.017 s min-of-3 (PROBE_r11_pivot4.json).
_Q83_SPARK = """
WITH dates AS (
  SELECT DISTINCT o_orderdate AS d FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-02-01'),
flags AS (
  SELECT l_partkey AS pk,
         sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS rq,
         count_if(l_returnflag = 'R') AS nr,
         sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS aq,
         count_if(l_returnflag = 'A') AS na,
         sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS nq,
         count_if(l_returnflag = 'N') AS nn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag IN ('R', 'A', 'N')
    AND o_orderdate IN (SELECT d FROM dates)
  GROUP BY l_partkey)
SELECT p_brand AS brand,
       CAST(sum(rq) AS DOUBLE) AS r_qty,
       CAST(sum(aq) AS DOUBLE) AS a_qty,
       CAST(sum(nq) AS DOUBLE) AS n_qty
FROM flags JOIN part ON p_partkey = pk
WHERE nr > 0 AND na > 0 AND nn > 0
GROUP BY p_brand
ORDER BY brand
LIMIT 100
"""


@query("tpcds_q83_shape", _Q83)
def tpcds_q83_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q83 shape: per-item quantities across the three return
    classes restricted to a shared date set — q83's sr/cr/wr triple with
    its date_dim IN-subquery (the mutual month). The date set semi-joins
    each branch; the three branch aggs meet in two small joins."""
    return _sql(spark, sf_dir, _Q83_SPARK)


# ---------------------------------------------------------------------------
# q84: customer directory for an income band, returns-joined.
# ---------------------------------------------------------------------------

_Q84 = """
SELECT c_name || ', ' || c_mktsegment AS customer_info,
       CAST(count(*) AS BIGINT) AS n_returns
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_acctbal BETWEEN 0 AND 6000
  AND n_name IN ('NATION_1', 'NATION_6', 'NATION_10', 'NATION_14', 'NATION_22')
  AND l_returnflag = 'R'
GROUP BY c_name || ', ' || c_mktsegment
ORDER BY customer_info
LIMIT 100
"""


@query("tpcds_q84_shape", _Q84)
def tpcds_q84_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q84 shape: formatted customer directory rows for an income
    (acctbal) band in chosen geos, one row per customer with their
    return count — q84's household-demographics chain collapsed to the
    attributes our schema carries, keeping the concat-projection and
    the returns join."""
    return _sql(spark, sf_dir, _Q84)


# ---------------------------------------------------------------------------
# q85: return-reason averages under OR'd demographic triples.
# ---------------------------------------------------------------------------

_Q85 = f"""
SELECT o_orderpriority AS reason,
       CAST(sum({_QTY}) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum({_REV}) AS DOUBLE) / count(*) AS avg_refund
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND ((c_mktsegment = 'AUTOMOBILE' AND c_acctbal BETWEEN 0 AND 3000
          AND l_quantity BETWEEN 1 AND 20)
    OR (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 3000 AND 7000
          AND l_quantity BETWEEN 21 AND 35)
    OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 7000 AND 10000
          AND l_quantity BETWEEN 36 AND 50))
GROUP BY o_orderpriority
ORDER BY reason
LIMIT 100
"""


@query("tpcds_q85_shape", _Q85)
def tpcds_q85_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q85 shape: average quantity and refund per return reason
    (priority standing in for reason) under OR'd (segment, balance,
    quantity) triples — q85's web_returns demographic disjunction on
    the q13 pattern, restricted to returned lines."""
    return _sql(spark, sf_dir, _Q85)


# ---------------------------------------------------------------------------
# q86: web profit ROLLUP ranked within hierarchy level.
# ---------------------------------------------------------------------------

_Q86 = f"""
WITH rolled AS (
  SELECT p_type AS ty, p_brand AS brand, sum({_REV}) AS profit,
         grouping(p_type) + grouping(p_brand) AS lochierarchy,
         grouping(p_brand) AS g_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_linestatus = 'O'
  GROUP BY ROLLUP (p_type, p_brand))
SELECT CAST(profit AS DOUBLE) AS total_profit, ty, brand,
       CAST(lochierarchy AS BIGINT) AS lochierarchy,
       CAST(rank() OVER (
           PARTITION BY lochierarchy, CASE WHEN g_brand = 1 THEN ty END
           ORDER BY profit DESC, brand) AS BIGINT) AS rank_within_parent
FROM rolled
ORDER BY lochierarchy DESC, ty, brand, rank_within_parent
LIMIT 100
"""


@query("tpcds_q86_shape", _Q86)
def tpcds_q86_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q86 shape: web-channel profit over a (category, brand)
    ROLLUP with rank-within-parent — q86 is q70's item-hierarchy twin
    without the top-5-state semi-join. One Expand + one window over the
    agg output."""
    return _sql(spark, sf_dir, _Q86)


# ---------------------------------------------------------------------------
# q90: morning-to-evening event-count ratio.
# ---------------------------------------------------------------------------

_Q90 = """
SELECT CAST(am.cnt AS DOUBLE) / CAST(pm.cnt AS DOUBLE) AS am_pm_ratio
FROM (SELECT count(*) AS cnt FROM events
      WHERE hour(ts) BETWEEN 6 AND 11) am,
     (SELECT count(*) AS cnt FROM events
      WHERE hour(ts) BETWEEN 18 AND 23) pm
WHERE pm.cnt > 0
"""


@query("tpcds_q90_shape", _Q90)
def tpcds_q90_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 shape: ratio of morning to evening activity — q90's
    am/pm web_sales count pair over time_dim hour bands, on the events
    table (the intra-day fixture). Two 1-row aggregates cross-joined;
    the hour filters push to the scans."""
    return _sql(spark, sf_dir, _Q90)


# ---------------------------------------------------------------------------
# q91: call-center return losses per (nation, priority), one month.
# ---------------------------------------------------------------------------

_Q91 = f"""
SELECT n_name AS call_center, o_orderpriority AS status,
       CAST(sum({_REV}) AS DOUBLE) AS returns_loss
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-11-01'
  AND o_orderdate < TIMESTAMP '1997-12-01'
  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal < 5000
GROUP BY n_name, o_orderpriority
ORDER BY returns_loss DESC, call_center, status
LIMIT 100
"""


@query("tpcds_q91_shape", _Q91)
def tpcds_q91_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q91 shape: returned revenue (the loss) per (call
    center↦nation, order status↦priority) for one month and one
    demographic slice — q91's call_center x catalog_returns report.
    All dims broadcast; single shuffle on the report grain."""
    return _sql(spark, sf_dir, _Q91)


# ---------------------------------------------------------------------------
# q95: orders from a two-supplier order set (CTE reused), no returns.
# ---------------------------------------------------------------------------

_Q95 = """
WITH ws_wh AS (
  SELECT DISTINCT l1.l_orderkey AS ok
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS order_cnt,
       CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
FROM orders
WHERE o_orderpriority = '2-HIGH'
  AND o_orderkey IN (SELECT ok FROM ws_wh)
  AND o_orderkey NOT IN (
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


@query("tpcds_q95_shape", _Q95)
def tpcds_q95_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape: count + value of high-priority orders that drew
    from at least two suppliers (the ws_wh self-join CTE, q95's
    signature) and had no returns — q94's EXISTS pair upgraded to the
    IN/NOT-IN form over a reused CTE. The NOT IN plans as a null-aware
    anti-join; l_orderkey is never null in the fixtures so its
    semantics match the EXISTS form."""
    return _sql(spark, sf_dir, _Q95)


# ---------------------------------------------------------------------------
# q96: one-cell count under time band + quantity band + store.
# ---------------------------------------------------------------------------

_Q96 = """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l_quantity BETWEEN 20 AND 30
  AND l_discount BETWEEN 0.02 AND 0.05
  AND n_name = 'NATION_7'
"""


@query("tpcds_q96_shape", _Q96)
def tpcds_q96_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q96 shape: a single count cell under three conjunctive
    band filters (q88's 8x grid sibling runs the full grid; q96 is the
    one-cell probe). Everything folds into scan filters plus two
    broadcast semi edges; the answer is one partial-count merge."""
    return _sql(spark, sf_dir, _Q96)


# ---------------------------------------------------------------------------
# q98: item revenue share within type (ORDER differs from q20).
# ---------------------------------------------------------------------------

_Q98 = f"""
WITH rev AS (
  SELECT p_name AS item, p_type AS ty, p_brand AS brand, sum({_REV}) AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-02-01'
    AND l_shipdate < TIMESTAMP '1997-03-01'
  GROUP BY p_name, p_type, p_brand)
SELECT item, ty, brand, CAST(r AS DOUBLE) AS itemrevenue,
       CAST(r * 100 AS DOUBLE) / sum(CAST(r AS DOUBLE)) OVER
           (PARTITION BY ty) AS revenueratio
FROM rev
ORDER BY ty, item, revenueratio
LIMIT 100
"""


@query("tpcds_q98_shape", _Q98)
def tpcds_q98_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98 shape: per-item store revenue with its share of the
    type's total — same window family as q12/q20 but at item grain with
    the store channel's ordering. The ratio denominator is a window over
    the agg output."""
    return _sql(spark, sf_dir, _Q98)


# ---------------------------------------------------------------------------
# q99: catalog twin of q62's lag-bucket report.
# ---------------------------------------------------------------------------

_Q99 = """
SELECT n_name AS warehouse, o_orderpriority AS ship_mode,
       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 80 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d80,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 80 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 100 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d100,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d100plus
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l_returnflag = 'A'
GROUP BY n_name, o_orderpriority
ORDER BY warehouse, ship_mode
LIMIT 100
"""


@query("tpcds_q99_shape", _Q99)
def tpcds_q99_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q99 shape: the catalog twin of q62 — lag histogram with
    shifted bucket edges (60/80/100 days) on a different fact slice,
    mirroring the reference's separate q99 entry."""
    return _sql(spark, sf_dir, _Q99)


# ---------------------------------------------------------------------------
# a/b variants: the reference's batch gate runs 103 VARIANTS (99 families
# + 14a/b, 23a/b, 24a/b, 39a/b — TpcdsTestProgram.java:76-85). The *_shape
# entries above model the "a" member of each pair; these four model the
# "b" member's distinguishing plan twist.
# ---------------------------------------------------------------------------

_Q14B = f"""
WITH both_years AS (
  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  INTERSECT
  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'),
this_year AS (
  SELECT p_brand AS brand, sum({_REV}) AS r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN both_years b ON lineitem.l_partkey = b.l_partkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY p_brand),
last_year AS (
  SELECT p_brand AS brand, sum({_REV}) AS r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN both_years b ON lineitem.l_partkey = b.l_partkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY p_brand)
SELECT t.brand AS brand,
       CAST(t.r AS DOUBLE) AS this_year_sales,
       CAST(l.r AS DOUBLE) AS last_year_sales
FROM this_year t JOIN last_year l ON t.brand = l.brand
ORDER BY brand
LIMIT 100
"""


# r11 optimization (guide §2.4 + the rule-#3 mechanism): the INTERSECT
# (2 lineitem⋈orders scans) was additionally re-inlined into BOTH
# period rollups — ~6 fact scans total. Two passes now: one union-agg
# flag pass for the both-years key set (HAVING both period count_ifs),
# one year-pivot rollup over the semi-filtered fact. Row-set-identical
# at sf1; 3/3 trial wins, 2.626 → 1.362 s min-of-3
# (PROBE_r11_pivot4.json). Oracle runs the INTERSECT text verbatim.
_Q14B_SPARK = """
WITH both_years AS (
  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey
  HAVING count_if(o_orderdate < TIMESTAMP '1997-01-01') > 0
     AND count_if(o_orderdate >= TIMESTAMP '1997-01-01') > 0),
yr AS (
  SELECT p_brand AS brand,
         sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) END) AS r97,
         count_if(o_orderdate >= TIMESTAMP '1997-01-01') AS n97,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) END) AS r96,
         count_if(o_orderdate < TIMESTAMP '1997-01-01') AS n96
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN both_years b ON lineitem.l_partkey = b.l_partkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY p_brand)
SELECT brand,
       CAST(r97 AS DOUBLE) AS this_year_sales,
       CAST(r96 AS DOUBLE) AS last_year_sales
FROM yr
WHERE n97 > 0 AND n96 > 0
ORDER BY brand
LIMIT 100
"""


@query("tpcds_q14b_shape", _Q14B)
def tpcds_q14b_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14b shape: where q14a rolls the cross-channel
    (INTERSECT-derived) item set into one report, q14b compares this
    week vs last year's same week over that set — here the shared
    both_years key set semi-filters two period aggregates joined side
    by side. The CTE is evaluated once per branch; both branches share
    the broadcast key set."""
    return _sql(spark, sf_dir, _Q14B_SPARK)


_Q23B = f"""
WITH frequent AS (
  SELECT l_partkey AS pk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey
  HAVING count(*) > 4),
spend AS (
  SELECT c_name AS cust, sum({_REV}) AS total_spend
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN frequent f ON lineitem.l_partkey = f.pk
  GROUP BY c_name)
SELECT cust, CAST(total_spend AS DOUBLE) AS total_spend
FROM spend
ORDER BY total_spend DESC, cust
LIMIT 10
"""


@query("tpcds_q23b_shape", _Q23B)
def tpcds_q23b_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23b shape: q23a totals sales of frequent items; q23b
    instead ranks the top customers buying them — the frequency-derived
    key set semi-filters the fact, then a per-customer rollup feeds a
    top-10. Same derived-broadcast-dim property as q23a with the
    aggregate-then-TakeOrdered tail."""
    return _sql(spark, sf_dir, _Q23B)


_Q24B = f"""
WITH sales AS (
  SELECT c_name AS cust, p_type AS ty, sum({_REV}) AS net
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'R'
  GROUP BY c_name, p_type),
thr AS (
  SELECT sum(net) AS s, count(*) AS n FROM sales)
SELECT cust, ty, CAST(net AS DOUBLE) AS paid
FROM sales, thr
WHERE net * n * 10 > s
ORDER BY cust, ty
LIMIT 100
"""


@query("tpcds_q24b_shape", _Q24B)
def tpcds_q24b_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q24b shape: the b variant differs from a only in the item
    slice (color literal) and threshold; here the cells are
    (customer, type) at a 10% threshold vs a's (customer, brand) at 5%.
    Same broadcast-threshold plan."""
    return _sql(spark, sf_dir, _Q24B)


_Q39B = f"""
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
  AND m2.s * m1.n < m1.s * m2.n
ORDER BY partkey
"""


# r11 optimization (guide §2.4): quarter-pivot the twice-inlined `m`
# CTE — one lineitem pass (PROBE_r11_pivot2.json: 1.124 → 0.638 s
# min-of-3, 3/3 wins, row-identical). Oracle runs the self-join text.
_Q39B_SPARK = f"""
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


@query("tpcds_q39b_shape", _Q39B)
def tpcds_q39b_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39b shape: q39a keeps items volatile in BOTH periods;
    q39b tightens the first-period test and adds a direction — volatile
    in the first quarter AND declining mean into the second (the mean
    comparison cross-multiplied over exact DECIMAL sums). Executes the
    quarter-pivot spelling (_Q39B_SPARK); oracle runs the original."""
    return _sql(spark, sf_dir, _Q39B_SPARK)
