"""TPC-DS-shaped queries, round-4 breadth (part 4): q46-q71 gap fill.

Continues queries_tpcds4.py (same dialect/determinism/mapping rules;
same spec source: flink-end-to-end-tests/flink-tpcds-test/.../
TpcdsTestProgram.java:76-85).

  q46-shape  per-(customer, city) profit where bought city differs
  q47-shape  monthly brand sales deviating from the yearly avg (window
             + lag/lead neighbors) — the v1 time-series family
  q48-shape  quantity sum under OR'd (segment × acctbal × nation) triples
  q50-shape  return-lag day buckets per store (CASE on date arithmetic)
  q53-shape  quarterly manufacturer sales vs their yearly average
  q54-shape  revenue of customers in the month after their first purchase
  q55-shape  one-month brand revenue (q42/q52 kin, different grain)
  q56-shape  3-channel revenue for a size list
  q57-shape  (brand, nation) monthly deviation with lag/lead (catalog v1)
  q59-shape  week-over-week store revenue ratio across two half-years
  q61-shape  promotional-to-total revenue ratio per nation
  q62-shape  shipping-lag day buckets per (warehouse, priority)
  q63-shape  monthly manager-group sales vs yearly average
  q64-shape  cross-year (item, nation) sales pairs with price ratio band
  q66-shape  12-month pivoted warehouse revenue, two modes UNION ALL'd
  q68-shape  per-(customer, city) charges, bought city differs, top rows
  q70-shape  profit ROLLUP over (region, nation) ranked within level
  q71-shape  brand revenue by order-hour band across 3 channels
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
_TAX = "CAST(l_tax AS DECIMAL(18,4))"
_DEC0 = "CAST(0 AS DECIMAL(22,4))"


# ---------------------------------------------------------------------------
# q46: per-(customer, city) profit where the bought city differs.
# ---------------------------------------------------------------------------

_Q46 = f"""
SELECT c_name AS cust, nc.n_name AS home_nation, ns.n_name AS bought_nation,
       CAST(sum({_REV}) AS DOUBLE) AS amt,
       CAST(sum({_REV} * {_TAX}) AS DOUBLE) AS tax_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE nc.n_name <> ns.n_name
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_name, nc.n_name, ns.n_name
ORDER BY cust, home_nation, bought_nation
LIMIT 100
"""


@query("tpcds_q46_shape", _Q46)
def tpcds_q46_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46 shape: amount and tax-profit per (customer, home geo,
    bought geo) where the bought city differs from home — q46's
    current_addr.ca_city <> bought_city anti-equality, with nation
    joined under two roles. Both nation edges broadcast; one fact
    shuffle on the customer grain."""
    return _sql(spark, sf_dir, _Q46)


# ---------------------------------------------------------------------------
# q47: monthly brand sales deviating from the yearly average (v1 family).
# ---------------------------------------------------------------------------

_Q47 = f"""
WITH monthly AS (
  SELECT p_brand AS brand, year(l_shipdate) AS yr, month(l_shipdate) AS mo,
         sum({_REV}) AS s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, year(l_shipdate), month(l_shipdate)),
w AS (
  SELECT brand, yr, mo, s,
         sum(s) OVER (PARTITION BY brand, yr) AS s_yr,
         count(*) OVER (PARTITION BY brand, yr) AS n_yr,
         lag(s) OVER (PARTITION BY brand ORDER BY yr, mo) AS psum,
         lead(s) OVER (PARTITION BY brand ORDER BY yr, mo) AS nsum
  FROM monthly)
SELECT brand, yr, mo, CAST(s AS DOUBLE) AS sum_sales,
       CAST(s_yr AS DOUBLE) / n_yr AS avg_monthly_sales,
       CAST(psum AS DOUBLE) AS prev_sum, CAST(nsum AS DOUBLE) AS next_sum
FROM w
WHERE yr = 1997
  AND psum IS NOT NULL AND nsum IS NOT NULL
  AND (s * n_yr * 10 > s_yr * 11 OR s * n_yr * 10 < s_yr * 9)
ORDER BY brand, yr, mo
LIMIT 100
"""


@query("tpcds_q47_shape", _Q47)
def tpcds_q47_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape: months where a brand's sales deviate >10% from
    its yearly monthly average, reported with the neighboring months'
    sums — q47's three-window plan (yearly avg partition + lag + lead
    on one monthly agg). The deviation test is cross-multiplied; the
    windows share one sort of the small agg output."""
    return _sql(spark, sf_dir, _Q47)


# ---------------------------------------------------------------------------
# q48: quantity sum under OR'd (segment × acctbal × nation) triples.
# ---------------------------------------------------------------------------

_Q48 = f"""
SELECT CAST(sum({_QTY}) AS DOUBLE) AS total_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE (c_mktsegment = 'FURNITURE' AND c_acctbal BETWEEN 0 AND 2500
         AND n_name IN ('NATION_0', 'NATION_4', 'NATION_8'))
   OR (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 2500 AND 6000
         AND n_name IN ('NATION_9', 'NATION_13', 'NATION_17'))
   OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 6000 AND 10000
         AND n_name IN ('NATION_19', 'NATION_21', 'NATION_24'))
"""


@query("tpcds_q48_shape", _Q48)
def tpcds_q48_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q48 shape: one-row quantity total under a disjunction of
    (segment, balance band, geo set) triples — q48's store twin of q13
    with sum instead of avg. The OR touches only dim columns, so
    Catalyst pre-filters customer before the broadcast."""
    return _sql(spark, sf_dir, _Q48)


# ---------------------------------------------------------------------------
# q50: return-lag day buckets per store.
# ---------------------------------------------------------------------------

_Q50 = """
SELECT s_name AS store,
       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 120 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d120,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d120plus
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_returnflag = 'R'
GROUP BY s_name
ORDER BY store
LIMIT 100
"""


@query("tpcds_q50_shape", _Q50)
def tpcds_q50_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q50 shape: per-store histogram of order-to-return-ship lag
    in 30-day buckets — q50's CASE battery on date arithmetic between
    the sale and return date rows. The lag test uses timestamp +
    INTERVAL comparisons (identical semantics in both engines); one
    shuffle on store."""
    return _sql(spark, sf_dir, _Q50)


# ---------------------------------------------------------------------------
# q53: quarterly manufacturer sales vs their yearly average.
# ---------------------------------------------------------------------------

_Q53 = f"""
WITH q AS (
  SELECT p_brand AS brand, year(l_shipdate) AS yr,
         quarter(l_shipdate) AS qtr, sum({_REV}) AS s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type LIKE 'STANDARD%' OR p_type LIKE 'ECONOMY%'
  GROUP BY p_brand, year(l_shipdate), quarter(l_shipdate)),
w AS (
  SELECT brand, yr, qtr, s,
         sum(s) OVER (PARTITION BY brand, yr) AS s_yr,
         count(*) OVER (PARTITION BY brand, yr) AS n_yr
  FROM q)
SELECT brand, yr, qtr, CAST(s AS DOUBLE) AS sum_sales,
       CAST(s_yr AS DOUBLE) / n_yr AS avg_quarterly_sales
FROM w
WHERE s * n_yr * 10 < s_yr * 9
ORDER BY brand, yr, qtr
LIMIT 100
"""


@query("tpcds_q53_shape", _Q53)
def tpcds_q53_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53 shape: quarters where a manufacturer's sales fall below
    0.9x its yearly quarterly average — q53's windowed-average filter
    over a category slice (q63 is the monthly twin). The window filter
    references the same partition the projection uses, so one window
    sort serves both."""
    return _sql(spark, sf_dir, _Q53)


# ---------------------------------------------------------------------------
# q54: revenue of customers in the month after their first purchase.
# ---------------------------------------------------------------------------

_Q54 = f"""
WITH first_buy AS (
  SELECT o_custkey AS ck, min(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey),
follow AS (
  SELECT c_custkey, sum({_REV}) AS r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN first_buy ON ck = c_custkey
  WHERE o_orderdate > first_dt
    AND o_orderdate <= first_dt + INTERVAL 30 DAY
  GROUP BY c_custkey)
SELECT CAST(floor(r / 50) AS BIGINT) AS segment,
       CAST(count(*) AS BIGINT) AS num_customers
FROM follow
GROUP BY CAST(floor(r / 50) AS BIGINT)
ORDER BY segment
LIMIT 100
"""


@query("tpcds_q54_shape", _Q54)
def tpcds_q54_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape: histogram (50-unit segments) of customer revenue
    in the 30 days after each customer's first purchase — q54's
    consecutive-month cohort revenue with the month arithmetic done as
    date INTERVAL bounds against a per-customer min() CTE. The first_buy
    agg reuses the orders shuffle key; the histogram is a second tiny
    agg."""
    return _sql(spark, sf_dir, _Q54)


# ---------------------------------------------------------------------------
# q55: one-month brand revenue.
# ---------------------------------------------------------------------------

_Q55 = f"""
SELECT p_brand AS brand, CAST(sum({_REV}) AS DOUBLE) AS ext_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-11-01' AND l_shipdate < TIMESTAMP '1997-12-01'
GROUP BY p_brand
ORDER BY ext_price DESC, brand
LIMIT 100
"""


@query("tpcds_q55_shape", _Q55)
def tpcds_q55_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q55 shape: brand revenue for one (year, month) — the
    simplest member of the q42/q52/q55 star family, kept as its own
    entry because the reference runs it as its own query. Part
    broadcasts; the month predicate folds to a scan filter."""
    return _sql(spark, sf_dir, _Q55)


# ---------------------------------------------------------------------------
# q56: 3-channel revenue for a size list.
# ---------------------------------------------------------------------------

_Q56 = f"""
WITH chan AS (
  SELECT p_brand AS brand,
         CASE WHEN l_linestatus = 'O' THEN 'web'
              WHEN l_returnflag = 'R' THEN 'catalog'
              ELSE 'store' END AS channel,
         {_REV} AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size IN (5, 10, 15, 20, 25)
    AND l_shipdate >= TIMESTAMP '1997-05-01'
    AND l_shipdate < TIMESTAMP '1997-08-01')
SELECT brand, CAST(sum(rev) AS DOUBLE) AS total_rev,
       CAST(sum(CASE WHEN channel = 'web' THEN rev ELSE {_DEC0} END)
            AS DOUBLE) AS web_rev,
       CAST(sum(CASE WHEN channel = 'catalog' THEN rev ELSE {_DEC0} END)
            AS DOUBLE) AS catalog_rev,
       CAST(sum(CASE WHEN channel = 'store' THEN rev ELSE {_DEC0} END)
            AS DOUBLE) AS store_rev
FROM chan
GROUP BY brand
ORDER BY total_rev DESC, brand
LIMIT 100
"""


@query("tpcds_q56_shape", _Q56)
def tpcds_q56_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q56 shape: per-item revenue summed across the three
    channels for a size list, with the per-channel contributions kept
    as columns — q56's union of ss/cs/ws branch CTEs rides one scan
    here (the channels partition the fact), so the original's 3-scan
    union becomes conditional sums after one broadcast join."""
    return _sql(spark, sf_dir, _Q56)


# ---------------------------------------------------------------------------
# q57: (brand, nation) monthly deviation with lag/lead (catalog v1).
# ---------------------------------------------------------------------------

_Q57 = f"""
WITH monthly AS (
  SELECT p_brand AS brand, n_name AS nation,
         year(l_shipdate) AS yr, month(l_shipdate) AS mo, sum({_REV}) AS s
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY p_brand, n_name, year(l_shipdate), month(l_shipdate)),
w AS (
  SELECT brand, nation, yr, mo, s,
         sum(s) OVER (PARTITION BY brand, nation, yr) AS s_yr,
         count(*) OVER (PARTITION BY brand, nation, yr) AS n_yr,
         lag(s) OVER (PARTITION BY brand, nation ORDER BY yr, mo) AS psum,
         lead(s) OVER (PARTITION BY brand, nation ORDER BY yr, mo) AS nsum
  FROM monthly)
SELECT brand, nation, yr, mo, CAST(s AS DOUBLE) AS sum_sales,
       CAST(s_yr AS DOUBLE) / n_yr AS avg_monthly_sales,
       CAST(psum AS DOUBLE) AS prev_sum, CAST(nsum AS DOUBLE) AS next_sum
FROM w
WHERE yr = 1997 AND psum IS NOT NULL AND nsum IS NOT NULL
  AND (s * n_yr * 10 > s_yr * 11 OR s * n_yr * 10 < s_yr * 9)
ORDER BY brand, nation, yr, mo
LIMIT 100
"""


@query("tpcds_q57_shape", _Q57)
def tpcds_q57_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q57 shape: the catalog twin of q47 — monthly deviation from
    the yearly average per (brand, call-center↦nation) with lag/lead
    context columns. Same three-window single-sort plan, one more
    broadcast dim edge."""
    return _sql(spark, sf_dir, _Q57)


# ---------------------------------------------------------------------------
# q59: week-over-week store revenue ratio across two half-years.
# ---------------------------------------------------------------------------

_Q59 = f"""
WITH weekly AS (
  SELECT s_name AS store, year(l_shipdate) AS yr,
         month(l_shipdate) AS mo, sum({_REV}) AS s
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_name, year(l_shipdate), month(l_shipdate))
SELECT a.store AS store, a.mo AS mo,
       CAST(a.s AS DOUBLE) AS sales_this_year,
       CAST(b.s AS DOUBLE) AS sales_last_year,
       CAST(a.s AS DOUBLE) / CAST(b.s AS DOUBLE) AS yoy_ratio
FROM weekly a
JOIN weekly b ON a.store = b.store AND a.mo = b.mo
            AND a.yr = 1997 AND b.yr = 1996
WHERE b.s > 0
ORDER BY store, mo
LIMIT 100
"""


# r11 optimization (guide §2.4, the PROBE_r11_yoy_pivot mechanism):
# the year self-join inlines `weekly` twice — two lineitem⋈supplier
# scans+aggregates. Year pivot with count_if presence flags runs one.
# Row-set-identical at sf1; 3/3 trial wins, 1.742 → 1.071 s min-of-3
# (PROBE_r11_pivot4.json). Oracle runs the self-join text.
_Q59_SPARK = """
WITH weekly AS (
  SELECT s_name AS store, month(l_shipdate) AS mo,
         sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) END) AS s97,
         count_if(year(l_shipdate) = 1997) AS n97,
         sum(CASE WHEN year(l_shipdate) = 1996 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) END) AS s96,
         count_if(year(l_shipdate) = 1996) AS n96
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE year(l_shipdate) IN (1996, 1997)
  GROUP BY s_name, month(l_shipdate))
SELECT store, mo,
       CAST(s97 AS DOUBLE) AS sales_this_year,
       CAST(s96 AS DOUBLE) AS sales_last_year,
       CAST(s97 AS DOUBLE) / CAST(s96 AS DOUBLE) AS yoy_ratio
FROM weekly
WHERE n97 > 0 AND n96 > 0 AND s96 > 0
ORDER BY store, mo
LIMIT 100
"""


@query("tpcds_q59_shape", _Q59)
def tpcds_q59_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 shape: store revenue per period this year joined to the
    same period last year with the ratio — q59's wss self-join keyed on
    (store, week seq - 52) becomes (store, month) across year replicas.
    The self-join input is the small agg, not the fact."""
    return _sql(spark, sf_dir, _Q59_SPARK)


# ---------------------------------------------------------------------------
# q61: promotional-to-total revenue ratio per nation.
# ---------------------------------------------------------------------------

_Q61 = f"""
WITH promo AS (
  SELECT n_name AS nation, sum({_REV}) AS pr
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderpriority = '1-URGENT'
  GROUP BY n_name),
total AS (
  SELECT n_name AS nation, sum({_REV}) AS tr
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name)
SELECT t.nation AS nation,
       CAST(coalesce(p.pr, {_DEC0}) AS DOUBLE) AS promotions,
       CAST(t.tr AS DOUBLE) AS total,
       CAST(coalesce(p.pr, {_DEC0}) * 100 AS DOUBLE) / CAST(t.tr AS DOUBLE)
           AS promo_pct
FROM total t LEFT JOIN promo p ON p.nation = t.nation
ORDER BY nation
LIMIT 100
"""


@query("tpcds_q61_shape", _Q61)
def tpcds_q61_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 shape: promotional revenue as a percentage of total
    revenue per geo — q61's two-branch (promotional vs all) aggregate
    pair joined for the ratio, with the urgent-priority flag standing in
    for the promo dim. Two aggs over the same star share broadcast
    edges; the final join is 25 rows."""
    return _sql(spark, sf_dir, _Q61)


# ---------------------------------------------------------------------------
# q62: shipping-lag day buckets per (warehouse, priority).
# ---------------------------------------------------------------------------

_Q62 = """
SELECT n_name AS warehouse, o_orderpriority AS ship_mode,
       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name, o_orderpriority
ORDER BY warehouse, ship_mode
LIMIT 100
"""


@query("tpcds_q62_shape", _Q62)
def tpcds_q62_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q62 shape: order-to-ship lag histogram in 30-day buckets
    per (warehouse↦nation, ship mode↦priority) — q62's web twin of the
    q99 report. Bucket tests are CASE chains on timestamp INTERVAL
    bounds; one shuffle on the (nation, priority) grain."""
    return _sql(spark, sf_dir, _Q62)


# ---------------------------------------------------------------------------
# q63: monthly manager-group sales vs yearly average.
# ---------------------------------------------------------------------------

_Q63 = f"""
WITH m AS (
  SELECT s_name AS mgr, year(l_shipdate) AS yr, month(l_shipdate) AS mo,
         sum({_REV}) AS s
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand LIKE 'Brand#1%' OR p_brand LIKE 'Brand#2%'
  GROUP BY s_name, year(l_shipdate), month(l_shipdate)),
w AS (
  SELECT mgr, yr, mo, s,
         sum(s) OVER (PARTITION BY mgr, yr) AS s_yr,
         count(*) OVER (PARTITION BY mgr, yr) AS n_yr
  FROM m)
SELECT mgr, yr, mo, CAST(s AS DOUBLE) AS sum_sales,
       CAST(s_yr AS DOUBLE) / n_yr AS avg_monthly_sales
FROM w
WHERE s * n_yr * 10 > s_yr * 11
ORDER BY mgr, yr, mo
LIMIT 100
"""


@query("tpcds_q63_shape", _Q63)
def tpcds_q63_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q63 shape: months where a manager's (store's) sales run
    >1.1x the yearly monthly average for a brand slice — q63 is q53's
    monthly manager twin; kept separate to mirror the reference's query
    list one-for-one."""
    return _sql(spark, sf_dir, _Q63)


# ---------------------------------------------------------------------------
# q64: cross-year (item, nation) sales pairs with a price-ratio band.
# ---------------------------------------------------------------------------

_Q64 = f"""
WITH cs AS (
  SELECT l_partkey AS pk, n_name AS nation, year(l_shipdate) AS yr,
         sum({_REV}) AS s, count(*) AS cnt
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE l_returnflag <> 'R'
  GROUP BY l_partkey, n_name, year(l_shipdate))
SELECT p_name, a.nation AS nation,
       a.yr AS yr1, b.yr AS yr2,
       CAST(a.s AS DOUBLE) AS sales1, CAST(b.s AS DOUBLE) AS sales2,
       CAST(a.cnt AS BIGINT) AS cnt1, CAST(b.cnt AS BIGINT) AS cnt2
FROM cs a
JOIN cs b ON a.pk = b.pk AND a.nation = b.nation AND b.yr = a.yr + 1
JOIN part ON p_partkey = a.pk
WHERE b.s * 2 >= a.s * 3
ORDER BY p_name, nation, yr1
LIMIT 100
"""


@query("tpcds_q64_shape", _Q64)
def tpcds_q64_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 shape: same (item, geo) sold in consecutive years where
    the later year's net grew >=1.5x — the core of q64's cross-year
    cs1/cs2 self-join (its 17-table join spine is trimmed to the three
    dims our schema carries; q72 covers the many-dim spine). The
    self-join runs over the small agg; part broadcasts for names."""
    return _sql(spark, sf_dir, _Q64)


# ---------------------------------------------------------------------------
# q66: 12-month pivoted warehouse revenue, two modes UNION ALL'd.
# ---------------------------------------------------------------------------


def _q66_months(prefix: str) -> str:
    return ",\n       ".join(
        f"CAST(sum(CASE WHEN mo = {m} THEN r ELSE {_DEC0} END) AS DOUBLE)"
        f" AS {prefix}_m{m}"
        for m in range(1, 13)
    )


_Q66 = f"""
WITH modes AS (
  SELECT n_name AS wh, month(l_shipdate) AS mo,
         CASE WHEN l_linestatus = 'O' THEN 'AIR' ELSE 'SHIP' END AS mode,
         {_REV} AS r
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'),
pivoted AS (
  SELECT wh, mode, {_q66_months('rev')}
  FROM modes GROUP BY wh, mode)
SELECT wh, CAST(count(*) AS BIGINT) AS n_modes,
       {", ".join(f"sum(rev_m{m}) AS rev_m{m}" for m in range(1, 13))}
FROM pivoted
GROUP BY wh
ORDER BY wh
LIMIT 100
"""


@query("tpcds_q66_shape", _Q66)
def tpcds_q66_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape: warehouse revenue pivoted into 12 month columns,
    computed per ship mode then re-aggregated across modes — q66's
    web+catalog UNION ALL with jan..dec conditional sums. The pivot is
    a CASE battery (no second scan); two stacked hash aggs."""
    return _sql(spark, sf_dir, _Q66)


# ---------------------------------------------------------------------------
# q68: per-(customer, city) charges where bought city differs.
# ---------------------------------------------------------------------------

_Q68 = f"""
SELECT c_name AS cust, nc.n_name AS home_nation, ns.n_name AS bought_nation,
       CAST(sum({_PRICE}) AS DOUBLE) AS extended_price,
       CAST(sum({_PRICE} * {_TAX}) AS DOUBLE) AS extended_tax,
       CAST(sum({_REV}) AS DOUBLE) AS net_paid
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE nc.n_name <> ns.n_name
  AND c_mktsegment IN ('HOUSEHOLD', 'FURNITURE')
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-03-01'
GROUP BY c_name, nc.n_name, ns.n_name
ORDER BY cust, home_nation, bought_nation
LIMIT 100
"""


@query("tpcds_q68_shape", _Q68)
def tpcds_q68_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68 shape: extended price/tax/net per (customer, home geo,
    bought geo) with the cities differing — q68 shares q46's spine with
    different measures and a demographic filter instead of the promo
    one. Same two-role nation broadcast plan."""
    return _sql(spark, sf_dir, _Q68)


# ---------------------------------------------------------------------------
# q70: profit ROLLUP over (region, nation) ranked within level.
# ---------------------------------------------------------------------------

_Q70 = f"""
WITH base AS (
  SELECT r_name AS region, n_name AS nation, {_REV} AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey),
rolled AS (
  SELECT region, nation, sum(rev) AS profit,
         grouping(region) + grouping(nation) AS lochierarchy,
         grouping(nation) AS g_nation, grouping(region) AS g_region
  FROM base
  GROUP BY ROLLUP (region, nation))
SELECT CAST(profit AS DOUBLE) AS total_profit, region, nation,
       CAST(lochierarchy AS BIGINT) AS lochierarchy,
       CAST(rank() OVER (
           PARTITION BY lochierarchy,
                        CASE WHEN g_nation = 1 THEN region END
           ORDER BY profit DESC, nation) AS BIGINT) AS rank_within_parent
FROM rolled
ORDER BY lochierarchy DESC, region, nation, rank_within_parent
LIMIT 100
"""


@query("tpcds_q70_shape", _Q70)
def tpcds_q70_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q70 shape: profit rolled up over (state↦region,
    county↦nation) with rank-within-parent at each hierarchy level —
    q70's LOCHIERARCHY + windowed rank over the rollup output,
    partitioned by the CASE that scopes siblings under their parent.
    The rank input is the expanded agg, never the fact."""
    return _sql(spark, sf_dir, _Q70)


# ---------------------------------------------------------------------------
# q71: brand revenue by order-hour band across 3 channels.
# ---------------------------------------------------------------------------

_Q71 = f"""
WITH ev AS (
  SELECT user_id, hour(ts) AS hr, CAST(value AS DECIMAL(18,4)) AS v,
         CASE WHEN event_type IN ('click', 'view') THEN 'web'
              WHEN event_type = 'purchase' THEN 'store'
              ELSE 'catalog' END AS channel
  FROM events
  WHERE hour(ts) BETWEEN 8 AND 9 OR hour(ts) BETWEEN 19 AND 20)
SELECT channel, hr,
       CAST(sum(v) AS DOUBLE) AS total_value,
       CAST(count(*) AS BIGINT) AS n
FROM ev
GROUP BY channel, hr
ORDER BY channel, hr
"""


@query("tpcds_q71_shape", _Q71)
def tpcds_q71_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q71 shape: revenue by hour band (breakfast/dinner) across
    the three channels — q71's time_dim t_hour join becomes hour(ts)
    on the events table (the only fixture with intra-day time). The
    hour predicate folds into the scan; channels ride one pass."""
    return _sql(spark, sf_dir, _Q71)
