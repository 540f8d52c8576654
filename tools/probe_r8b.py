"""Round-8 batch-B probes: the multi-scan scalar-subquery family
(q9/q28/q88 — N bucket subqueries over one fact = N fact scans under
Catalyst, collapsed to ONE scan with conditional aggregates), the
exists-self-join family (q16 — per-order warehouse pre-agg replaces the
fact-vs-fact semi join), the quarter-pivot family (q31 — the q4 lesson
on ca_county), the cumulative-window family (q51 — union-agg + one sort
replaces 2 windowed CTEs + full outer join + re-window), and the
2-ref-CTE year pivot (q75 — 6 year-filtered fact scans down to 3).

Each candidate is installed into _SPARK_FULL_REWRITE and driven through
the REAL execution path (_run_real: plan cache, stats mode); row sets
asserted identical against the verbatim text first, on the SAME corpus
that is timed.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_r8b.py [qids...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "10")
SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF_DIR
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
import flink_spark.queries_tpcds_real as R  # noqa: E402


# ---------------------------------------------------------------- q9
# 15 scalar subqueries, each a full store_sales scan. count(*) with a
# bucket predicate == count(case when pred then 1 end); avg ignores
# NULLs so avg(col) over pred-rows == avg(case when pred then col end).
# The reason row (r_reason_sk = 1) is a 1-row cross join in both forms.
def _q9() -> str:
    buckets = [(1, 20, 74129), (21, 40, 122840), (41, 60, 56580),
               (61, 80, 10097), (81, 100, 165306)]
    aggs, outs = [], []
    for i, (lo, hi, thr) in enumerate(buckets, 1):
        p = f"ss_quantity between {lo} and {hi}"
        aggs.append(f"count(case when {p} then 1 end) c{i}")
        aggs.append(f"avg(case when {p} then ss_ext_discount_amt end) d{i}")
        aggs.append(f"avg(case when {p} then ss_net_paid end) n{i}")
        outs.append(f"case when c{i} > {thr} then d{i} else n{i} end bucket{i}")
    return (
        "with agg as (select\n  " + ",\n  ".join(aggs)
        + "\n from store_sales where ss_quantity between 1 and 100)\n"
        + "select " + ",\n       ".join(outs)
        + "\nfrom reason, agg where r_reason_sk = 1"
    )


Q9_REWRITE = _q9()


# ---------------------------------------------------------------- q28
# 6 bucket subqueries = 6 store_sales scans. Same conditional-aggregate
# collapse; count(distinct case when pred then col end) == the bucket's
# count(distinct col) because the CASE yields NULL off-bucket and
# DISTINCT ignores NULLs. A disjunction of all 6 bucket predicates
# pre-filters the single scan so the 6-way distinct Expand runs over
# bucket rows only, not the whole table.
def _q28() -> str:
    buckets = [
        (0, 5, 8, 459, 57), (6, 10, 90, 2323, 31), (11, 15, 142, 12214, 79),
        (16, 20, 135, 6071, 38), (21, 25, 122, 836, 17), (26, 30, 154, 7326, 7),
    ]
    preds, aggs = [], []
    for i, (qlo, qhi, lp, cp, wc) in enumerate(buckets, 1):
        p = (f"(ss_quantity between {qlo} and {qhi}"
             f" and (ss_list_price between {lp} and {lp}+10"
             f" or ss_coupon_amt between {cp} and {cp}+1000"
             f" or ss_wholesale_cost between {wc} and {wc}+20))")
        preds.append(p)
        aggs.append(f"avg(case when {p} then ss_list_price end) B{i}_LP")
        aggs.append(f"count(case when {p} then ss_list_price end) B{i}_CNT")
        aggs.append(
            f"count(distinct case when {p} then ss_list_price end) B{i}_CNTD")
    return (
        "select " + ",\n       ".join(aggs)
        + "\nfrom store_sales\nwhere " + "\n   or ".join(preds)
        + "\nlimit 100"
    )


Q28_REWRITE = _q28()


# ---------------------------------------------------------------- q88
# 8 half-hour count(*) subqueries sharing the hd/store predicates = 8
# four-table join pipelines. One join pass under the union of the time
# windows, counts split per bucket.
def _q88() -> str:
    slots = [("h8_30_to_9", "t_hour = 8 and t_minute >= 30"),
             ("h9_to_9_30", "t_hour = 9 and t_minute < 30"),
             ("h9_30_to_10", "t_hour = 9 and t_minute >= 30"),
             ("h10_to_10_30", "t_hour = 10 and t_minute < 30"),
             ("h10_30_to_11", "t_hour = 10 and t_minute >= 30"),
             ("h11_to_11_30", "t_hour = 11 and t_minute < 30"),
             ("h11_30_to_12", "t_hour = 11 and t_minute >= 30"),
             ("h12_to_12_30", "t_hour = 12 and t_minute < 30")]
    aggs = ",\n       ".join(
        f"count(case when {p} then 1 end) {n}" for n, p in slots)
    return f"""select {aggs}
from store_sales, household_demographics, time_dim, store
where ss_sold_time_sk = time_dim.t_time_sk
  and ss_hdemo_sk = household_demographics.hd_demo_sk
  and ss_store_sk = s_store_sk
  and ((t_hour = 8 and t_minute >= 30) or t_hour in (9, 10, 11)
       or (t_hour = 12 and t_minute < 30))
  and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
       (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
       (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
  and store.s_store_name = 'ese'"""


Q88_REWRITE = _q88()


# ---------------------------------------------------------------- q16
# exists(cs2 same order, different warehouse) over cs1 rows: cs2 ranges
# over ALL rows of the order (including cs1 itself), so for a non-NULL
# cs1 warehouse the exists holds iff the order has >= 2 distinct
# non-NULL warehouses; a NULL cs1 warehouse never satisfies `<>`.
# The fact-vs-fact semi join becomes one groupBy(order) pre-agg; the
# date/state/county-filtered cs1 side is tiny.
Q16_REWRITE = """with multi_wh as (
  select cs_order_number
  from catalog_sales
  where cs_warehouse_sk is not null
  group by cs_order_number
  having count(distinct cs_warehouse_sk) > 1
)
select
   count(distinct cs_order_number) as `order count`
  ,sum(cs_ext_ship_cost) as `total shipping cost`
  ,sum(cs_net_profit) as `total net profit`
from
   catalog_sales cs1
  ,date_dim
  ,customer_address
  ,call_center
where
    d_date between '2002-2-01' and
           (cast('2002-2-01' as date) + INTERVAL '60' day)
and cs1.cs_ship_date_sk = d_date_sk
and cs1.cs_ship_addr_sk = ca_address_sk
and ca_state = 'GA'
and cs1.cs_call_center_sk = cc_call_center_sk
and cc_county = 'Williamson County'
and cs1.cs_warehouse_sk is not null
and cs1.cs_order_number in (select cs_order_number from multi_wh)
and not exists(select *
               from catalog_returns cr1
               where cs1.cs_order_number = cr1.cr_order_number)
order by count(distinct cs_order_number)
limit 100"""


# ---------------------------------------------------------------- q31
# 6 CTE refs (ss x q1/q2/q3, ws x q1/q2/q3) = 6 fact scans. Pivot the
# quarters into conditional sums (2 scans); the per-quarter-group
# existence that the verbatim inner joins enforce becomes HAVING counts
# (a quarter group exists iff >= 1 joined row, independent of NULL
# sums). NULL ca_county groups are excluded — equality joins drop them
# in the verbatim.
def _q31() -> str:
    def chan(fact, date_fk, addr_fk, amt):
        sums = ",\n   ".join(
            f"sum(case when d_qoy = {q} then {amt} end) q{q},\n"
            f"   count(case when d_qoy = {q} then 1 end) n{q}"
            for q in (1, 2, 3))
        return f"""(select ca_county,
   {sums}
 from {fact}, date_dim, customer_address
 where {date_fk} = d_date_sk and {addr_fk} = ca_address_sk
   and d_year = 2000 and d_qoy in (1, 2, 3)
   and ca_county is not null
 group by ca_county
 having count(case when d_qoy = 1 then 1 end) > 0
    and count(case when d_qoy = 2 then 1 end) > 0
    and count(case when d_qoy = 3 then 1 end) > 0)"""

    ss = chan("store_sales", "ss_sold_date_sk", "ss_addr_sk",
              "ss_ext_sales_price")
    ws = chan("web_sales", "ws_sold_date_sk", "ws_bill_addr_sk",
              "ws_ext_sales_price")
    return f"""with ssp as {ss},
wsp as {ws}
select ssp.ca_county
      ,2000 d_year
      ,wsp.q2/wsp.q1 web_q1_q2_increase
      ,ssp.q2/ssp.q1 store_q1_q2_increase
      ,wsp.q3/wsp.q2 web_q2_q3_increase
      ,ssp.q3/ssp.q2 store_q2_q3_increase
from ssp join wsp on ssp.ca_county = wsp.ca_county
where case when wsp.q1 > 0 then wsp.q2/wsp.q1 else null end
    > case when ssp.q1 > 0 then ssp.q2/ssp.q1 else null end
  and case when wsp.q2 > 0 then wsp.q3/wsp.q2 else null end
    > case when ssp.q2 > 0 then ssp.q3/ssp.q2 else null end
order by ssp.ca_county"""


Q31_REWRITE = _q31()


# ---------------------------------------------------------------- q51
# Two windowed CTEs + full outer join + re-window = 3 shuffles + 3
# sorts. Union-agg both channels by (item, d_date) once, then compute
# the per-channel running sums and the running maxes over ONE
# (item, d_date) sort. A channel's cume is NULL-masked on days where
# that channel had no rows (the full outer join's NULL side); the
# window SUM skips NULL day-sums exactly as the per-channel window
# stepped over that channel's dates only.
Q51_REWRITE = """with daily as (
 select item_sk, d_date,
        sum(case when ch = 1 then price end) w_sum,
        max(case when ch = 1 then 1 end) w_has,
        sum(case when ch = 2 then price end) s_sum,
        max(case when ch = 2 then 1 end) s_has
 from (select ws_item_sk item_sk, d_date, ws_sales_price price, 1 ch
       from web_sales, date_dim
       where ws_sold_date_sk = d_date_sk
         and d_month_seq between 1200 and 1200+11
         and ws_item_sk is not null
       union all
       select ss_item_sk, d_date, ss_sales_price, 2
       from store_sales, date_dim
       where ss_sold_date_sk = d_date_sk
         and d_month_seq between 1200 and 1200+11
         and ss_item_sk is not null) u
 group by item_sk, d_date
),
v as (
 select item_sk, d_date,
   case when w_has = 1 then sum(w_sum) over
     (partition by item_sk order by d_date
      rows between unbounded preceding and current row) end web_sales,
   case when s_has = 1 then sum(s_sum) over
     (partition by item_sk order by d_date
      rows between unbounded preceding and current row) end store_sales
 from daily
)
select * from (
 select item_sk, d_date, web_sales, store_sales,
   max(web_sales) over (partition by item_sk order by d_date
      rows between unbounded preceding and current row) web_cumulative,
   max(store_sales) over (partition by item_sk order by d_date
      rows between unbounded preceding and current row) store_cumulative
 from v) y
where web_cumulative > store_cumulative
order by item_sk, d_date
limit 100"""


# ---------------------------------------------------------------- q75
# all_sales is a 2-ref CTE -> 6 one-year fact scans after InlineCTE +
# pushdown. Pivot the two years over ONE pass (3 two-year scans): the
# UNION dedups full tuples including d_year, so year-filter-then-dedup
# == dedup-then-year-filter; per-year group existence (the verbatim
# self-join is inner) becomes HAVING counts; NULL item-id groups are
# excluded as the verbatim equality join drops them.
Q75_REWRITE = """with sales_detail as (
 SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
        cs_quantity - COALESCE(cr_return_quantity,0) AS sales_cnt,
        cs_ext_sales_price - COALESCE(cr_return_amount,0.0) AS sales_amt
 FROM catalog_sales JOIN item ON i_item_sk=cs_item_sk
                    JOIN date_dim ON d_date_sk=cs_sold_date_sk
                    LEFT JOIN catalog_returns ON (cs_order_number=cr_order_number
                                              AND cs_item_sk=cr_item_sk)
 WHERE i_category='Books' AND d_year IN (2001, 2002)
 UNION
 SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
        ss_quantity - COALESCE(sr_return_quantity,0),
        ss_ext_sales_price - COALESCE(sr_return_amt,0.0)
 FROM store_sales JOIN item ON i_item_sk=ss_item_sk
                  JOIN date_dim ON d_date_sk=ss_sold_date_sk
                  LEFT JOIN store_returns ON (ss_ticket_number=sr_ticket_number
                                          AND ss_item_sk=sr_item_sk)
 WHERE i_category='Books' AND d_year IN (2001, 2002)
 UNION
 SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
        ws_quantity - COALESCE(wr_return_quantity,0),
        ws_ext_sales_price - COALESCE(wr_return_amt,0.0)
 FROM web_sales JOIN item ON i_item_sk=ws_item_sk
                JOIN date_dim ON d_date_sk=ws_sold_date_sk
                LEFT JOIN web_returns ON (ws_order_number=wr_order_number
                                      AND ws_item_sk=wr_item_sk)
 WHERE i_category='Books' AND d_year IN (2001, 2002)
),
pv as (
 select i_brand_id, i_class_id, i_category_id, i_manufact_id,
        sum(case when d_year = 2001 then sales_cnt end) prev_cnt,
        sum(case when d_year = 2001 then sales_amt end) prev_amt,
        sum(case when d_year = 2002 then sales_cnt end) curr_cnt,
        sum(case when d_year = 2002 then sales_amt end) curr_amt
 from sales_detail
 where i_brand_id is not null and i_class_id is not null
   and i_category_id is not null and i_manufact_id is not null
 group by i_brand_id, i_class_id, i_category_id, i_manufact_id
 having count(case when d_year = 2001 then 1 end) > 0
    and count(case when d_year = 2002 then 1 end) > 0
)
SELECT 2001 AS prev_year
      ,2002 AS `year`
      ,i_brand_id
      ,i_class_id
      ,i_category_id
      ,i_manufact_id
      ,prev_cnt AS prev_yr_cnt
      ,curr_cnt AS curr_yr_cnt
      ,curr_cnt - prev_cnt AS sales_cnt_diff
      ,curr_amt - prev_amt AS sales_amt_diff
FROM pv
WHERE CAST(curr_cnt AS DECIMAL(17,2))/CAST(prev_cnt AS DECIMAL(17,2)) < 0.9
ORDER BY sales_cnt_diff, sales_amt_diff
limit 100"""


# ------------------------------------------------------------- q28 v2
# The v1 single-scan lost (+10% sf10): the 6-way distinct needs an
# Expand x7 over every OR-matched row. Two-level instead: group by
# ss_list_price FIRST with per-bucket row counts (map-side combinable,
# no Expand; shuffle is |distinct prices| not |rows|), then fold the
# price groups: CNT = sum of bucket counts over non-NULL prices,
# CNTD = price groups with a bucket hit, LP = sum(p*cnt)/sum(cnt)
# cast back to avg's decimal(11,6) (HALF_UP, same as Spark's avg).
def _q28_v2() -> str:
    buckets = [
        (0, 5, 8, 459, 57), (6, 10, 90, 2323, 31), (11, 15, 142, 12214, 79),
        (16, 20, 135, 6071, 38), (21, 25, 122, 836, 17), (26, 30, 154, 7326, 7),
    ]
    preds, level1, level2 = [], [], []
    for i, (qlo, qhi, lp, cp, wc) in enumerate(buckets, 1):
        p = (f"(ss_quantity between {qlo} and {qhi}"
             f" and (ss_list_price between {lp} and {lp}+10"
             f" or ss_coupon_amt between {cp} and {cp}+1000"
             f" or ss_wholesale_cost between {wc} and {wc}+20))")
        preds.append(p)
        level1.append(f"count(case when {p} then 1 end) c{i}")
        level2.append(
            f"cast(sum(p * c{i}) / sum(case when c{i} > 0 then c{i} end)"
            f" as decimal(11,6)) B{i}_LP")
        level2.append(f"coalesce(sum(case when p is not null then c{i} end), 0)"
                      f" B{i}_CNT")
        level2.append(
            f"count(case when p is not null and c{i} > 0 then 1 end) B{i}_CNTD")
    return (
        "with g as (select ss_list_price p,\n  " + ",\n  ".join(level1)
        + "\n from store_sales\n where " + "\n    or ".join(preds)
        + "\n group by ss_list_price)\n"
        + "select " + ",\n       ".join(level2) + "\nfrom g\nlimit 100"
    )


Q28_V2 = _q28_v2()


# ------------------------------------------------------------- q16 v2
# The v1 count(distinct)-per-order pre-agg lost (+103% sf10): the
# distinct split shuffles every (order, warehouse) pair. exists(same
# order, DIFFERENT warehouse) over non-NULL warehouses is just
# min(wh) <> max(wh) per order — map-side combinable, no distinct.
Q16_V2 = """with multi_wh as (
  select cs_order_number
  from catalog_sales
  where cs_warehouse_sk is not null
  group by cs_order_number
  having min(cs_warehouse_sk) <> max(cs_warehouse_sk)
)
select
   count(distinct cs_order_number) as `order count`
  ,sum(cs_ext_ship_cost) as `total shipping cost`
  ,sum(cs_net_profit) as `total net profit`
from
   catalog_sales cs1
  ,date_dim
  ,customer_address
  ,call_center
where
    d_date between '2002-2-01' and
           (cast('2002-2-01' as date) + INTERVAL '60' day)
and cs1.cs_ship_date_sk = d_date_sk
and cs1.cs_ship_addr_sk = ca_address_sk
and ca_state = 'GA'
and cs1.cs_call_center_sk = cc_call_center_sk
and cc_county = 'Williamson County'
and cs1.cs_warehouse_sk is not null
and cs1.cs_order_number in (select cs_order_number from multi_wh)
and not exists(select *
               from catalog_returns cr1
               where cs1.cs_order_number = cr1.cr_order_number)
order by count(distinct cs_order_number)
limit 100"""


CANDIDATES: dict[str, str] = {
    "9": Q9_REWRITE,
    "28": Q28_REWRITE,
    "88": Q88_REWRITE,
    "16": Q16_REWRITE,
    "31": Q31_REWRITE,
    "51": Q51_REWRITE,
    "75": Q75_REWRITE,
    "28v2": Q28_V2,
    "16v2": Q16_V2,
}


def _real(spark, qid):
    return Q.QUERIES[f"tpcds_real_q{qid}"](spark, "/root/testdata/sf0.01")


def _reset():
    R._plan_cache.clear()
    R._cte_cache.clear()


def main() -> None:
    qids = sys.argv[1:] or list(CANDIDATES)
    spark = get_spark(app_name="probe_r8b")
    results = {}

    for key in qids:
        payload = CANDIDATES[key]
        qid = key.split("v")[0]  # "28v2" probes query 28
        _reset()
        base_rows = sorted(
            tuple(r) for r in _real(spark, qid).collect())
        _real(spark, qid).toPandas()  # warm
        base = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _real(spark, qid).toPandas()
            base = min(base, time.perf_counter() - t0)

        saved_mat = R._CTE_MATERIALIZE.pop(qid, None)
        saved = R._SPARK_FULL_REWRITE.get(qid)
        saved_pair = R._SPARK_REWRITE.pop(qid, None)
        R._SPARK_FULL_REWRITE[qid] = payload
        try:
            _reset()
            cand_rows = sorted(
                tuple(r) for r in _real(spark, qid).collect())
            assert base_rows == cand_rows, (
                f"q{qid} diverges: {len(base_rows)} vs {len(cand_rows)}; "
                f"first diff "
                f"{next((x for x, y in zip(base_rows, cand_rows) if x != y), None)}"
            )
            _real(spark, qid).toPandas()  # warm
            cand = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _real(spark, qid).toPandas()
                cand = min(cand, time.perf_counter() - t0)
        finally:
            if saved is None:
                R._SPARK_FULL_REWRITE.pop(qid, None)
            else:
                R._SPARK_FULL_REWRITE[qid] = saved
            if saved_pair is not None:
                R._SPARK_REWRITE[qid] = saved_pair
            if saved_mat is not None:
                R._CTE_MATERIALIZE[qid] = saved_mat
            _reset()

        results[key] = {"base": round(base, 3), "cand": round(cand, 3),
                        "rows": len(base_rows)}
        print(f"# q{key}: base {base:.3f}s cand {cand:.3f}s "
              f"({(cand / base - 1) * 100:+.0f}%), {len(base_rows)} rows",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
