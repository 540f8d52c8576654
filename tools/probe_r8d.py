"""Round-8 batch-D probes — the two heaviest remaining actionable rows
after the r8 sweep (TPCDS_SWEEP_r08_sf10: q24a/b 3.5 s each at ratio
7-10, q14a/b 3.5 s each) plus the q2 materialization retry under the
r8 engine:

- q24a/b "pre": ssales' 10 wide group columns are all functions of
  (customer_sk, store_sk, item_sk) — every dim attribute through its
  own sk, ca_state through customer's c_current_addr_sk — and every
  dim predicate (market_id, zip = zip, birth_country <> country)
  eliminates whole sk-triples. So aggregate the packed ss⋈sr join on
  the NARROW int triple first (map-side combinable), join dims onto
  the small pre-agg, and re-group by the 10 attrs (sum associativity;
  NULL sks drop at the inner customer join exactly as in the
  verbatim). ssales stays materialized (2 refs).
- q14a/b "base": materialize each channel's 3-year fact⋈date
  projection ONCE; cross_items' intersect legs, avg_sales, and the
  d_moy=11 mains all read the cached base instead of re-scanning the
  fact (verbatim: 2+ full fact scans per channel).
- q2 "mat": materialize the 2-ref wswscs weekly pivot (r5 measured it
  a loss pre-plan-cache; the r8 engine changed the constant).

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_r8d.py [keys...]
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


def _q24(color: str) -> str:
    return f"""with pre as (
 select ss_customer_sk c_sk, ss_store_sk s_sk, ss_item_sk i_sk,
        sum(ss_net_paid) np
 from store_sales, store_returns
 where xxhash64(ss_ticket_number, ss_item_sk)
     = xxhash64(sr_ticket_number, sr_item_sk)
   and ss_ticket_number - sr_ticket_number = 0
   and ss_item_sk - sr_item_sk = 0
 group by ss_customer_sk, ss_store_sk, ss_item_sk
),
ssales as (
 select c_last_name, c_first_name, s_store_name, ca_state, s_state,
        i_color, i_current_price, i_manager_id, i_units, i_size,
        sum(np) netpaid
 from pre, store, item, customer, customer_address
 where c_sk = c_customer_sk
   and i_sk = i_item_sk
   and s_sk = s_store_sk
   and c_current_addr_sk = ca_address_sk
   and c_birth_country <> upper(ca_country)
   and s_zip = ca_zip
   and s_market_id = 8
 group by c_last_name, c_first_name, s_store_name, ca_state, s_state,
          i_color, i_current_price, i_manager_id, i_units, i_size
)
select c_last_name, c_first_name, s_store_name, sum(netpaid) paid
from ssales
where i_color = '{color}'
group by c_last_name, c_first_name, s_store_name
having sum(netpaid) > (select 0.05*avg(netpaid) from ssales)
order by c_last_name, c_first_name, s_store_name"""


_Q14_BASES = """with base_ss as (
 select d_year, d_moy, d_week_seq, ss_item_sk item_sk,
        ss_quantity quantity, ss_list_price list_price
 from store_sales, date_dim
 where ss_sold_date_sk = d_date_sk and d_year between 1999 and 1999 + 2
),
base_cs as (
 select d_year, d_moy, d_week_seq, cs_item_sk item_sk,
        cs_quantity quantity, cs_list_price list_price
 from catalog_sales, date_dim
 where cs_sold_date_sk = d_date_sk and d_year between 1999 and 1999 + 2
),
base_ws as (
 select d_year, d_moy, d_week_seq, ws_item_sk item_sk,
        ws_quantity quantity, ws_list_price list_price
 from web_sales, date_dim
 where ws_sold_date_sk = d_date_sk and d_year between 1999 and 1999 + 2
),
cross_items as (
 select i_item_sk ss_item_sk
 from item,
 (select iss.i_brand_id brand_id, iss.i_class_id class_id,
         iss.i_category_id category_id
  from item iss
  where iss.i_item_sk in (select item_sk from base_ss)
  intersect
  select ics.i_brand_id, ics.i_class_id, ics.i_category_id
  from item ics
  where ics.i_item_sk in (select item_sk from base_cs)
  intersect
  select iws.i_brand_id, iws.i_class_id, iws.i_category_id
  from item iws
  where iws.i_item_sk in (select item_sk from base_ws))
 where i_brand_id = brand_id
   and i_class_id = class_id
   and i_category_id = category_id
),
avg_sales as (
 select avg(quantity*list_price) average_sales
 from (select quantity, list_price from base_ss
       union all
       select quantity, list_price from base_cs
       union all
       select quantity, list_price from base_ws) x
)"""

Q14A_BASE = _Q14_BASES + """
select channel, i_brand_id, i_class_id, i_category_id,
       sum(sales), sum(number_sales)
from (
 select 'store' channel, i_brand_id, i_class_id, i_category_id,
        sum(quantity*list_price) sales, count(*) number_sales
 from base_ss, item
 where item_sk in (select ss_item_sk from cross_items)
   and item_sk = i_item_sk
   and d_year = 1999+2 and d_moy = 11
 group by i_brand_id, i_class_id, i_category_id
 having sum(quantity*list_price) > (select average_sales from avg_sales)
 union all
 select 'catalog' channel, i_brand_id, i_class_id, i_category_id,
        sum(quantity*list_price) sales, count(*) number_sales
 from base_cs, item
 where item_sk in (select ss_item_sk from cross_items)
   and item_sk = i_item_sk
   and d_year = 1999+2 and d_moy = 11
 group by i_brand_id, i_class_id, i_category_id
 having sum(quantity*list_price) > (select average_sales from avg_sales)
 union all
 select 'web' channel, i_brand_id, i_class_id, i_category_id,
        sum(quantity*list_price) sales, count(*) number_sales
 from base_ws, item
 where item_sk in (select ss_item_sk from cross_items)
   and item_sk = i_item_sk
   and d_year = 1999+2 and d_moy = 11
 group by i_brand_id, i_class_id, i_category_id
 having sum(quantity*list_price) > (select average_sales from avg_sales)
) y
group by rollup (channel, i_brand_id, i_class_id, i_category_id)
order by channel, i_brand_id, i_class_id, i_category_id
limit 100"""

# q14b main: this-year vs last-year week comparison over the same CTEs
Q14B_BASE = _Q14_BASES + """
select this_year.channel ty_channel
      ,this_year.i_brand_id ty_brand
      ,this_year.i_class_id ty_class
      ,this_year.i_category_id ty_category
      ,this_year.sales ty_sales
      ,this_year.number_sales ty_number_sales
      ,last_year.channel ly_channel
      ,last_year.i_brand_id ly_brand
      ,last_year.i_class_id ly_class
      ,last_year.i_category_id ly_category
      ,last_year.sales ly_sales
      ,last_year.number_sales ly_number_sales
from
(select 'store' channel, i_brand_id, i_class_id, i_category_id,
        sum(quantity*list_price) sales, count(*) number_sales
 from base_ss, item
 where item_sk in (select ss_item_sk from cross_items)
   and item_sk = i_item_sk
   and d_week_seq = (select d_week_seq
                     from date_dim
                     where d_year = 1999 + 1
                       and d_moy = 12
                       and d_dom = 11)
 group by i_brand_id, i_class_id, i_category_id
 having sum(quantity*list_price) > (select average_sales from avg_sales)) this_year,
(select 'store' channel, i_brand_id, i_class_id, i_category_id,
        sum(quantity*list_price) sales, count(*) number_sales
 from base_ss, item
 where item_sk in (select ss_item_sk from cross_items)
   and item_sk = i_item_sk
   and d_week_seq = (select d_week_seq
                     from date_dim
                     where d_year = 1999
                       and d_moy = 12
                       and d_dom = 11)
 group by i_brand_id, i_class_id, i_category_id
 having sum(quantity*list_price) > (select average_sales from avg_sales)) last_year
where this_year.i_brand_id = last_year.i_brand_id
  and this_year.i_class_id = last_year.i_class_id
  and this_year.i_category_id = last_year.i_category_id
order by this_year.channel, this_year.i_brand_id, this_year.i_class_id,
         this_year.i_category_id
limit 100"""


# key -> (qid, full_text or None to keep current, mat override tuple or
#         "keep" to leave _CTE_MATERIALIZE untouched)
CANDIDATES: dict[str, tuple[str, object, object]] = {
    "24a_pre": ("24a", _q24("peach"), ("ssales",)),
    "24b_pre": ("24b", _q24("saddle"), ("ssales",)),
    "14a_base": ("14a", Q14A_BASE,
                 ("base_ss", "base_cs", "base_ws", "cross_items",
                  "avg_sales")),
    "14b_base": ("14b", Q14B_BASE,
                 ("base_ss", "base_cs", "base_ws", "cross_items",
                  "avg_sales")),
    "2_mat": ("2", None, ("wswscs",)),
}



Q2_EXPLODE = open("/tmp/q2_rewrite.sql").read()
CANDIDATES["2_explode"] = ("2", Q2_EXPLODE, "keep")


def _key(t):
    return tuple((v is None, str(type(v)), v if v is not None else 0)
                 for v in t)


def _real(spark, qid):
    return Q.QUERIES[f"tpcds_real_q{qid}"](spark, "/root/testdata/sf0.01")


def _reset():
    R._plan_cache.clear()
    R._cte_cache.clear()


def main() -> None:
    keys = sys.argv[1:] or list(CANDIDATES)
    spark = get_spark(app_name="probe_r8d")
    results = {}

    for key in keys:
        qid, full, mat = CANDIDATES[key]
        _reset()
        base_rows = sorted(
            (tuple(r) for r in _real(spark, qid).collect()), key=_key)
        _real(spark, qid).toPandas()  # warm
        base = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _real(spark, qid).toPandas()
            base = min(base, time.perf_counter() - t0)

        saved_mat = R._CTE_MATERIALIZE.pop(qid, None)
        saved_full = R._SPARK_FULL_REWRITE.get(qid)
        saved_pair = R._SPARK_REWRITE.pop(qid, None)
        if full is not None:
            R._SPARK_FULL_REWRITE[qid] = full
        elif saved_pair is not None:
            R._SPARK_REWRITE[qid] = saved_pair  # keep current text
        if mat != "keep" and mat:
            R._CTE_MATERIALIZE[qid] = tuple(mat)
        try:
            _reset()
            cand_rows = sorted(
                (tuple(r) for r in _real(spark, qid).collect()), key=_key)
            assert base_rows == cand_rows, (
                f"{key} diverges: {len(base_rows)} vs {len(cand_rows)}; "
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
            if saved_full is None:
                R._SPARK_FULL_REWRITE.pop(qid, None)
            else:
                R._SPARK_FULL_REWRITE[qid] = saved_full
            if saved_pair is not None:
                R._SPARK_REWRITE[qid] = saved_pair
            R._CTE_MATERIALIZE.pop(qid, None)
            if saved_mat is not None:
                R._CTE_MATERIALIZE[qid] = saved_mat
            _reset()

        results[key] = {"base": round(base, 3), "cand": round(cand, 3),
                        "rows": len(base_rows)}
        print(f"# {key}: base {base:.3f}s cand {cand:.3f}s "
              f"({(cand / base - 1) * 100:+.0f}%), {len(base_rows)} rows",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
