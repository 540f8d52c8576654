"""Round-9 probe #4 (VERDICT r8 task #9): the q67 pre-agg-before-
rollup treatment for the five texts the Expand audit
(tools/probe_r9_expand_audit.py) found running Expand over RAW joined
fact rows — q18, q22, q36, q70, q86. The rollup Expand duplicates
every input row once per grouping set (x3 for rollup(a,b), x5 for
rollup(a,b,c,d)); grouping FIRST on the base keys makes the Expand run
over |groups| instead of |rows|.

Type preservation: the outer re-aggregate is cast back to the
verbatim's aggregate type — sum(decimal(7,2)) = decimal(17,2), so the
outer sum-of-presums is cast(sum(p) as decimal(17,2)) before the
division/ordering; avg(decimal(p,s)) = decimal(p+4,s+4) HALF_UP, so
avg decomposes to cast(sum(presum)/sum(precount) as decimal(p+4,s+4))
(the q28-proven trick). Row sets asserted identical (11-sig-digit
normalized) vs the verbatim text on the same corpus BEFORE timing.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r9_rollup.py
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

CANDIDATES: dict[str, str] = {
    "36": """with base as (
 select i_category, i_class,
        sum(ss_net_profit) p, sum(ss_ext_sales_price) s
 from store_sales, date_dim d1, item, store
 where d1.d_year = 2001
   and d1.d_date_sk = ss_sold_date_sk
   and i_item_sk = ss_item_sk
   and s_store_sk = ss_store_sk
   and s_state in ('TN','TN','TN','TN','TN','TN','TN','TN')
 group by i_category, i_class)
select cast(sum(p) as decimal(17,2))/cast(sum(s) as decimal(17,2)) as gross_margin
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
        partition by grouping(i_category)+grouping(i_class),
        case when grouping(i_class) = 0 then i_category end
        order by cast(sum(p) as decimal(17,2))/cast(sum(s) as decimal(17,2)) asc) as rank_within_parent
from base
group by rollup(i_category, i_class)
order by
  lochierarchy desc
 ,case when lochierarchy = 0 then i_category end
 ,rank_within_parent
limit 100""",
    "70": """with base as (
 select s_state, s_county, sum(ss_net_profit) p
 from store_sales, date_dim d1, store
 where d1.d_month_seq between 1200 and 1200+11
   and d1.d_date_sk = ss_sold_date_sk
   and s_store_sk = ss_store_sk
   and s_state in
             ( select s_state
               from  (select s_state as s_state,
                            rank() over ( partition by s_state order by sum(ss_net_profit) desc) as ranking
                      from   store_sales, store, date_dim
                      where  d_month_seq between 1200 and 1200+11
                            and d_date_sk = ss_sold_date_sk
                            and s_store_sk  = ss_store_sk
                      group by s_state
                     ) tmp1
               where ranking <= 5
             )
 group by s_state, s_county)
select cast(sum(p) as decimal(17,2)) as total_sum
   ,s_state
   ,s_county
   ,grouping(s_state)+grouping(s_county) as lochierarchy
   ,rank() over (
        partition by grouping(s_state)+grouping(s_county),
        case when grouping(s_county) = 0 then s_state end
        order by cast(sum(p) as decimal(17,2)) desc) as rank_within_parent
from base
group by rollup(s_state, s_county)
order by
  lochierarchy desc
 ,case when lochierarchy = 0 then s_state end
 ,rank_within_parent
limit 100""",
    "86": """with base as (
 select i_category, i_class, sum(ws_net_paid) p
 from web_sales, date_dim d1, item
 where d1.d_month_seq between 1200 and 1200+11
   and d1.d_date_sk = ws_sold_date_sk
   and i_item_sk = ws_item_sk
 group by i_category, i_class)
select cast(sum(p) as decimal(17,2)) as total_sum
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
        partition by grouping(i_category)+grouping(i_class),
        case when grouping(i_class) = 0 then i_category end
        order by cast(sum(p) as decimal(17,2)) desc) as rank_within_parent
from base
group by rollup(i_category, i_class)
order by
  lochierarchy desc,
  case when lochierarchy = 0 then i_category end,
  rank_within_parent
limit 100""",
    "22": """with base as (
 select i_product_name, i_brand, i_class, i_category,
        sum(cast(inv_quantity_on_hand as decimal(7, 2))) sq,
        count(inv_quantity_on_hand) cq
 from inventory, date_dim, item
 where inv_date_sk=d_date_sk
   and inv_item_sk=i_item_sk
   and d_month_seq between 1200 and 1200 + 11
 group by i_product_name, i_brand, i_class, i_category)
select i_product_name, i_brand, i_class, i_category,
       cast(sum(sq)/sum(cq) as decimal(11,6)) qoh
from base
group by rollup(i_product_name, i_brand, i_class, i_category)
order by qoh, i_product_name, i_brand, i_class, i_category
limit 100""",
    "18": """with base as (
 select i_item_id, ca_country, ca_state, ca_county,
        sum(cast(cs_quantity as decimal(12,6))) s1, count(cs_quantity) c1,
        sum(cast(cs_list_price as decimal(12,6))) s2, count(cs_list_price) c2,
        sum(cast(cs_coupon_amt as decimal(12,6))) s3, count(cs_coupon_amt) c3,
        sum(cast(cs_sales_price as decimal(12,6))) s4, count(cs_sales_price) c4,
        sum(cast(cs_net_profit as decimal(12,6))) s5, count(cs_net_profit) c5,
        sum(cast(c_birth_year as decimal(12,6))) s6, count(c_birth_year) c6,
        sum(cast(cd1.cd_dep_count as decimal(12,2))) s7, count(cd1.cd_dep_count) c7
 from catalog_sales, customer_demographics cd1,
      customer_demographics cd2, customer, customer_address, date_dim, item
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd1.cd_demo_sk and
       cs_bill_customer_sk = c_customer_sk and
       cd1.cd_gender = 'F' and
       cd1.cd_education_status = 'Unknown' and
       c_current_cdemo_sk = cd2.cd_demo_sk and
       c_current_addr_sk = ca_address_sk and
       c_birth_month in (1,6,8,9,12,2) and
       d_year = 1998 and
       ca_state in ('MS','IN','ND','OK','NM','VA','MS')
 group by i_item_id, ca_country, ca_state, ca_county)
select i_item_id, ca_country, ca_state, ca_county,
       cast(sum(s1)/sum(c1) as decimal(16,10)) agg1,
       cast(sum(s2)/sum(c2) as decimal(16,10)) agg2,
       cast(sum(s3)/sum(c3) as decimal(16,10)) agg3,
       cast(sum(s4)/sum(c4) as decimal(16,10)) agg4,
       cast(sum(s5)/sum(c5) as decimal(16,10)) agg5,
       cast(sum(s6)/sum(c6) as decimal(16,10)) agg6,
       cast(sum(s7)/sum(c7) as decimal(16,6)) agg7
from base
group by rollup (i_item_id, ca_country, ca_state, ca_county)
order by ca_country, ca_state, ca_county, i_item_id
limit 100""",
}


def _norm(df):
    def cell(v):
        return f"{v:.11g}" if isinstance(v, float) else str(v)
    return sorted(
        tuple(cell(v) for v in row) for row in df.itertuples(index=False)
    )


def tmin(fn, runs=3):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="probe_r9_rollup")
    out = {}
    only = sys.argv[1:] or list(CANDIDATES)
    for qid in only:
        name = f"tpcds_real_q{qid}"
        fn = Q.QUERIES[name]
        # verbatim through the real path
        R._SPARK_FULL_REWRITE.pop(qid, None)
        R._plan_cache.clear()
        base_rows = _norm(fn(spark, "x").toPandas())
        t_verbatim = tmin(lambda: fn(spark, "x").toPandas())
        # candidate through the real path
        R._SPARK_FULL_REWRITE[qid] = CANDIDATES[qid]
        R._plan_cache.clear()
        cand_rows = _norm(fn(spark, "x").toPandas())
        ident = cand_rows == base_rows
        t_cand = tmin(lambda: fn(spark, "x").toPandas()) if ident else None
        R._SPARK_FULL_REWRITE.pop(qid, None)
        R._plan_cache.clear()
        out[f"q{qid}"] = {
            "row_identical": ident,
            "verbatim_s": t_verbatim,
            "candidate_s": t_cand,
        }
        print(f"# q{qid}: {out[f'q{qid}']}", file=sys.stderr, flush=True)
        if not ident:
            da = [r for r in base_rows if r not in set(cand_rows)][:2]
            db = [r for r in cand_rows if r not in set(base_rows)][:2]
            print(f"#   verbatim-only: {da}\n#   cand-only: {db}",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
