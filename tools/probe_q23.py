"""q23a/b restructure probe (round 8): 8.8 s combined at sf10, the
largest remaining family after q4/q78.

Both queries build three store_sales aggregates and consume them as
IN-subqueries (x2 each for frequent_ss_items / best_ss_customer under
InlineCTE). Two structural wastes:

1. frequent_ss_items groups by (substr(i_item_desc,1,30), i_item_sk,
   d_date) — but itemdesc is functionally dependent on i_item_sk
   (item's primary key), so the item join contributes only FK
   validation and a wide string shuffled in every group key. The
   rewrite groups by (ss_item_sk, d_date), keeps a broadcast semi join
   on item for the FK filter, and emits DISTINCT item_sk (the only
   consumer is IN, which ignores multiplicity).
2. max_store_sales / best_ss_customer join customer only to group by
   its unique key c_customer_sk — group by ss_customer_sk directly
   with a semi join on customer (NULL ss_customer_sk fails both the
   verbatim inner join and the semi join identically).

Variant C additionally materializes the two double-referenced CTEs
(the build is the expensive part; the OUTPUT is a tiny distinct-key
list that AQE happily broadcasts into the IN semi joins, so the
stats-forfeit loss that killed materialization for q1/q30 does not
apply).

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_q23.py
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

_CTES = """with frequent_ss_items as
 (select distinct ss_item_sk item_sk
  from (select ss_item_sk, d_date, count(*) cnt
        from store_sales, date_dim
        where ss_sold_date_sk = d_date_sk
          and d_year in (2000,2000+1,2000+2,2000+3)
          and ss_item_sk in (select i_item_sk from item)
        group by ss_item_sk, d_date
        having count(*) > 4)),
 max_store_sales as
 (select max(csales) tpcds_cmax
  from (select ss_customer_sk, sum(ss_quantity*ss_sales_price) csales
        from store_sales, date_dim
        where ss_sold_date_sk = d_date_sk
          and d_year in (2000,2000+1,2000+2,2000+3)
          and ss_customer_sk in (select c_customer_sk from customer)
        group by ss_customer_sk)),
 best_ss_customer as
 (select ss_customer_sk c_customer_sk, sum(ss_quantity*ss_sales_price) ssales
  from store_sales
  where ss_customer_sk in (select c_customer_sk from customer)
  group by ss_customer_sk
  having sum(ss_quantity*ss_sales_price) > (50/100.0) * (select
  *
from
 max_store_sales))"""

Q23A = _CTES + """
  select  sum(sales)
 from (select cs_quantity*cs_list_price sales
       from catalog_sales
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      union all
      select ws_quantity*ws_list_price sales
       from web_sales
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer))
 limit 100"""

Q23B = _CTES + """
  select  c_last_name,c_first_name,sales
 from (select c_last_name,c_first_name,sum(cs_quantity*cs_list_price) sales
        from catalog_sales
            ,customer
            ,date_dim
        where d_year = 2000
         and d_moy = 2
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
         and cs_bill_customer_sk = c_customer_sk
       group by c_last_name,c_first_name
      union all
      select c_last_name,c_first_name,sum(ws_quantity*ws_list_price) sales
       from web_sales
           ,customer
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)
         and ws_bill_customer_sk = c_customer_sk
       group by c_last_name,c_first_name)
     order by c_last_name,c_first_name,sales
  limit 100"""


def _real(spark, qid):
    return Q.QUERIES[f"tpcds_real_q{qid}"](spark, "/root/testdata/sf0.01")


def _reset():
    R._plan_cache.clear()
    R._cte_cache.clear()


def main() -> None:
    spark = get_spark(app_name="probe_q23")
    results = {}
    for qid, text in (("23a", Q23A), ("23b", Q23B)):
        _reset()
        base_rows = sorted(tuple(r) for r in _real(spark, qid).collect())
        _real(spark, qid).toPandas()
        base = min(
            (lambda t0: (_real(spark, qid).toPandas(), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(2)
        )

        for label, mat in (("inline", None),
                           ("mat", ("frequent_ss_items", "best_ss_customer"))):
            R._SPARK_FULL_REWRITE[qid] = text
            saved_mat = R._CTE_MATERIALIZE.pop(qid, None)
            if mat:
                R._CTE_MATERIALIZE[qid] = mat
            try:
                _reset()
                cand_rows = sorted(
                    tuple(r) for r in _real(spark, qid).collect())
                assert base_rows == cand_rows, (
                    f"q{qid}/{label} diverges: {len(base_rows)} vs "
                    f"{len(cand_rows)}"
                )
                _real(spark, qid).toPandas()
                cand = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    _real(spark, qid).toPandas()
                    cand = min(cand, time.perf_counter() - t0)
            finally:
                R._SPARK_FULL_REWRITE.pop(qid, None)
                R._CTE_MATERIALIZE.pop(qid, None)
                if saved_mat is not None:
                    R._CTE_MATERIALIZE[qid] = saved_mat
                _reset()
            results.setdefault(qid, {"base": round(base, 3)})[label] = round(cand, 3)
            print(f"# q{qid} {label}: base {base:.3f}s cand {cand:.3f}s",
                  file=sys.stderr, flush=True)

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
