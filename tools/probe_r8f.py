"""Round-8 batch-F probe: q38 (3-way INTERSECT) and q87 (EXCEPT
chain) over distinct (last, first, date) tuples -> ONE flag group-by.
Set ops and GROUP BY share null-safe tuple equality, so intersect ==
all flags set, except-chain == first flag only; the 3 distinct aggs +
2 set-op joins collapse into a single shuffle with zero joins.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_r8f.py [keys...]
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


Q38_FLAGS = '''select count(*) from (
 select c_last_name, c_first_name, d_date
 from (
   select c_last_name, c_first_name, d_date, 1 ch
   from store_sales, date_dim, customer
   where store_sales.ss_sold_date_sk = date_dim.d_date_sk
     and store_sales.ss_customer_sk = customer.c_customer_sk
     and d_month_seq between 1200 and 1200 + 11 union all
   select c_last_name, c_first_name, d_date, 2 ch
   from catalog_sales, date_dim, customer
   where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
     and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
     and d_month_seq between 1200 and 1200 + 11 union all
   select c_last_name, c_first_name, d_date, 3 ch
   from web_sales, date_dim, customer
   where web_sales.ws_sold_date_sk = date_dim.d_date_sk
     and web_sales.ws_bill_customer_sk = customer.c_customer_sk
     and d_month_seq between 1200 and 1200 + 11
 ) u
 group by c_last_name, c_first_name, d_date
 having max(case when ch = 1 then 1 end) = 1
    and max(case when ch = 2 then 1 end) = 1
    and max(case when ch = 3 then 1 end) = 1
) hot_cust
limit 100'''

Q87_FLAGS = '''select count(*) from (
 select c_last_name, c_first_name, d_date
 from (
   select c_last_name, c_first_name, d_date, 1 ch
   from store_sales, date_dim, customer
   where store_sales.ss_sold_date_sk = date_dim.d_date_sk
     and store_sales.ss_customer_sk = customer.c_customer_sk
     and d_month_seq between 1200 and 1200 + 11 union all
   select c_last_name, c_first_name, d_date, 2 ch
   from catalog_sales, date_dim, customer
   where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
     and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
     and d_month_seq between 1200 and 1200 + 11 union all
   select c_last_name, c_first_name, d_date, 3 ch
   from web_sales, date_dim, customer
   where web_sales.ws_sold_date_sk = date_dim.d_date_sk
     and web_sales.ws_bill_customer_sk = customer.c_customer_sk
     and d_month_seq between 1200 and 1200 + 11
 ) u
 group by c_last_name, c_first_name, d_date
 having max(case when ch = 1 then 1 end) = 1
    and max(case when ch = 2 then 1 end) is null
    and max(case when ch = 3 then 1 end) is null
) cool_cust'''

CANDIDATES: dict[str, tuple[str, str]] = {
    "38": ("38", Q38_FLAGS),
    "87": ("87", Q87_FLAGS),
}


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
    spark = get_spark(app_name="probe_r8e")
    results = {}

    for key in keys:
        qid, payload = CANDIDATES[key]
        _reset()
        base_rows = sorted(
            (tuple(r) for r in _real(spark, qid).collect()), key=_key)
        _real(spark, qid).toPandas()  # warm
        base = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _real(spark, qid).toPandas()
            base = min(base, time.perf_counter() - t0)

        saved_full = R._SPARK_FULL_REWRITE.get(qid)
        saved_pair = R._SPARK_REWRITE.pop(qid, None)
        R._SPARK_FULL_REWRITE[qid] = payload
        try:
            _reset()
            cand_rows = sorted(
                (tuple(r) for r in _real(spark, qid).collect()), key=_key)
            assert base_rows == cand_rows, (
                f"q{key} diverges: {len(base_rows)} vs {len(cand_rows)}; "
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
            _reset()

        results[key] = {"base": round(base, 3), "cand": round(cand, 3),
                        "rows": len(base_rows)}
        print(f"# q{key}: base {base:.3f}s cand {cand:.3f}s "
              f"({(cand / base - 1) * 100:+.0f}%), {len(base_rows)} rows",
              file=sys.stderr, flush=True)

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
