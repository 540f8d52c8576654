"""Round-8 batch-C probes:

- q95: ws_wh (web_sales self-join on order with different warehouses)
  only ever feeds IN-subqueries, so the pair CTE collapses to the q94
  min<>max aggregate — an order has two different non-NULL warehouses
  iff min(wh) <> max(wh); kills the fact self-join.
- q97: the full outer join keys (customer_sk, item_sk) are both 32-bit
  positive sks, so `customer_sk * 4294967296 + item_sk` is an EXACT
  reversible bigint pack (no residual needed); NULL in either input
  makes the packed key NULL which never matches — identical to the
  verbatim two-key equality. Single-long join keys hit Spark's
  LongHashedRelation fast path.
- q67: pre-aggregate at the finest (8-column) granularity BEFORE the
  ROLLUP, so the x9 Expand runs over |finest groups| instead of
  |joined fact rows|; summing pre-agged sums over rollup levels is the
  same multiset of output rows (sum associativity, per-row coalesce
  applied at the base level in both forms).

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_r8c.py [keys...]
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


Q95_PAIR = (
    (
        """(select ws1.ws_order_number,ws1.ws_warehouse_sk wh1,ws2.ws_warehouse_sk wh2
 from web_sales ws1,web_sales ws2
 where ws1.ws_order_number = ws2.ws_order_number
   and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)""",
        """(select ws_order_number, min(ws_warehouse_sk) wh1, max(ws_warehouse_sk) wh2
 from web_sales
 where ws_warehouse_sk is not null
 group by ws_order_number
 having min(ws_warehouse_sk) <> max(ws_warehouse_sk))""",
    ),
)

Q97_PAIR = (
    (
        """full outer join csci on (ssci.customer_sk=csci.customer_sk
                               and ssci.item_sk = csci.item_sk)""",
        """full outer join csci on (ssci.customer_sk * 4294967296 + ssci.item_sk
                                  = csci.customer_sk * 4294967296 + csci.item_sk)""",
    ),
)

Q67_FULL = """with base as (
 select i_category, i_class, i_brand, i_product_name,
        d_year, d_qoy, d_moy, s_store_id,
        sum(coalesce(ss_sales_price*ss_quantity,0)) s
 from store_sales, date_dim, store, item
 where ss_sold_date_sk=d_date_sk
   and ss_item_sk=i_item_sk
   and ss_store_sk = s_store_sk
   and d_month_seq between 1200 and 1200+11
 group by i_category, i_class, i_brand, i_product_name,
          d_year, d_qoy, d_moy, s_store_id
)
select * from (
 select i_category, i_class, i_brand, i_product_name,
        d_year, d_qoy, d_moy, s_store_id, sumsales,
        rank() over (partition by i_category order by sumsales desc) rk
 from (select i_category, i_class, i_brand, i_product_name,
              d_year, d_qoy, d_moy, s_store_id,
              sum(s) sumsales
       from base
       group by rollup(i_category, i_class, i_brand, i_product_name,
                       d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
where rk <= 100
order by i_category
        ,i_class
        ,i_brand
        ,i_product_name
        ,d_year
        ,d_qoy
        ,d_moy
        ,s_store_id
        ,sumsales
        ,rk
limit 100"""


CANDIDATES: dict[str, tuple[str, object]] = {
    "95": ("pair", Q95_PAIR),
    "97": ("pair", Q97_PAIR),
    "67": ("full", Q67_FULL),
}


def _key(t):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in t)


def _real(spark, qid):
    return Q.QUERIES[f"tpcds_real_q{qid}"](spark, "/root/testdata/sf0.01")


def _reset():
    R._plan_cache.clear()
    R._cte_cache.clear()


def main() -> None:
    keys = sys.argv[1:] or list(CANDIDATES)
    spark = get_spark(app_name="probe_r8c")
    results = {}

    for key in keys:
        kind, payload = CANDIDATES[key]
        qid = key.split("v")[0]
        _reset()
        base_rows = sorted((tuple(r) for r in _real(spark, qid).collect()), key=_key)
        _real(spark, qid).toPandas()  # warm
        base = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _real(spark, qid).toPandas()
            base = min(base, time.perf_counter() - t0)

        saved_mat = R._CTE_MATERIALIZE.pop(qid, None)
        saved_full = R._SPARK_FULL_REWRITE.get(qid)
        saved_pair = R._SPARK_REWRITE.get(qid)
        if kind == "pair":
            R._SPARK_REWRITE[qid] = payload
        else:
            R._SPARK_FULL_REWRITE[qid] = payload
            R._SPARK_REWRITE.pop(qid, None)
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
            if saved_pair is None:
                R._SPARK_REWRITE.pop(qid, None)
            else:
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
