"""Round-8 probes for q24a/b (packed ss⋈sr keys), q11 and q74
(year_total sk-agg restructure, the q4 lesson applied to the 2-channel
variants). Each candidate is installed into the engine's rewrite hooks
and driven through the REAL execution path (_run_real: plan cache, CTE
materialization, stats mode) so the A/B measures exactly what would
ship; row sets asserted identical against the verbatim text first.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_r8_family.py
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

# q24a/b: ssales' ss⋈sr on the composite (ticket, item) — the q50/q93
# probe-cliff shape; pack into one xxhash64 equi-key + exact residuals.
_Q24_PACK = (
    (
        "where ss_ticket_number = sr_ticket_number",
        "where xxhash64(ss_ticket_number, ss_item_sk)"
        " = xxhash64(sr_ticket_number, sr_item_sk)\n"
        "  and ss_ticket_number - sr_ticket_number = 0",
    ),
    ("and ss_item_sk = sr_item_sk", "and ss_item_sk - sr_item_sk = 0"),
)


def _year_total_2ch(y1_expr: str, w_fk: str, else_lit: str,
                    select_cols: str, order_cols: str,
                    s_amt: str, w_amt: str) -> str:
    return f"""with agg_s as (
 select ss_customer_sk sk
       ,sum(case when d_year = 2001 then {s_amt} end) y1
       ,sum(case when d_year = 2001+1 then {s_amt} end) y2
 from store_sales, date_dim
 where ss_sold_date_sk = d_date_sk and d_year in (2001, 2001+1)
 group by ss_customer_sk
),
agg_w as (
 select {w_fk} sk
       ,sum(case when d_year = 2001 then {w_amt} end) y1
       ,sum(case when d_year = 2001+1 then {w_amt} end) y2
 from web_sales, date_dim
 where ws_sold_date_sk = d_date_sk and d_year in (2001, 2001+1)
 group by {w_fk}
)
select {select_cols}
from agg_s
join agg_w on agg_s.sk = agg_w.sk
join customer on c_customer_sk = agg_s.sk
where agg_s.y1 > 0 and agg_w.y1 > 0
  and case when agg_w.y1 > 0 then agg_w.y2 / agg_w.y1 else {else_lit} end
    > case when agg_s.y1 > 0 then agg_s.y2 / agg_s.y1 else {else_lit} end
order by {order_cols}
limit 100"""


# q11: 2 channels x 2 years of year_total (4 refs -> 4 fact scans under
# InlineCTE, 8 wide group-key columns). Same soundness argument as q4
# (docstring at _SPARK_FULL_REWRITE["4"]): sk and customer_id are both
# unique customer keys; a missing secyear row makes y2 NULL, the ratio
# NULL, and the > predicate false — exactly the verbatim inner join +
# CASE behavior (the CASE's ELSE arm needs y1 > 0 anyway).
Q11_REWRITE = _year_total_2ch(
    "y1", "ws_bill_customer_sk", "0.0",
    """c_customer_id customer_id
      ,c_first_name customer_first_name
      ,c_last_name customer_last_name
      ,c_preferred_cust_flag customer_preferred_cust_flag""",
    "customer_id, customer_first_name, customer_last_name,"
    " customer_preferred_cust_flag",
    "ss_ext_list_price-ss_ext_discount_amt",
    "ws_ext_list_price-ws_ext_discount_amt",
)

# q74: same shape, net_paid amounts, ELSE null, 3 output columns,
# ORDER BY 1,1,1 == customer_id (unique per output row).
Q74_REWRITE = _year_total_2ch(
    "y1", "ws_bill_customer_sk", "null",
    """c_customer_id customer_id
      ,c_first_name customer_first_name
      ,c_last_name customer_last_name""",
    "customer_id",
    "ss_net_paid",
    "ws_net_paid",
)


def _real(spark, qid):
    return Q.QUERIES[f"tpcds_real_q{qid}"](spark, "/root/testdata/sf0.01")


def _reset():
    R._plan_cache.clear()
    R._cte_cache.clear()


def main() -> None:
    spark = get_spark(app_name="probe_r8_family")
    results = {}

    for qid, kind, payload in (
        ("24a", "pair", _Q24_PACK),
        ("24b", "pair", _Q24_PACK),
        ("11", "full", Q11_REWRITE),
        ("74", "full", Q74_REWRITE),
    ):
        # baseline through the real path
        _reset()
        base_rows = sorted(tuple(r) for r in _real(spark, qid).collect())
        _real(spark, qid).toPandas()  # warm
        base = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _real(spark, qid).toPandas()
            base = min(base, time.perf_counter() - t0)

        # install candidate (a full rewrite renames the CTEs, so its
        # _CTE_MATERIALIZE entry must come out with it)
        saved_mat = R._CTE_MATERIALIZE.pop(qid, None) if kind == "full" else None
        if kind == "pair":
            saved = R._SPARK_REWRITE.get(qid)
            R._SPARK_REWRITE[qid] = payload
        else:
            saved = R._SPARK_FULL_REWRITE.get(qid)
            R._SPARK_FULL_REWRITE[qid] = payload
        try:
            _reset()
            cand_rows = sorted(tuple(r) for r in _real(spark, qid).collect())
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
            if kind == "pair":
                if saved is None:
                    R._SPARK_REWRITE.pop(qid, None)
                else:
                    R._SPARK_REWRITE[qid] = saved
            else:
                if saved is None:
                    R._SPARK_FULL_REWRITE.pop(qid, None)
                else:
                    R._SPARK_FULL_REWRITE[qid] = saved
            if saved_mat is not None:
                R._CTE_MATERIALIZE[qid] = saved_mat
            _reset()

        results[qid] = {"base": round(base, 3), "cand": round(cand, 3)}
        print(f"# q{qid}: base {base:.3f}s cand {cand:.3f}s "
              f"({(cand / base - 1) * 100:+.0f}%)", file=sys.stderr, flush=True)

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
