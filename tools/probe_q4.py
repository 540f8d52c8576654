"""q4 two-level year_total restructure probe (VERDICT r7 task #2).

q4 is the last multi-second sf10 outlier (6.71 s, 7.1x, 5.5% of the
sweep). Its `year_total` CTE unions three channels over all years and
is referenced SIX times (3 channels x 2 years); Catalyst's InlineCTE
expands every reference, planning six year-filtered fact scans. The
restructure computes each channel ONCE scanning both years (d_year IN
(2001, 2002) pushed to the dim), pivoting the two years into columns
with conditional aggregates, then joins the three channel tables on
customer_id — 3 fact scans instead of 6, one aggregation per channel
instead of two.

Semantics proof sketch (asserted below by row-set equality vs the
verbatim text in the SAME engine):
- original row existence per (customer, channel, year) == conditional
  sum's source rows; y2 IS NULL covers both "no secyear row" (join
  drops it) and "secyear total NULL" (ratio comparisons drop it) — in
  both engines NULL ratios fail the > predicates, so the outputs agree.
- y1 > 0 reproduces `firstyear.year_total > 0` (NULL > 0 is false).
- c_customer_id is unique in customer, so the 6-way self-join never
  fans out and attrs are functionally dependent on it.

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_q4.py
"""

from __future__ import annotations

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

_CHANNELS = {
    "s": ("store_sales", "ss_customer_sk", "ss_sold_date_sk",
          "((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)"
          "+ss_ext_sales_price)/2"),
    "c": ("catalog_sales", "cs_bill_customer_sk", "cs_sold_date_sk",
          "(((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)"
          "+cs_ext_sales_price)/2)"),
    "w": ("web_sales", "ws_bill_customer_sk", "ws_sold_date_sk",
          "(((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)"
          "+ws_ext_sales_price)/2)"),
}


def q4_restructured() -> str:
    ctes = []
    for ch, (fact, cust_fk, date_fk, amt) in _CHANNELS.items():
        ctes.append(f"""yt_{ch} as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,sum(case when d_year = 2001 then {amt} end) y1
       ,sum(case when d_year = 2001+1 then {amt} end) y2
 from customer, {fact}, date_dim
 where c_customer_sk = {cust_fk}
   and {date_fk} = d_date_sk
   and d_year in (2001, 2001+1)
 group by c_customer_id, c_first_name, c_last_name,
          c_preferred_cust_flag, c_birth_country, c_login,
          c_email_address
)""")
    return (
        "with " + ",\n".join(ctes) + """
 select yt_s.customer_id
       ,yt_s.customer_first_name
       ,yt_s.customer_last_name
       ,yt_s.customer_preferred_cust_flag
 from yt_s, yt_c, yt_w
 where yt_s.customer_id = yt_c.customer_id
   and yt_s.customer_id = yt_w.customer_id
   and yt_s.y1 > 0 and yt_c.y1 > 0 and yt_w.y1 > 0
   and yt_c.y2 / yt_c.y1 > yt_s.y2 / yt_s.y1
   and yt_c.y2 / yt_c.y1 > yt_w.y2 / yt_w.y1
 order by yt_s.customer_id
         ,yt_s.customer_first_name
         ,yt_s.customer_last_name
         ,yt_s.customer_preferred_cust_flag
 limit 100"""
    )


def q4_restructured_v2() -> str:
    """v2: pre-aggregate each fact on the NARROW c_customer_sk int key
    (map-side partial agg, cheap shuffle) instead of the 7 wide customer
    attribute columns, join the three per-channel aggregates on the int
    key, and resolve customer attrs with ONE customer join at the end.
    Sound because c_customer_sk and c_customer_id are both unique keys
    of customer (TPC-DS business key), so the 6-way customer_id join is
    isomorphic to the sk join; fact rows whose customer_sk misses
    customer drop at the join either way."""
    aggs = []
    for ch, (fact, cust_fk, date_fk, amt) in _CHANNELS.items():
        aggs.append(f"""agg_{ch} as (
 select {cust_fk} sk
       ,sum(case when d_year = 2001 then {amt} end) y1
       ,sum(case when d_year = 2001+1 then {amt} end) y2
 from {fact}, date_dim
 where {date_fk} = d_date_sk
   and d_year in (2001, 2001+1)
 group by {cust_fk}
)""")
    return (
        "with " + ",\n".join(aggs) + """
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
 from agg_s
 join agg_c on agg_s.sk = agg_c.sk
 join agg_w on agg_s.sk = agg_w.sk
 join customer on c_customer_sk = agg_s.sk
 where agg_s.y1 > 0 and agg_c.y1 > 0 and agg_w.y1 > 0
   and agg_c.y2 / agg_c.y1 > agg_s.y2 / agg_s.y1
   and agg_c.y2 / agg_c.y1 > agg_w.y2 / agg_w.y1
 order by customer_id, customer_first_name, customer_last_name,
          customer_preferred_cust_flag
 limit 100"""
    )


def main() -> None:
    spark = get_spark(app_name="probe_q4")
    R._register_tpcds(spark)
    orig_text = R._TPCDS_REAL["4"][0]
    new_text = q4_restructured()
    v2_text = q4_restructured_v2()

    # correctness first: identical row sets from the same engine
    a = [tuple(r) for r in spark.sql(orig_text).collect()]
    for label, text in (("twolevel3", new_text), ("skagg3", v2_text)):
        b = [tuple(r) for r in spark.sql(text).collect()]
        assert a == b, (
            f"{label} diverges: {len(a)} vs {len(b)} rows; "
            f"first diff {next((x for x, y in zip(a, b) if x != y), None)}"
        )
    print(f"# correctness: {len(a)} rows identical (both variants)",
          file=sys.stderr)

    results = {}
    for label, text in (
        ("inline6", orig_text),
        ("twolevel3", new_text),
        ("skagg3", v2_text),
    ):
        spark.sql(text).toPandas()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.sql(text).toPandas()
            best = min(best, time.perf_counter() - t0)
        results[label] = round(best, 3)
        print(f"# {label}: {best:.3f}s", file=sys.stderr, flush=True)
    import json

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
