"""q78 restructure probe (round 8): the largest remaining sf10 row
after the q4 fix (5.28 s, 4.9x vs the pinned oracle).

q78's three CTEs each run a composite-key LEFT JOIN + IS NULL
anti-pattern over the FULL fact table (ws⋈wr on (order, item), cs⋈cr,
ss⋈sr — the q50/q93/q80 probe-cliff shape), then join date_dim and
group. The final SELECT filters ss_sold_year = 2000 and left-joins
ws/cs on ws_sold_year = ss_sold_year — so every CTE only ever
contributes d_year = 2000 rows.

Variants measured (each asserted row-identical to the verbatim text in
the SAME engine before timing):

- verbatim     — baseline (whatever Catalyst infers).
- packed       — pair-rewrite only: each returns join packed into ONE
                 xxhash64 equi-key + exact difference residuals
                 (collision-safe, same rule as q50/q93/q80).
- antiexists   — LEFT JOIN + IS NULL rewritten to NOT EXISTS (Catalyst
                 plans LEFT ANTI: no null-extended output columns, no
                 post-join filter).
- yearpush     — full restructure: d_year = 2000 inside all three CTEs
                 (sound: the outer WHERE pins ss_sold_year = 2000 and
                 the left-join keys pin ws/cs_sold_year to it — rows
                 from other years can never match), NOT EXISTS anti
                 form, packed anti keys.

Soundness of the packing: xxhash64 equality with `a - b = 0` residuals
on every component admits exactly the original match set (hash
collisions are removed by the residuals; NULL keys fail `a - b = 0`
as they fail `a = b`); for the anti form, "no packed-and-residual
match" is therefore exactly "no original match".

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_q78.py
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
import flink_spark.queries_tpcds_real as R  # noqa: E402


_FINAL = """
 select
ss_sold_year, ss_item_sk, ss_customer_sk,
round(ss_qty/(coalesce(ws_qty,0)+coalesce(cs_qty,0)),2) ratio,
ss_qty store_qty, ss_wc store_wholesale_cost, ss_sp store_sales_price,
coalesce(ws_qty,0)+coalesce(cs_qty,0) other_chan_qty,
coalesce(ws_wc,0)+coalesce(cs_wc,0) other_chan_wholesale_cost,
coalesce(ws_sp,0)+coalesce(cs_sp,0) other_chan_sales_price
from ss
left join ws on (ws_sold_year=ss_sold_year and ws_item_sk=ss_item_sk and ws_customer_sk=ss_customer_sk)
left join cs on (cs_sold_year=ss_sold_year and cs_item_sk=ss_item_sk and cs_customer_sk=ss_customer_sk)
where (coalesce(ws_qty,0)>0 or coalesce(cs_qty, 0)>0) and ss_sold_year=2000
order by
  ss_sold_year, ss_item_sk, ss_customer_sk,
  ss_qty desc, ss_wc desc, ss_sp desc,
  other_chan_qty,
  other_chan_wholesale_cost,
  other_chan_sales_price,
  ratio
limit 100
"""

# (cte, fact, returns, f_ord, f_item, r_ord, r_item, cust, date_fk,
#  qty_expr, wc, sp)
_CH = (
    ("ws", "web_sales", "web_returns", "ws_order_number", "ws_item_sk",
     "wr_order_number", "wr_item_sk", "ws_bill_customer_sk ws_customer_sk",
     "ws_sold_date_sk",
     "sum(cast(ws_quantity as decimal(7, 2))) ws_qty",
     "sum(ws_wholesale_cost) ws_wc", "sum(ws_sales_price) ws_sp"),
    ("cs", "catalog_sales", "catalog_returns", "cs_order_number",
     "cs_item_sk", "cr_order_number", "cr_item_sk",
     "cs_bill_customer_sk cs_customer_sk", "cs_sold_date_sk",
     "sum(cs_quantity) cs_qty",
     "sum(cs_wholesale_cost) cs_wc", "sum(cs_sales_price) cs_sp"),
    ("ss", "store_sales", "store_returns", "ss_ticket_number",
     "ss_item_sk", "sr_ticket_number", "sr_item_sk", "ss_customer_sk",
     "ss_sold_date_sk",
     "sum(ss_quantity) ss_qty",
     "sum(ss_wholesale_cost) ss_wc", "sum(ss_sales_price) ss_sp"),
)


def _cte(ch, anti: bool, packed: bool, yearpush: bool) -> str:
    (name, fact, ret, f_ord, f_item, r_ord, r_item, cust, date_fk,
     qty, wc, sp) = ch
    if packed:
        cond = (f"xxhash64({r_ord}, {r_item}) = xxhash64({f_ord}, {f_item})"
                f" and {r_ord} - {f_ord} = 0 and {r_item} - {f_item} = 0")
    else:
        cond = f"{r_ord}={f_ord} and {f_item}={r_item}"
    year = f"and d_year = 2000\n   " if yearpush else ""
    item_alias = f_item if name != "ss" else f_item
    if anti:
        body = f"""from {fact}
   join date_dim on {date_fk} = d_date_sk
   where {year.replace('and ', '', 1) if year else 'true'}
     and not exists (select 1 from {ret} where {cond})
   group by d_year, {f_item}, {cust.split()[0]}"""
    else:
        body = f"""from {fact}
   left join {ret} on {cond}
   join date_dim on {date_fk} = d_date_sk
   where {r_ord} is null
   {year}group by d_year, {f_item}, {cust.split()[0]}"""
    return f"""{name} as
  (select d_year AS {name}_sold_year, {f_item},
    {cust},
    {qty},
    {wc},
    {sp}
   {body}
   )"""


def variant(anti: bool, packed: bool, yearpush: bool) -> str:
    return ("with " + ",\n".join(
        _cte(ch, anti, packed, yearpush) for ch in _CH) + _FINAL)


def main() -> None:
    spark = get_spark(app_name="probe_q78")
    R._register_tpcds(spark)
    orig = R._TPCDS_REAL["78"][0]

    cands = {
        "packed": variant(False, True, False),
        "antiexists": variant(True, False, False),
        "yearpush": variant(True, True, True),
    }

    a = sorted(tuple(r) for r in spark.sql(orig).collect())
    for label, text in cands.items():
        b = sorted(tuple(r) for r in spark.sql(text).collect())
        assert a == b, (
            f"{label} diverges: {len(a)} vs {len(b)} rows; first diff "
            f"{next((x for x, y in zip(a, b) if x != y), None)}"
        )
    print(f"# correctness: {len(a)} rows identical (all variants)",
          file=sys.stderr)

    results = {}
    for label, text in (("verbatim", orig), *cands.items()):
        spark.sql(text).toPandas()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.sql(text).toPandas()
            best = min(best, time.perf_counter() - t0)
        results[label] = round(best, 3)
        print(f"# {label}: {best:.3f}s", file=sys.stderr, flush=True)

    print(json.dumps({"sf": _SCALE, **results}))


if __name__ == "__main__":
    main()
