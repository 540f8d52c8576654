"""Round-8 batch-E probe: the customer activity-flag family
(q10 / q35 / q69). The verbatim plans one ExistenceJoin or semi/anti
join PER channel subquery — three separate customer_sk shuffles against
three date-filtered fact sides. The rewrite computes per-customer
channel flags in ONE union-agg pass (map-side combinable; shuffle is
|active customers|, not 3 x fact rows) and replaces the EXISTS
combination with a HAVING over the flags + one semi join:

  exists(ch)       == max(case when ch then 1 end) = 1
  not exists(ch)   == max(case when ch then 1 end) is null
  (a customer with NO activity in any channel is absent from the
   grouped set entirely — it fails the mandatory exists(store) in all
   three queries, so the semi join excludes it identically).

Usage: TPCDS_BENCH_SCALE={1,10} python tools/probe_r8e.py [keys...]
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


def _active(date_pred: str, ss_fk: str = "ss_customer_sk",
            ws_fk: str = "ws_bill_customer_sk",
            cs_fk: str = "cs_ship_customer_sk",
            having: str = "") -> str:
    return f"""with active as (
 select customer_sk
 from (
   select {ss_fk} customer_sk, 1 ch
   from store_sales, date_dim
   where ss_sold_date_sk = d_date_sk and {date_pred}
   union all
   select {ws_fk}, 2
   from web_sales, date_dim
   where ws_sold_date_sk = d_date_sk and {date_pred}
   union all
   select {cs_fk}, 3
   from catalog_sales, date_dim
   where cs_sold_date_sk = d_date_sk and {date_pred}
 ) u
 where customer_sk is not null
 group by customer_sk
 having {having}
)"""


_OR_HAVING = (
    "max(case when ch = 1 then 1 end) = 1\n"
    "    and (max(case when ch = 2 then 1 end) = 1"
    " or max(case when ch = 3 then 1 end) = 1)"
)
_NOT_HAVING = (
    "max(case when ch = 1 then 1 end) = 1\n"
    "    and max(case when ch = 2 then 1 end) is null\n"
    "    and max(case when ch = 3 then 1 end) is null"
)

Q10_FLAGS = _active("d_year = 2002 and d_moy between 1 and 1+3",
                    having=_OR_HAVING) + """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3,
  cd_dep_count,
  count(*) cnt4,
  cd_dep_employed_count,
  count(*) cnt5,
  cd_dep_college_count,
  count(*) cnt6
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_county in ('Rush County','Toole County','Jefferson County','Dona Ana County','La Porte County') and
  cd_demo_sk = c.c_current_cdemo_sk and
  c.c_customer_sk in (select customer_sk from active)
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
limit 100"""

Q35_FLAGS = _active("d_year = 2002 and d_qoy < 4",
                    having=_OR_HAVING) + """
select
  ca_state,
  cd_gender,
  cd_marital_status,
  cd_dep_count,
  count(*) cnt1,
  min(cd_dep_count),
  max(cd_dep_count),
  avg(cd_dep_count),
  cd_dep_employed_count,
  count(*) cnt2,
  min(cd_dep_employed_count),
  max(cd_dep_employed_count),
  avg(cd_dep_employed_count),
  cd_dep_college_count,
  count(*) cnt3,
  min(cd_dep_college_count),
  max(cd_dep_college_count),
  avg(cd_dep_college_count)
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  cd_demo_sk = c.c_current_cdemo_sk and
  c.c_customer_sk in (select customer_sk from active)
 group by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 limit 100"""

Q69_FLAGS = _active("d_year = 2001 and d_moy between 4 and 4+2",
                    having=_NOT_HAVING) + """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_state in ('KY','GA','NM') and
  cd_demo_sk = c.c_current_cdemo_sk and
  c.c_customer_sk in (select customer_sk from active)
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 limit 100"""


CANDIDATES: dict[str, tuple[str, str]] = {
    "10": ("10", Q10_FLAGS),
    "35": ("35", Q35_FLAGS),
    "69": ("69", Q69_FLAGS),
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
