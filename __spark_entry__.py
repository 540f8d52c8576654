"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in the ``flink_spark`` package; this module is
a thin adapter over its query registry (flink_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _q.QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 registered queries.
# Round 1 checked the first 50 of the registry; round 2 front-loads
# (a) the 13 rows that failed/ERR'd in round 1 (now fixed) and (b) the
# previously-unchecked families (TPC-H q2-q22, CEP, changelog, UDAF/UDTF,
# embeddings, window/lookup joins), deferring simple scalar batteries and
# round-1 green rows to later rounds.
_R1_FAILING = [
    "agg_stats_family",
    "agg_grouping_sets",
    "pivot_event_values",
    "join_interval_clicks_purchases",
    "join_asof_last_click",
    "over_lag_lead",
    "dedup_first_per_key",
    "dedup_last_per_key",
    "tvf_tumble_daily",
    "tvf_hop_2h_1h",
    "tvf_cumulate_6h_day",
    "tvf_session_1h",
    "scalar_json_battery",
]
# Likely-green simple batteries: deferred past the 50-query window so the
# high-value dark families get oracle signal this round.
_DEFER = [
    "doc_fingerprint",
    "scalar_regexp_battery",
    "scalar_bitwise_battery",
    "scalar_encode_url_map",
    "scalar_try_cast_typeof",
    "set_union_distinct",
    "set_except_all",
    "values_inline_table",
    "over_first_last_nth",
    "agg_min_by_max_by",
    "sort_offset_fetch",
    "agg_json_objectagg",
    "agg_json_arrayagg",
    "emb_cosine_allpairs_exact",
]
# Green in round 1 (CORRECTNESS_r01.json) — re-checked last.
import json as _json

_R1_CHECKED = set(
    _json.load(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "CORRECTNESS_r01.json")))
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window covers previously-failing
    and previously-unchecked entries first."""
    allq = dict(_q.QUERIES)
    front = [n for n in _R1_FAILING if n in allq]
    front += [
        n
        for n in allq
        if n not in _R1_FAILING and n not in _DEFER and n not in _R1_CHECKED
    ]
    back = [n for n in _DEFER if n in allq]
    back += [
        n for n in allq
        if n in _R1_CHECKED and n not in _R1_FAILING and n not in _DEFER
    ]
    ordered = front + back
    assert sorted(ordered) == sorted(allq)
    return {n: allq[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(_q.ORACLE)
