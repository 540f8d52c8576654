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
# Round 3 front-loads (a) every registry entry that has never had a
# driver CORRECTNESS row (not in r01 ∪ r02 — this automatically covers
# queries added this round), and (b) the rows that failed in earlier
# rounds and have since been fixed (emb_cosine_topk rounding, r2).
# Previously-green rows fill the remaining window slots, oldest first.
import json as _json

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_checked(fname: str) -> set[str]:
    try:
        with open(os.path.join(_HERE, fname)) as f:
            return set(_json.load(f))
    except FileNotFoundError:
        return set()


import glob as _glob

_CHECKED: set[str] = set()
for _f in sorted(_glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
    _CHECKED |= _load_checked(os.path.basename(_f))
# Round 4: agg_approx_count_distinct now carries an exact-count +
# tolerance-flag oracle (was `no_oracle`) — re-check it.
_REFIXED = ["agg_approx_count_distinct"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window covers never-yet-checked
    and previously-failing entries first."""
    allq = dict(_q.QUERIES)
    front = [n for n in allq if n not in _CHECKED]
    front += [n for n in _REFIXED if n in allq and n not in front]
    # Round 4 added ~100 new entries (full 103-variant TPC-DS coverage,
    # Nexmark suite, SemDeDup, decontamination), far past the 50-slot
    # window. Priority inside the window: (1) the round's named
    # deliverables whose done-criterion is a driver row (JSON battery,
    # dynamic session gap, the refixed approx-count-distinct), then
    # (2) the TPC-DS family (the reference's own batch gate — fills the
    # rest of the window), then everything else. Overflow rows are
    # front-loaded automatically next round and are meanwhile verified
    # every pytest run via tests/test_oracle_queries.py.
    _PRIORITY = [
        "scalar_json_query_exists", "scalar_overlay_encode",
        "tvf_session_dynamic", "agg_approx_count_distinct",
    ]
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    front.sort(
        key=lambda n: (rank.get(n, 99), not n.startswith("tpcds_"))
    )
    back = [n for n in allq if n not in front]
    # Back-fill prioritizes the TPC-DS family so the round's window holds
    # the full 40+ tpcds_* contract the reference's batch gate models.
    back.sort(key=lambda n: (not n.startswith("tpcds_"),))
    ordered = front + back
    assert sorted(ordered) == sorted(allq)
    return {n: allq[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(_q.ORACLE)
