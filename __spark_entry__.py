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


# The 54 entries registered by round 4 that have never had a driver
# CORRECTNESS row (pure 50-slot window overflow; each is verified
# locally vs DuckDB every pytest run). Round 5's instruction is to
# retire this backlog before anything else, so these names — pinned,
# not recomputed, so entries added THIS round cannot displace them —
# sort first; 50 fit the window, leaving ≤4 for round 6.
_R4_BACKLOG = [
    # headline round-4 deliverables first (a driver row here is worth
    # more than one more star-family shape) ...
    "emb_semantic_dedup", "doc_decontaminate", "doc_pii_redact",
    "nexmark_n1_currency", "nexmark_n2_selection",
    "nexmark_n3_local_join", "nexmark_n4_avg_by_category",
    "nexmark_n5_hot_items", "nexmark_n7_highest_bid",
    "nexmark_n8_new_users",
    # ... then the TPC-DS shape family; the final 4 wait for round 6.
    "tpcds_q37_shape", "tpcds_q40_shape", "tpcds_q41_shape",
    "tpcds_q44_shape", "tpcds_q45_shape", "tpcds_q46_shape",
    "tpcds_q47_shape", "tpcds_q48_shape", "tpcds_q50_shape",
    "tpcds_q53_shape", "tpcds_q54_shape", "tpcds_q55_shape",
    "tpcds_q56_shape", "tpcds_q57_shape", "tpcds_q59_shape",
    "tpcds_q61_shape", "tpcds_q62_shape", "tpcds_q63_shape",
    "tpcds_q64_shape", "tpcds_q66_shape", "tpcds_q68_shape",
    "tpcds_q70_shape", "tpcds_q71_shape", "tpcds_q73_shape",
    "tpcds_q74_shape", "tpcds_q76_shape", "tpcds_q78_shape",
    "tpcds_q80_shape", "tpcds_q81_shape", "tpcds_q82_shape",
    "tpcds_q83_shape", "tpcds_q84_shape", "tpcds_q85_shape",
    "tpcds_q86_shape", "tpcds_q90_shape", "tpcds_q91_shape",
    "tpcds_q95_shape", "tpcds_q96_shape", "tpcds_q98_shape",
    "tpcds_q99_shape", "tpcds_q14b_shape", "tpcds_q23b_shape",
    "tpcds_q24b_shape", "tpcds_q39b_shape",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window covers (1) the pinned
    round-4 backlog, then (2) any other never-yet-checked entries
    (round-5 additions), then previously-green rows."""
    allq = dict(_q.QUERIES)
    front = [n for n in allq if n not in _CHECKED]
    front += [n for n in _REFIXED if n in allq and n not in front]
    rank = {n: i for i, n in enumerate(_R4_BACKLOG)}
    front.sort(key=lambda n: (rank.get(n, 999), n))
    back = [n for n in allq if n not in front]
    back.sort(key=lambda n: (not n.startswith("tpcds_"),))
    ordered = front + back
    assert sorted(ordered) == sorted(allq)
    return {n: allq[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(_q.ORACLE)
