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
# name -> index of the LATEST CORRECTNESS_r*.json containing a driver
# row for it (round 11, VERDICT r10 task #7: the window's back slots
# re-verify oldest-latest-check first, so every row's driver
# attestation refreshes on a bounded cycle instead of never)
_LATEST_CHECK: dict[str, int] = {}
for _i, _f in enumerate(
    sorted(_glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")))
):
    _names = _load_checked(os.path.basename(_f))
    _CHECKED |= _names
    for _n in _names:
        _LATEST_CHECK[_n] = _i
# Round 4: agg_approx_count_distinct now carries an exact-count +
# tolerance-flag oracle (was `no_oracle`) — re-checked green in the r4
# window; no refix candidates remain (r7).
_REFIXED: list[str] = []


# Round 6: 124 registry entries have never had a driver CORRECTNESS
# row (pure 50-slot window overflow; each is verified locally vs
# DuckDB every pytest run). VERDICT r5 task #1 says retire this
# backlog and FREEZE the registry until it clears. This pinned list
# fills the 50-slot window with the verdict's priority order: the
# hard real-TPC-DS families (q4/q14/q23/q24/q39/q64/q67/q72), the
# graph/example tier, the r5 LLM entries, n6 + approx_percentile,
# the 4 r4 b-variant shapes, then the perf-weak real texts
# (q2/q5/q8/q16/q65/q94) and low-numbered real texts to fill.
# ~74 entries remain for rounds 7–8.
_R5_BACKLOG = [
    # hard real-TPC-DS families first (12)
    "tpcds_real_q4", "tpcds_real_q14a", "tpcds_real_q14b",
    "tpcds_real_q23a", "tpcds_real_q23b", "tpcds_real_q24a",
    "tpcds_real_q24b", "tpcds_real_q39a", "tpcds_real_q39b",
    "tpcds_real_q64", "tpcds_real_q67", "tpcds_real_q72",
    # graph / example tier (5)
    "graph_pagerank", "graph_triangles", "graph_transitive_closure",
    "example_word_count", "example_weblog_analysis",
    # r5 LLM operators (10)
    "doc_gopher_quality", "doc_top_bigram_frac", "doc_dup_5gram_frac",
    "doc_pipeline_clean", "doc_dup_span_coverage",
    "doc_span_dedup_clean", "doc_mixture_weights",
    "doc_unigram_logprob", "doc_dup_groups", "doc_quality_classifier",
    # stragglers (2)
    "nexmark_n6_avg_seller_price", "agg_approx_percentile",
    # the 4 r4 b-variant shapes that spilled past the r5 window (4)
    "tpcds_q14b_shape", "tpcds_q23b_shape", "tpcds_q24b_shape",
    "tpcds_q39b_shape",
    # perf-weak real texts (6), then low-numbered real texts (11)
    "tpcds_real_q2", "tpcds_real_q5", "tpcds_real_q8",
    "tpcds_real_q16", "tpcds_real_q65", "tpcds_real_q94",
    "tpcds_real_q1", "tpcds_real_q3", "tpcds_real_q6",
    "tpcds_real_q7", "tpcds_real_q9", "tpcds_real_q10",
    "tpcds_real_q11", "tpcds_real_q12", "tpcds_real_q13",
    "tpcds_real_q15", "tpcds_real_q17",
]


# Round 7: 75 entries remain never-driver-checked (ddl_like_nation +
# 74 tpcds_real_*). The lexicographic default fills the 50-slot window
# with ddl_like_nation + q18..q74; additionally pin this round's three
# perf-probe targets (q80/q87/q75 — the >7x sf10 rows and their
# INTERSECT sibling) into the window so their driver rows land the
# same round their plans change. ~25 entries remain for r8.
_R7_PRIORITY = [
    "ddl_like_nation", "tpcds_real_q80", "tpcds_real_q87",
    "tpcds_real_q75", "tpcds_real_q38", "tpcds_real_q40",
]

# Round 8 (VERDICT r7 task #1): the 27 remaining never-checked entries
# (tpcds_real q68–q99 window overflow) fill the front automatically;
# the REMAINING window slots re-verify the rows whose executed plans
# changed since their driver row was recorded — the r7 plan cache
# touched every real text's execution path, and q80's SQL was
# rewritten (xxhash64 packing). Priority: the verdict-named six
# (q80/q50/q93*/q17/q25/q29 — *q93 is in the never-checked front
# already), then the plan-cache's biggest beneficiaries (q14/q23/q24
# families), then this round's other probe/rewrite targets. After this
# round the cumulative ledger is 354/354 and the registry freeze lifts.
_R8_REVERIFY = [
    "tpcds_real_q80", "tpcds_real_q50", "tpcds_real_q17",
    "tpcds_real_q25", "tpcds_real_q29", "tpcds_real_q4",
    "tpcds_real_q11",  # sk-keyed year_total rewrite (same family as q4/q74)
    "tpcds_real_q14a", "tpcds_real_q14b", "tpcds_real_q23a",
    "tpcds_real_q23b", "tpcds_real_q24a", "tpcds_real_q24b",
    "tpcds_real_q2", "tpcds_real_q5", "tpcds_real_q38",
    "tpcds_real_q40", "tpcds_real_q87", "tpcds_real_q75",
    "tpcds_real_q64", "tpcds_real_q67", "tpcds_real_q72",
]


# Round 9 (VERDICT r8 task #1): the cumulative ledger is 355/355, so
# the window re-verifies rows whose EXECUTED PLANS changed since their
# last driver row: (a) the 7 texts whose r8 driver rows predate their
# rewrites (q9/q28/q31/q51/q10/q35/q69 — the verdict's stale list),
# (b) q28 again (its LP denominator changed this round, ADVICE r8),
# (c) q24a/q24b (the r8 xxhash64 packing was REVERTED this round —
# fresh-session A/B measured it as a loss), and (d) this round's new
# entries (auto-fronted as never-checked). Remaining slots re-verify
# previously-green rows oldest-first as before.
_R9_REVERIFY = [
    "tpcds_real_q9", "tpcds_real_q28", "tpcds_real_q31",
    "tpcds_real_q51", "tpcds_real_q10", "tpcds_real_q35",
    "tpcds_real_q69", "tpcds_real_q24a", "tpcds_real_q24b",
    # r9 pre-agg-before-rollup rewrites (tools/probe_r9_rollup.py)
    "tpcds_real_q36", "tpcds_real_q70", "tpcds_real_q86",
    "tpcds_real_q22",
]


# Round 11: rows whose EXECUTED path changed this round — the rewrite
# rules moved to the AST substrate (flink_spark/sqlast.py; generated
# SQL byte-identical for every in-suite firing text, but the live
# q14a/q14b now execute through the ported rule #3) and the hand
# rewrites retired through rules this round execute rule-generated SQL
# for the first time. New entries (opt_rule_rollup_preagg) auto-front
# as never-checked.
_R11_REVERIFY = [
    "tpcds_real_q14a", "tpcds_real_q14b",
    # q69's hand rewrite retired through rule #2 this round — its
    # executed SQL is rule-generated for the first time
    "tpcds_real_q69",
]


# Round 12 (VERDICT r11 task #1): the 15 single-pass rewrites shipped
# in round 11 (year/quarter/channel pivots, INTERSECT flattening, q65
# window decorrelation) plus the connected-components change behind
# doc_dup_groups all changed their EXECUTED SQL/plan after the r11
# driver window was sampled — they carry only builder-side sf1
# row-identity attestations. Pin them into this round's window so
# CORRECTNESS_r12.json hashes each against DuckDB (the oracle still
# runs the ORIGINAL query text for every one of them).
_R12_REVERIFY = [
    "tpcds_q2_shape", "tpcds_q11_shape", "tpcds_q4_shape",
    "tpcds_q31_shape", "tpcds_q39_shape", "tpcds_q39b_shape",
    "tpcds_q74_shape", "tpcds_q88_shape", "tpcds_q14_shape",
    "tpcds_q60_shape", "tpcds_q75_shape", "tpcds_q59_shape",
    "tpcds_q83_shape", "tpcds_q14b_shape", "tpcds_q65_shape",
    "doc_dup_groups",
    # r12 executed-path changes: one-Arrow-pass IVF centroid training
    "emb_ann_ivf", "emb_ann_ivf_sharded",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window covers (1) never-checked
    entries (this round's additions), then (2) this round's
    plan-touched re-verify list, then previously-green rows
    OLDEST-ATTESTATION-FIRST (the r8/r9 reverify pins are retired —
    their rows were re-attested in those rounds' windows, and keeping
    them pinned starved the ~100 rows whose latest driver check
    predates the r7 plan cache; the _LATEST_CHECK ordering now cycles
    every row through on a bounded rotation)."""
    allq = dict(_q.QUERIES)
    front = [n for n in allq if n not in _CHECKED]
    front += [n for n in _REFIXED if n in allq and n not in front]
    rank = {n: i - 100 for i, n in enumerate(_R7_PRIORITY)}
    rank.update({n: i for i, n in enumerate(_R5_BACKLOG) if n not in rank})
    front.sort(key=lambda n: (rank.get(n, 999), n))
    front += [n for n in _R12_REVERIFY if n in allq and n not in front]
    front += [n for n in _R11_REVERIFY if n in allq and n not in front]
    back = [n for n in allq if n not in front]
    # oldest driver attestation first (r11, VERDICT r10 task #7): rows
    # whose latest CORRECTNESS round is furthest back fill the window's
    # remaining slots, so ~100 rows last checked before the r7 plan
    # cache / r9-r11 rule wiring cycle back through on a ~5-round
    # rotation instead of never being re-attested.
    back.sort(key=lambda n: (_LATEST_CHECK.get(n, -1), n))
    ordered = front + back
    assert sorted(ordered) == sorted(allq)
    return {n: allq[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(_q.ORACLE)
