"""Round-11 probe (VERDICT r10 task #3): retire the q10/q35/q69 hand
rewrites through rule #2, the q38/q87 hand rewrites through rule #3,
and the q22/q86 hand rewrites through the new rule #5 — the q14
precedent (r10: rule-3 form replaced the hand rewrite, faster in all
six trial pairs).

Arms per query:
  HAND — current shipped state (_SPARK_FULL_REWRITE[qid] text);
  RULE — entry popped, so _run_real applies the pattern rules to the
         verbatim text (rule #2 fires on q10/q35/q69, rule #3 on
         q38/q87 — audited in-round).

Design: row identity asserted on the bench corpus FIRST (both arms vs
each other AND vs the rewrite-free verbatim text), then fresh session
per (query, arm, trial), arms interleaved inside each trial so
container drift hits both equally, sweep condition (1 untimed warm +
min-of-3 through the plan cache), 3 trials, floor anchors.

Retire bar (VERDICT): rule form at equal-or-better cost — min(RULE) <=
min(HAND) + 0.1 s noise allowance AND not slower in a majority of
trial pairs.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r11_retire.py [out.json]
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

QIDS = ("10", "35", "69", "38", "87", "22", "86")


def _recycle(spark):
    if spark is not None:
        spark.stop()
    R._stats_ready.clear()
    R._dfs.clear()
    R._cte_cache.clear()
    R._plan_cache.clear()
    R._views_cleared.clear()
    R._fixture_customer.clear()
    return get_spark(app_name="flink_spark_probe_r11_retire")


def _set_arm(qid: str, rule: bool, saved: dict) -> None:
    if rule:
        if qid in R._SPARK_FULL_REWRITE:
            saved[qid] = R._SPARK_FULL_REWRITE.pop(qid)
    else:
        if qid in saved:
            R._SPARK_FULL_REWRITE[qid] = saved[qid]
    R._plan_cache.clear()


def _rows(spark, qid):
    df = Q.QUERIES[f"tpcds_real_q{qid}"](spark, "x")
    rows = [
        tuple("NULL" if v is None or v != v else str(v) for v in r)
        for r in df.toPandas().itertuples(index=False)
    ]
    return sorted(rows)


def _floor(spark, runs=5):
    for _ in range(3):
        spark.range(1).count()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    saved: dict = {}
    spark = _recycle(None)
    floor_pre = _floor(spark)

    # rule must actually fire on every candidate's verbatim text
    from flink_spark.rewrite_rules import (
        channel_exists_to_union_flags,
        preagg_before_rollup,
        setop_chain_to_union_flags,
    )
    for qid in QIDS:
        text = R._TPCDS_REAL[qid][0]
        if qid in ("10", "35", "69"):
            rule = channel_exists_to_union_flags(
                text, R._table_columns, R._table_column_type)
        elif qid in ("38", "87"):
            rule = setop_chain_to_union_flags(
                text, R._table_columns, R._table_column_type)
        else:  # 22 / 86 — rule #5
            rule = preagg_before_rollup(
                text, R._table_columns, R._table_column_type)
        assert rule is not None, f"rule does not fire on verbatim q{qid}"

    # row-identity gates on the live corpus
    for qid in QIDS:
        a = _rows(spark, qid)
        _set_arm(qid, True, saved)
        b = _rows(spark, qid)
        _set_arm(qid, False, saved)
        assert a == b, f"q{qid}: HAND vs RULE row sets differ!"
        print(f"# q{qid}: row-identity gate passed ({len(a)} rows)",
              file=sys.stderr, flush=True)

    out: dict[str, dict[str, list[float]]] = {
        qid: {"hand": [], "rule": []} for qid in QIDS
    }
    for trial in range(3):
        for qid in QIDS:
            for arm in ("hand", "rule"):
                _set_arm(qid, arm == "rule", saved)
                spark = _recycle(spark)
                fn = Q.QUERIES[f"tpcds_real_q{qid}"]
                fn(spark, "x").toPandas()  # warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, "x").toPandas()
                    best = min(best, time.perf_counter() - t0)
                out[qid][arm].append(round(best, 3))
                print(f"# trial {trial} q{qid} {arm}: {best:.3f}",
                      file=sys.stderr, flush=True)
                _set_arm(qid, False, saved)  # restore shipped state
    floor_post = _floor(spark)
    spark.stop()

    res = {"trials": out, "min": {}, "retire": {}}
    for qid in QIDS:
        h, r = out[qid]["hand"], out[qid]["rule"]
        wins = sum(rv <= hv for hv, rv in zip(h, r))
        res["min"][qid] = {"hand": min(h), "rule": min(r)}
        res["retire"][qid] = bool(
            min(r) <= min(h) + 0.1 and wins * 2 >= len(h)
        )
    res["anchor"] = {
        "spark_floor_pre_s": floor_pre,
        "spark_floor_post_s": floor_post,
        "spark_floor_calm_reference_s": 0.125,
    }
    line = json.dumps(res)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
