"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed once after a warm-up of the input scans; timing is
end-to-end (plan + execute + collect-to-count) per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402

# Headline set: one per operator family, weighted toward what dominates at
# scale (joins, aggs, windows, dedup, similarity).
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue",
    "join_interval_clicks_purchases",
    "join_asof_last_click",
    "over_topn_per_group",
    "dedup_last_per_key",
    "tvf_tumble_daily",
    "tvf_hop_2h_1h",
    "tvf_session_1h",
    "agg_count_distinct",
    "unnest_words",
]
# LLM-pipeline headliners are appended dynamically if registered.
HEADLINE_OPTIONAL = [
    "doc_exact_dedup",
    "doc_minhash_lsh_pairs",
    "doc_token_stats",
    "emb_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="flink_spark_bench")

    names = [n for n in HEADLINE if n in Q.QUERIES] + [
        n for n in HEADLINE_OPTIONAL if n in Q.QUERIES
    ]

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = Q.QUERIES[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
