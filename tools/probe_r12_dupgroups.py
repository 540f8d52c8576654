"""r12 (VERDICT r11 task #7): doc_dup_groups follow-through — decompose
the remaining cost after the CC fixes (lagged pointer-jump r11, one-pass
sym table r12), then A/B the VERDICT's named candidate: persist the LSH
pair table (the band-bucket exchange output) before connected_components
iterates (guide §5 persist-before-iterate).

Expectation to test honestly: connected_components already cuts the
edge plan with ONE eager localCheckpoint of the sym table, so the pair
join is evaluated exactly once either way and the persist should buy
~nothing — but the bar is the measurement, not the expectation.

Phases (all at sf1, 50k docs):
  decompose   stage walls in one session: pair build alone (noop),
              CC alone over prebuilt pairs, full registered query;
              plus job count of the full query.
  ab          interleaved fresh-session A/B, 1 warm + min-of-2 × 3
              trials: A = shipped, B = pairs.persist(MEMORY_AND_DISK)
              + count() before CC (monkeypatched into the query path).

Usage: python tools/probe_r12_dupgroups.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/repo/benchdata/sf1"


def decompose() -> dict:
    from flink_spark import queries as Q
    from flink_spark.catalog import Catalog
    from flink_spark.llm import dedup as lsh
    from flink_spark.operators.graph import connected_components
    from flink_spark.session import get_spark

    spark = get_spark(app_name="probe_r12_dupgroups_decomp")
    d = Catalog(spark, SF_DIR).documents

    def pairs_df():
        return lsh.minhash_lsh_pairs(
            d, "doc_id", "text", shingle_n=3, num_hashes=8, rows_per_band=2
        )

    out = {}
    # pair build alone
    pairs_df().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pairs_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out["t_pairs_s"] = round(best, 3)

    # CC alone over a materialized pair table (checkpoint it so the CC
    # timing doesn't re-pay the build)
    mat = pairs_df().localCheckpoint(eager=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        connected_components(mat, "d1", "d2").write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    out["t_cc_alone_s"] = round(best, 3)

    # full registered query, with job count
    fn = Q.QUERIES["doc_dup_groups"]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    best, njobs = float("inf"), None
    sc = spark.sparkContext
    for i in range(2):
        gid = f"dupgroups_{i}"
        sc.setJobGroup(gid, "doc_dup_groups")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        if dt < best:
            best = dt
            njobs = len(sc.statusTracker().getJobIdsForGroup(gid))
    out["t_full_s"] = round(best, 3)
    out["n_jobs_full"] = njobs
    spark.stop()
    print(f"# decompose: {out}", file=sys.stderr, flush=True)
    return out


def _run_once(variant: str) -> float:
    from pyspark.storagelevel import StorageLevel

    from flink_spark import queries as Q
    from flink_spark.operators import graph as G
    from flink_spark.session import get_spark

    spark = get_spark(app_name=f"probe_r12_dupgroups_{variant}")
    orig_cc = G.connected_components
    if variant == "b":
        def cc_persist(edges, src="src", dst="dst", **kw):
            p = edges.persist(StorageLevel.MEMORY_AND_DISK)
            p.count()
            try:
                return orig_cc(p, src, dst, **kw)
            finally:
                p.unpersist()

        G.connected_components = cc_persist
        # the query imports connected_components inside the function body
        # from flink_spark.operators.graph, so patching the module attr
        # is enough
    try:
        fn = Q.QUERIES["doc_dup_groups"]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
    finally:
        G.connected_components = orig_cc
        spark.stop()
    return best


def ab() -> dict:
    trials = {"a": [], "b": []}
    for _ in range(3):
        for v in ("a", "b"):
            dt = _run_once(v)
            trials[v].append(round(dt, 3))
            print(f"# ab {v}: {dt:.3f}s", file=sys.stderr, flush=True)
    return {
        "trials": trials,
        "min": {v: min(ts) for v, ts in trials.items()},
        "wins_b": sum(1 for a, b in zip(trials["a"], trials["b"]) if b < a),
    }


def main() -> None:
    out = {"decompose": decompose(), "ab_persist_pairs": ab()}
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
