"""r12 (VERDICT r11 task #5): one committed low-core/high-core scaling
pair at fact volume.

The sf0.1/sf1 bench cannot demonstrate parallelism (every 8c/32c ratio
is ~1 — the whole suite is scheduling-floor-bound at that size), so the
100 TB story needs one recording at a size where cores matter: the six
tpcds_real bench texts on the sf10 corpus (fact_scale 150) plus the two
heaviest fixture operators (doc_dup_groups, doc_ngram_jaccard) on the
sf1 fixture corpus.

Method: fresh PROCESS per (cores, trial) — local[N] is fixed per JVM —
interleaved 8c/32c so window drift cannot masquerade as scaling; per
query 1 warm + min-of-2 timed inside each process, min across 2 trials
reported. scaling_ratio = t_8c / t_32c (≥2 on fact-heavy rows = real
parallelism; ~1 = serial bottleneck, named in the notes).

Usage: python tools/probe_r12_scaling.py [out.json]
       python tools/probe_r12_scaling.py --inner <cores>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TPCDS_QIDS = ["3", "19", "72", "14a", "4", "95"]  # bench.py's tpcds_real block
DOC_QUERIES = ["doc_dup_groups", "doc_ngram_jaccard"]
SF1_FIXTURES = os.path.join(ROOT, "benchdata", "sf1")


def inner(cores: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cores
    os.environ["SPARK_GRAFT_TPCDS_DIR"] = os.path.join(
        ROOT, "benchdata", "tpcds_sf10"
    )
    os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

    from flink_spark import queries as Q
    from flink_spark.session import get_spark

    spark = get_spark(app_name=f"probe_r12_scaling_{cores}c")
    res: dict[str, float] = {}
    for qid in TPCDS_QIDS:
        fn = Q.QUERIES[f"tpcds_real_q{qid}"]
        fn(spark, "/root/testdata/sf0.01").toPandas()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, "/root/testdata/sf0.01").toPandas()
            best = min(best, time.perf_counter() - t0)
        res[f"q{qid}"] = round(best, 3)
        print(f"# {cores}c q{qid}: {best:.3f}s", file=sys.stderr, flush=True)
    for name in DOC_QUERIES:
        fn = Q.QUERIES[name]
        fn(spark, SF1_FIXTURES).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF1_FIXTURES).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        res[name] = round(best, 3)
        print(f"# {cores}c {name}: {best:.3f}s", file=sys.stderr, flush=True)
    # quietness anchor
    for _ in range(3):
        spark.range(1).count()
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor = min(floor, time.perf_counter() - t0)
    spark.stop()
    print(json.dumps({"cores": cores, "queries": res, "floor_s": round(floor, 3)}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        inner(sys.argv[2])
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    trials: dict[str, list[dict]] = {"8": [], "32": []}
    for t in range(2):
        for cores in ("8", "32"):  # interleaved
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner", cores],
                capture_output=True, text=True, timeout=3000,
            )
            sys.stderr.write(p.stderr[-2000:])
            line = p.stdout.strip().splitlines()[-1]
            trials[cores].append(json.loads(line))
            print(f"# trial {t} cores {cores} done", file=sys.stderr, flush=True)
    best: dict[str, dict[str, float]] = {}
    for cores, recs in trials.items():
        names = recs[0]["queries"]
        best[cores] = {
            n: min(r["queries"][n] for r in recs) for n in names
        }
    ratios = {
        n: round(best["8"][n] / best["32"][n], 2) for n in best["8"]
    }
    out = {
        "metric": "scaling_pair_8c_vs_32c",
        "sf": "tpcds sf10 fact volume (fact_scale 150) + sf1 fixtures",
        "t8_s": best["8"],
        "t32_s": best["32"],
        "scaling_ratio": ratios,
        "total_8c_s": round(sum(best["8"].values()), 3),
        "total_32c_s": round(sum(best["32"].values()), 3),
        "anchor": {
            "floors_s": {
                c: [r["floor_s"] for r in rs] for c, rs in trials.items()
            },
            "spark_floor_calm_reference_s": 0.125,
        },
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
