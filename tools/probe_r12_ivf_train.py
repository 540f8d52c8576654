"""r12: ship probe for the one-Arrow-pass IVF M-step (_train_centroids_np).

Context: removing the r11 centroid/query memo (VERDICT r11 task #6) put
training back inside every timed run and emb_ann_ivf went 0.34-0.47 s ->
~1.2 s; decomposition showed the posexplode + two-(cell,pos)-shuffle
trainer was 1.12 s of it while the map-only GEMM search pass is ~0.1 s.
The fix trains with the SAME shape as the search: one Arrow pass
emitting per-task (cell -> count, sum-vector) partials, tiny driver
combine, Spark-exact HALF_UP round(6).

Phases:
  --identity  old-spelling vs new-spelling centroids (plain + sharded)
              AND full registered-query outputs, at sf0.001/sf0.01/sf1.
  --timing    interleaved fresh-session A/B of the FULL emb_ann_ivf and
              emb_ann_ivf_sharded queries (A = old DataFrame trainer via
              monkeypatch, B = shipped). 3 trials each, 1 warm +
              min-of-2 timed per session, report min over trials.

Usage: python tools/probe_r12_ivf_train.py --identity|--timing [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/repo/benchdata/sf1"


def _old_cents(corpus, id_col, vec_col, nlist):
    from flink_spark.llm import similarity as sim

    rows = sim.ivf_centroids(corpus, id_col, vec_col, nlist).collect()
    return sorted((int(r["cell"]), list(r["centroid"])) for r in rows)


def _old_cents_sharded(corpus, id_col, vec_col, nlist, shards):
    from flink_spark.llm import similarity as sim

    rows = sim.ivf_centroids_sharded(
        corpus, id_col, vec_col, nlist, shards
    ).collect()
    return sorted(
        (int(r["shard"]), int(r["cell"]), list(r["centroid"])) for r in rows
    )


def identity() -> dict:
    from flink_spark.catalog import Catalog
    from flink_spark import queries as Q
    from flink_spark.llm import similarity as sim
    from flink_spark.session import get_spark

    spark = get_spark(app_name="probe_r12_ivf_identity")
    out = {}
    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", SF1]:
        emb = Catalog(spark, sf_dir).embeddings
        plain_ok = _old_cents(emb, "vec_id", "embedding", 8) == (
            sim._train_centroids_np(emb, "vec_id", "embedding", 8)
        )
        shard_ok = _old_cents_sharded(emb, "vec_id", "embedding", 4, 4) == (
            sim._train_centroids_np(emb, "vec_id", "embedding", 4, shards=4)
        )
        qrows = {}
        for name in ["emb_ann_ivf", "emb_ann_ivf_sharded"]:
            df = Q.QUERIES[name](spark, sf_dir)
            qrows[name] = sorted(
                tuple(r) for r in df.collect()
            )
        out[sf_dir] = {
            "centroids_identical_plain": plain_ok,
            "centroids_identical_sharded": shard_ok,
            "n_query_rows": {k: len(v) for k, v in qrows.items()},
        }
        print(f"# {sf_dir}: plain={plain_ok} sharded={shard_ok}",
              file=sys.stderr, flush=True)
    spark.stop()
    return out


def _timed_query(variant: str, name: str) -> float:
    """Fresh process would be ideal; fresh SparkSession per call is the
    house A/B standard (matches tools/probe_r11_*)."""
    from flink_spark import queries as Q
    from flink_spark.llm import similarity as sim
    from flink_spark.session import get_spark

    if variant == "a":  # old DataFrame trainer
        def _df_trainer(corpus, id_col, vec_col, nlist, shards=None):
            if shards:
                return _old_cents_sharded(corpus, id_col, vec_col, nlist, shards)
            return _old_cents(corpus, id_col, vec_col, nlist)

        sim._train_centroids_np, saved = _df_trainer, sim._train_centroids_np
    spark = get_spark(app_name=f"probe_r12_ivf_{variant}")
    try:
        fn = Q.QUERIES[name]
        fn(spark, SF1).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF1).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
    finally:
        spark.stop()
        if variant == "a":
            sim._train_centroids_np = saved
    return best


def timing() -> dict:
    out = {}
    for name in ["emb_ann_ivf", "emb_ann_ivf_sharded"]:
        trials = {"a": [], "b": []}
        for _ in range(3):
            for v in ("a", "b"):
                dt = _timed_query(v, name)
                trials[v].append(round(dt, 3))
                print(f"# {name} {v}: {dt:.3f}s", file=sys.stderr, flush=True)
        out[name] = {
            "trials": trials,
            "min": {v: min(ts) for v, ts in trials.items()},
            "wins_b": sum(
                1 for a, b in zip(trials["a"], trials["b"]) if b < a
            ),
        }
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--identity"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    res = identity() if mode == "--identity" else timing()
    line = json.dumps({mode.lstrip("-"): res})
    print(line)
    if out_path:
        mode_key = "a" if os.path.exists(out_path) else "w"
        with open(out_path, mode_key) as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
