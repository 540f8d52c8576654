"""A/B probe (r12, VERDICT r11 task #7): single-pass sym build for
connected_components under doc_dup_groups.

Spelling A (incumbent, operators/graph.py): sym is built as
  undirected = edges ∪ edges.swapped → filter → distinct
  sym = undirected ∪ undirected.self_loops.distinct → localCheckpoint
The eager checkpoint materializes a plan whose leaves scan the EDGE
PLAN (here: the LSH band self-join + pair aggregate) up to 4 times —
exchange reuse recovers some of it, but the union-of-unions is still a
multi-branch evaluation of an expensive subtree.

Spelling B (candidate): one scan of the edge plan; each surviving edge
(a,b), a≠b, explodes into its 4 sym rows (a,b),(b,a),(a,a),(b,b); one
distinct. Identical output set by construction:
  A's rows = {(a,b),(b,a) per edge} ∪ {(v,v) per endpoint v}
  B's rows = same, per-edge, before the shared distinct.
Self-only edges (a==b) are excluded by both (A: filter in undirected,
so no endpoint survives to the self-loop branch; B: same filter before
the explode).

Row identity of the FULL doc_dup_groups output is asserted before
timing. Timing: fresh session per (variant, trial), interleaved
A,B,A,B,...; 1 untimed warm + min-of-3 timed count() per trial, 3
trials; Spark-floor anchors.

Usage: python tools/probe_r12_cc_sym.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from flink_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"


def _sym_a(edges: DataFrame, src: str, dst: str) -> DataFrame:
    undirected = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .union(edges.select(F.col(dst), F.col(src)))
        .where(F.col("e_src") != F.col("e_dst"))
        .distinct()
    )
    return undirected.union(
        undirected.select("e_src", "e_src").distinct()
    ).localCheckpoint(eager=True)


def _sym_b(edges: DataFrame, src: str, dst: str) -> DataFrame:
    a, b = F.col(src), F.col(dst)
    rows = F.array(
        F.struct(a.alias("e_src"), b.alias("e_dst")),
        F.struct(b.alias("e_src"), a.alias("e_dst")),
        F.struct(a.alias("e_src"), a.alias("e_dst")),
        F.struct(b.alias("e_src"), b.alias("e_dst")),
    )
    return (
        edges.where(a != b)
        .select(F.explode(rows).alias("e"))
        .select("e.e_src", "e.e_dst")
        .distinct()
        .localCheckpoint(eager=True)
    )


def _cc(edges: DataFrame, src: str, dst: str, sym_fn) -> DataFrame:
    """connected_components with the sym build swapped in — the loop is
    a verbatim copy of operators/graph.py."""
    sym = sym_fn(edges, src, dst)
    labels = (
        sym.select(F.col("e_src").alias("node"))
        .distinct()
        .select(F.col("node"), F.col("node").alias("comp"))
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    for _ in range(50):
        l2 = (
            sym.join(labels, sym.e_src == labels.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.min("comp").alias("comp"))
        )
        jumped = (
            l2.alias("a")
            .join(
                labels.select(
                    F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
                ),
                F.col("a.comp") == F.col("p_node"),
                "left",
            )
            .select(
                F.col("a.node").alias("node"),
                F.coalesce(F.col("p_comp"), F.col("a.comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = jumped.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).first()[0]
        labels = jumped
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def _dup_groups(spark, sym_fn) -> DataFrame:
    from pyspark.sql import Window

    from flink_spark.catalog import Catalog
    from flink_spark.llm import dedup as lsh

    d = Catalog(spark, SF_DIR).documents
    pairs = lsh.minhash_lsh_pairs(
        d, "doc_id", "text", shingle_n=3, num_hashes=8, rows_per_band=2
    )
    comp = _cc(pairs, "d1", "d2", sym_fn)
    base = d.select("doc_id", F.length("text").alias("tlen"))
    j = base.join(comp, base.doc_id == comp.node, "left").select(
        base.doc_id,
        F.coalesce(comp.comp, base.doc_id).alias("group_id"),
        "tlen",
    )
    w = Window.partitionBy("group_id")
    rn = F.row_number().over(w.orderBy(F.col("tlen").desc(), F.col("doc_id")))
    return j.select(
        "doc_id",
        "group_id",
        F.count("*").over(w).cast("long").alias("group_size"),
        (rn == 1).alias("keep"),
    )


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
    # identity check first (one session, both variants)
    spark = get_spark(app_name="probe_r12_cc_sym")
    ra = sorted(tuple(r) for r in _dup_groups(spark, _sym_a).collect())
    rb = sorted(tuple(r) for r in _dup_groups(spark, _sym_b).collect())
    assert ra == rb, f"row mismatch: {len(ra)} vs {len(rb)}"
    n_rows = len(ra)
    spark.stop()

    res: dict[str, list[float]] = {"a": [], "b": []}
    floors = []
    for trial in range(3):
        for name, fn in (("a", _sym_a), ("b", _sym_b)):
            spark = get_spark(app_name=f"probe_r12_cc_sym_{name}{trial}")
            floors.append(_floor(spark, runs=3))
            _dup_groups(spark, fn).count()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _dup_groups(spark, fn).count()
                best = min(best, time.perf_counter() - t0)
            res[name].append(round(best, 3))
            print(
                f"# trial {trial} {name}: {best:.3f}s floor {floors[-1]}",
                file=sys.stderr, flush=True,
            )
            spark.stop()
    out = {
        "rows_identical": True,
        "n_rows": n_rows,
        "trials": res,
        "min": {k: min(v) for k, v in res.items()},
        "wins_b": sum(b < a for a, b in zip(res["a"], res["b"])),
        "anchor": {"spark_floors_s": floors,
                   "spark_floor_calm_reference_s": 0.125},
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
