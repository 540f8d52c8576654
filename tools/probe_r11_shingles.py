"""A/B probe (r11 optimization): map-only shingle arrays vs the
exchange+sort+window shingle spelling, for the three consumers that pay
it — minhash LSH pairs, exact n-gram Jaccard, dup-groups' pair stage.

Spelling A (incumbent): posexplode -> Exchange(doc_id) -> Sort -> Window
lead -> [distinct].  The whole token stream shuffles once per build.

Spelling B (candidate): project the split array once, build the shingle
array per doc with transform(sequence, element_at) — O(1) per element,
unlike the slice-based spelling measured at 14µs/shingle in r5 — then:
  * Jaccard tier: explode(array_distinct(arr)) — per-doc distinct is
    global distinct because doc_id is in the key; ZERO exchanges before
    the pair join.
  * MinHash tier: signatures as per-doc array_min over md5 transforms —
    min over the distinct set == min over the multiset, so the whole
    signature table is map-only; only band digests ever shuffle.

Row identity is asserted before timing (sorted collect on both forms).
Timing: 1 warm + min-of-3 per form, interleaved A,B,A,B,... so window
drift hits both forms equally. Noop-style action: count() on the final
aggregate (same action bench.py times).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from flink_spark.llm import dedup as lsh
from flink_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"


def shingle_arrays(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    w = F.split(F.col(text_col), " ")
    t = df.select(F.col(id_col), w.alias("_w")).where(F.size(w) >= n)
    arr = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_w")) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_w"), i + j) for j in range(n)]
        ),
    )
    return t.select(F.col(id_col), arr.alias("_sh"))


def minhash_pairs_b(df: DataFrame, id_col: str, text_col: str,
                    n: int = 3, num_hashes: int = 8,
                    rows_per_band: int = 2) -> DataFrame:
    arrs = shingle_arrays(df, id_col, text_col, n)
    n_digests = (num_hashes + 3) // 4

    # NOTE: a lambda passed to F.transform must have arity 1 — a second
    # parameter (even defaulted) is bound to the ELEMENT INDEX.
    def _digest(d: int):
        return lambda x: F.md5(F.concat(F.lit(f"{d}|"), x))

    def _slice(off: int):
        return lambda m: F.substring(m, off, 8)

    digs = arrs.select(
        F.col(id_col),
        *[
            F.transform(F.col("_sh"), _digest(d)).alias(f"_m{d}")
            for d in range(n_digests)
        ],
    )
    sig = digs.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(F.col(f"_m{s // 4}"), _slice(1 + (s % 4) * 8))
            ).alias(f"h{s}")
            for s in range(num_hashes)
        ],
    )
    from pyspark.storagelevel import StorageLevel

    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    return lsh.lsh_candidate_pairs(sig, id_col, num_hashes, rows_per_band)


def jaccard_b(df: DataFrame, id_col: str, text_col: str,
              n: int = 3, threshold: float = 0.1) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    arrs = shingle_arrays(df, id_col, text_col, n)
    sh = arrs.select(
        F.col(id_col), F.explode(F.array_distinct("_sh")).alias("shingle")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "d1", "sz": "sz1"}), "d1")
        .join(sizes.withColumnsRenamed({id_col: "d2", "sz": "sz2"}), "d2")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz1") + F.col("sz2") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def main() -> None:
    spark = get_spark(app_name="probe_r11_shingles")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def mk_a_minhash():
        return lsh.minhash_lsh_pairs(docs, "doc_id", "text", 3, 8, 2)

    def mk_b_minhash():
        return minhash_pairs_b(docs, "doc_id", "text", 3, 8, 2)

    def mk_a_jacc():
        return lsh.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.1)

    def mk_b_jacc():
        return jaccard_b(docs, "doc_id", "text", 3, 0.1)

    out = {}
    for label, mk_a, mk_b in (
        ("minhash", mk_a_minhash, mk_b_minhash),
        ("jaccard", mk_a_jacc, mk_b_jacc),
    ):
        ra = sorted(map(tuple, mk_a().collect()))
        spark.catalog.clearCache()
        rb = sorted(map(tuple, mk_b().collect()))
        spark.catalog.clearCache()
        assert ra == rb, f"{label}: ROW MISMATCH a={len(ra)} b={len(rb)}"
        print(f"# {label}: row-identical ({len(ra)} rows)", file=sys.stderr)
        trials = {"a": [], "b": []}
        for _ in range(4):  # first pair = warm-up
            for key, mk in (("a", mk_a), ("b", mk_b)):
                t0 = time.perf_counter()
                mk(). count()
                trials[key].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        out[label] = {
            "a_trials": trials["a"], "b_trials": trials["b"],
            "a_min": min(trials["a"][1:]), "b_min": min(trials["b"][1:]),
        }
        print(f"# {label}: {out[label]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
