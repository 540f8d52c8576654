"""Deduplication operators for training-data pipelines.

Four tiers, all DataFrame-native (no Python UDFs in the hot path):

- exact: md5-hash groupBy — one shuffle on the 128-bit hash.
- minhash LSH: shingle → k minhashes → bands → bucket self-join.
  Hashes are md5-based (not Spark's murmur `hash()`) so the pipeline is
  engine-independent and oracle-checkable; md5 is a JVM built-in, still
  codegen'd. The band join shuffles only (band, band_value) pairs, never
  full texts — the 100 TB-safe property.
- simhash: per-token md5-derived bit votes → n-bit signature; near-dups
  share signatures (or differ in few bits).
- n-gram Jaccard: exact verification on candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame, min_split_bytes: int = 4 << 20) -> DataFrame:
    """Repartition ONLY when the input has fewer splits than cores AND
    enough bytes to pay for the extra tasks.

    A small-but-not-tiny corpus read from one parquet file arrives as
    one partition, serializing the expensive explode+hash work onto a
    single task — fan it out. But fanning a tiny table to 32 partitions
    costs more in task launches than the parallelism buys (measured ~1s
    of pure scheduling per stage chain at sf0.1), so the target is
    capped at one partition per ``min_split_bytes`` of input. At real
    scale the input already has thousands of splits and this whole
    guard is a no-op — the 100 TB path never takes the extra shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n_files = None
    try:
        import os
        from urllib.parse import urlparse

        files = df.inputFiles()
        n_files = max(1, len(files))
        local = [u for u in files if u.startswith("file:")]
        total = sum(os.path.getsize(urlparse(u).path) for u in local)
        target = min(target, max(1, total // min_split_bytes))
    except Exception:
        pass  # remote/unknown input: keep the core-count target
    # The file count bounds the scan's split count from above without
    # df.rdd.getNumPartitions(), which converts the whole plan to an
    # RDD lineage on the driver per call. If there are already >=
    # target files the scan is parallel enough (files below
    # maxPartitionBytes map 1:1 to splits at these sizes); only a
    # fewer-files-than-target scan needs the explicit fan-out.
    if target > 1 and (n_files is None or n_files < target):
        return df.repartition(target)
    return df


def text_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Explode a text column into word n-gram shingles (single-space split,
    matching the normalized corpus). Output: (id_col, shingle).

    Formulation: posexplode the words, then assemble each shingle from
    ``lead()`` over a per-doc window. The obvious alternative — a
    higher-order ``transform`` building shingles inside the array — is
    map-only but interpreted per element (measured ~14µs/shingle, 7×
    slower than this plan even though this one shuffles the token
    stream by doc id; higher-order lambdas never enter codegen). The
    window key is the doc id, so the sort is per-doc and skew-free.
    """
    df = _spread(df)
    from pyspark.sql import Window

    t = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    )
    if n == 1:
        return t.select(F.col(id_col), F.col("w").alias("shingle"))
    win = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("w", j).over(win) for j in range(1, n)]
    return (
        t.select(
            F.col(id_col),
            F.concat_ws(" ", F.col("w"), *leads).alias("shingle"),
            leads[-1].alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .drop("_last")
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """One row per doc with columns h0..h{k-1}: lexicographic-min 32-bit
    (8-hex) slices of seed-salted md5s over the doc's shingles.

    Hashing cost is the scan bottleneck, so k hash values are derived
    from ceil(k/4) md5 invocations — each 128-bit digest yields four
    independent 32-bit slices (the one-permutation-hashing family) —
    instead of k full salted digests. The digests are computed once per
    row in a projection (not re-derived per aggregate), then k
    min-aggregates run in one shuffle with map-side combine.
    """
    n_digests = (num_hashes + 3) // 4
    with_digests = shingles.select(
        F.col(id_col),
        *[
            F.md5(F.concat(F.lit(f"{d}|"), F.col("shingle"))).alias(f"_m{d}")
            for d in range(n_digests)
        ],
    )
    aggs = [
        F.min(
            F.substring(F.col(f"_m{s // 4}"), 1 + (s % 4) * 8, 8)
        ).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return with_digests.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature and self-join on (band, band_value).

    Output: (d1, d2, n_shared_bands) with d1 < d2. Only band digests are
    shuffled; the join key (band, 2×32-hex chars) is small and uniform —
    no skew unless the corpus has a mega-cluster of identical docs, in
    which case the pair explosion is inherent to the ask.
    """
    num_bands = num_hashes // rows_per_band
    stack_args = ", ".join(
        f"{b}, concat({', '.join(f'h{b * rows_per_band + r}' for r in range(rows_per_band))})"
        for b in range(num_bands)
    )
    bands = signatures.selectExpr(
        id_col, f"stack({num_bands}, {stack_args}) as (band, bv)"
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """End-to-end MinHash+LSH near-duplicate candidate pairs.

    The signature table (one short row per doc — 1000× smaller than the
    text) is persisted before the band self-join: both join sides read
    the cached signatures instead of re-running the shingle+hash scan
    twice. At 100 TB this is the difference between one and two passes
    over the corpus.
    """
    from pyspark.storagelevel import StorageLevel

    sh = text_shingles(df, id_col, text_col, shingle_n)
    sig = minhash_signatures(sh, id_col, num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return lsh_candidate_pairs(sig, id_col, num_hashes, rows_per_band)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity between doc pairs.

    Without `block_col` this is all-pairs (quadratic — correctness/oracle
    use only); with a blocking column (e.g. an LSH band) it is the
    verify stage of the candidate pipeline. Set arithmetic is done by
    counting shared shingles: |A∩B| via join on shingle, |A∪B| = |A|+|B|-∩.

    The distinct shingle set feeds THREE consumers (both intersection
    join sides and the size table), so it is persisted — one
    shingle+window+distinct pass over the corpus instead of three.
    (A map-only Python shingler was measured 2× SLOWER than the JVM
    explode+lead spelling here — Arrow-serializing 50× more output rows
    than input rows out of a Python stage costs more than the two JVM
    exchanges it saves. The JVM spelling stays.)
    """
    from pyspark.storagelevel import StorageLevel

    sh = (
        text_shingles(df, id_col, text_col, shingle_n)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
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


def near_dedup_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """End-to-end two-tier near-dedup: MinHash+LSH candidate generation,
    exact n-gram-Jaccard verification on the CANDIDATE PAIRS ONLY.

    Output: (d1, d2, n_shared_bands, jaccard) for candidates whose exact
    Jaccard ≥ threshold. This is the canonical 100 TB shape: the
    quadratic set-intersection work is restricted to LSH candidates, so
    the verify tier's cost is candidate-proportional —
    the intersection joins shuffle (pair, shingle) rows for candidate
    docs only, never the all-pairs cross product that the standalone
    `ngram_jaccard_pairs` (correctness tier) pays.
    """
    from pyspark.storagelevel import StorageLevel

    cands = minhash_lsh_pairs(
        df, id_col, text_col, shingle_n, num_hashes, rows_per_band
    )
    # three consumers (both intersection sides + sizes): one shingle pass
    sh = (
        text_shingles(df, id_col, text_col, shingle_n)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    # candidate-restricted intersection: fan each pair out to d1's
    # shingles, then match d2's shingles — both joins are equi-joins
    # keyed by doc id / (doc id, shingle)
    a = sh.select(F.col(id_col).alias("d1"), F.col("shingle").alias("s1"))
    b = sh.select(F.col(id_col).alias("_bd2"), F.col("shingle").alias("s2"))
    inter = (
        cands.join(a, "d1")
        .join(b, (F.col("d2") == F.col("_bd2")) & (F.col("s1") == F.col("s2")))
        .groupBy("d1", "d2", "n_shared_bands")
        .agg(F.count("*").alias("ni"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "d1", "sz": "sz1"}), "d1")
        .join(sizes.withColumnsRenamed({id_col: "d2", "sz": "sz2"}), "d2")
        .withColumn(
            "jaccard",
            F.col("ni") / (F.col("sz1") + F.col("sz2") - F.col("ni")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "n_shared_bands", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash signature as an n-char bit string — map-only numpy tier.

    Per doc: for each bit position i, sum a ±1 vote per distinct token
    (vote = bit i of md5(token), weighted by token frequency); bit is 1
    when the sum is positive. md5-derived bits keep it oracle-checkable.

    Implementation: ONE ``mapInPandas`` pass — tokenize, count, and
    vote per doc inside the Arrow batch, with a per-task token→bitvector
    cache (Zipfian vocabularies make the cache hit rate high, so md5
    runs ~once per vocab word per task, not once per token occurrence).
    All arithmetic is integer (±1·tf votes), so the result is exact.
    Compared to the previous JVM spelling (explode → groupBy(doc, tok)
    → 32 shift/mask aggregates → groupBy(doc)): zero shuffles instead
    of two, and no 32-aggregate expression wall — at 100 TB a pure
    scan-side transform. ``simhash_fold`` keeps the all-JVM spelling
    for deployments that must not spawn Python workers."""
    if bits > 128:
        raise ValueError("simhash supports at most 128 bits (one md5 digest)")
    import hashlib
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    nbytes = (bits + 7) // 8

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        vocab: dict[str, np.ndarray] = {}

        def bitvec(tok: str) -> np.ndarray:
            bv = vocab.get(tok)
            if bv is None:
                digest = hashlib.md5(tok.encode()).digest()[:nbytes]
                bv = (
                    np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[
                        :bits
                    ].astype(np.int8)
                    * 2
                    - 1
                )
                vocab[tok] = bv
            return bv

        for pdf in batches:
            if pdf.empty:
                continue
            # Vectorized voting: explode every token occurrence (±1 per
            # occurrence ≡ tf-weighted distinct-token votes), stack the
            # per-token bit rows, and reduce per doc with ONE reduceat.
            # Tokenization runs on pandas' C string paths (str.split +
            # explode), not a per-doc Python loop, and the signature
            # bit-strings come from one byte-matrix view instead of a
            # per-row join — the whole batch is O(few) vectorized ops
            # plus one cached md5 per new vocab word.
            pdf = pdf.reset_index(drop=True)
            exploded = pdf[text_col].fillna("").str.split(" ").explode()
            exploded = exploded[exploded != ""]
            if exploded.empty:  # all-empty docs: JVM/oracle drop them
                continue
            counts = exploded.groupby(level=0, sort=True).size()
            keep = counts.index.to_numpy()
            codes, uniques = pd.factorize(exploded.to_numpy())
            vmat = np.stack([bitvec(t) for t in uniques])  # vocab × bits
            starts = np.concatenate(
                ([0], np.cumsum(counts.to_numpy())[:-1])
            )
            votes = np.add.reduceat(
                vmat[codes], starts, axis=0, dtype=np.int64
            )
            chars = np.where(votes > 0, b"1", b"0").astype("S1")
            sigs = np.ascontiguousarray(chars).view(f"S{bits}").ravel()
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    "simhash": np.char.decode(sigs, "ascii"),
                }
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return (
        _spread(df)
        .select(id_col, text_col)
        .mapInPandas(run, f"{id_col} {id_t}, simhash string")
    )


def simhash_fold(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash, all-JVM spelling (no Python workers): token explode →
    groupBy(doc, token) tf → md5 bit votes as shift/mask aggregates →
    groupBy(doc). Two shuffles; kept as the pure-JVM tier and the
    cross-check for the map-only numpy implementation above.
    """
    if bits > 128:
        raise ValueError("simhash supports at most 128 bits (one md5 digest)")
    toks = _spread(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    # One md5 + hex→int parses per (doc, token); the per-bit votes are
    # then shift/mask on the integers. (The previous spelling re-derived
    # ascii(substring(md5(tok))) inside all `bits` aggregates — md5 ran
    # 32× per row and dominated the stage.) The digest is parsed in
    # 32-bit (8-hex-char) words, big-endian, so md5 hex digit i//4's
    # nibble-MSB-relative bit (3 - i%4) is word i//32's integer bit
    # (31 - i%32).
    n_words = (bits + 31) // 32
    counted = (
        toks.groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("_h", F.md5(F.col("tok")))
        .withColumns(
            {
                f"_w{wd}": F.conv(
                    F.substring(F.col("_h"), 1 + wd * 8, 8), 16, 10
                ).cast("long")
                for wd in range(n_words)
            }
        )
    )

    def bit(i: int) -> Column:
        return F.shiftrightunsigned(
            F.col(f"_w{i // 32}"), 31 - i % 32
        ).bitwiseAND(F.lit(1))

    votes = [
        F.sum(((bit(i) * 2 - 1) * F.col("tf"))).alias(f"v{i}") for i in range(bits)
    ]
    sums = counted.groupBy(id_col).agg(*votes)
    sig = F.concat(
        *[F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)]
    )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word n-gram with a held-out evaluation set (the standard
    n-gram-overlap rule used by public LLM data pipelines, e.g. GPT-3's
    13-gram and Dolma's paragraph-overlap decontamination — arXiv:
    2005.14165 §2.2, arXiv:2402.00159 §4).

    Returns ``train`` with a ``contaminated`` boolean added.

    Scale shape: both sides explode to (shingle, id) and meet in ONE
    equi-join on the shingle digest — the eval side is benchmarks
    (orders of magnitude smaller than the corpus), so its distinct
    shingle set broadcasts; the corpus is never self-joined and never
    shuffled beyond the per-doc shingle window. md5 digests join 16-byte
    keys instead of full n-gram text.
    """
    t_sh = text_shingles(train, id_col, text_col, n=n).select(
        F.col(id_col), F.md5("shingle").alias("dig")
    )
    e_sh = (
        text_shingles(eval_set, id_col, text_col, n=n)
        .select(F.md5("shingle").alias("dig"))
        .distinct()
    )
    hit = (
        t_sh.join(F.broadcast(e_sh), "dig")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return train.join(hit, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )
