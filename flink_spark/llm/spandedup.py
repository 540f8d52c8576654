"""Exact-substring deduplication — the duplicated-span tier.

Public method: Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better" (ExactSubstr): any token span of width >= w
that occurs more than once in the corpus is a duplicate; dedup cuts
every duplicated span occurrence out of the text (the paper uses a
suffix array; the distributed spelling below is the standard
fixed-width rolling-window equivalent — every duplicated substring of
length >= w contains a duplicated w-token window, so w-window
detection finds exactly the spans the suffix array would, quantized
to token granularity).

Distributed shape, designed for the 100 TB case:

1. Window digests: posexplode the token stream, assemble each w-token
   window with ``lead()`` over a per-doc window (the same skew-free
   per-doc sort as dedup.text_shingles — the corpus shuffles once on
   doc_id, text never shuffles crosswise).
2. Duplicate detection: one hash aggregate on the window digest
   (map-side partial applies); ``count >= 2`` marks duplicated
   windows. The digest table is the only corpus-wide state. Digests
   are 128-bit (two independent xxhash64 lanes, r6): at >4e9 windows
   a single 64-bit lane's birthday collisions would mark false
   duplicated spans; at 128 bits the bound stays < 1e-13 through
   ~4e12 windows.
3. Coverage: duplicated occurrences [pos, pos+w-1] merge into islands
   with the standard gaps-and-islands running-max — a per-doc window
   function over only the *duplicated* occurrences (tiny vs corpus).
4. Removal: tokens covered by an island are cut; the cleaned text is
   rebuilt map-side from the doc's own token array with a
   higher-order ``filter`` against the doc's (few) islands — no
   token-level join.

Flink has no such operator; this is part of the LLM-pipeline tier
this engine adds beyond the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_spark.llm.text import tokens


def _window_starts(
    df: DataFrame, w: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, gram): every w-token window with its 0-based start.

    ``lead()`` past the end yields NULL and ``concat_ws`` skips NULLs,
    so the trailing short windows are filtered by position instead.
    """
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    t = t.select(
        F.col(id_col),
        F.size("toks").alias("n_toks"),
        F.posexplode("toks").alias("pos", "tok"),
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(win) for i in range(1, w)]
    # Shuffle 16-byte digests, never the gram text: the duplicate
    # detection aggregate and the occurrence join both key on a
    # 128-bit digest — two independent xxhash64 lanes (the second
    # salted by prefixing a literal column, which changes the hash
    # chain). A single 64-bit lane is fine at fixture scale (~2e-7 at
    # 3M windows) but at the 100 TB design point window counts exceed
    # 4e9 and 64-bit birthday collisions become near-certain; at 128
    # bits the bound stays < 1e-13 even at 4e12 windows. The gram
    # string is projected ONCE, then hashed twice (no double assembly).
    g = t.select(
        F.col(id_col),
        F.col("pos"),
        F.col("n_toks"),
        F.concat_ws(" ", *parts).alias("gramstr"),
    ).where(F.col("pos") <= F.col("n_toks") - w)
    return g.select(
        F.col(id_col),
        F.col("pos"),
        F.struct(
            F.xxhash64("gramstr").alias("h1"),
            F.xxhash64(F.lit(1), F.col("gramstr")).alias("h2"),
        ).alias("gram"),
    )


def duplicated_islands(
    df: DataFrame, w: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc merged coverage intervals of duplicated w-token windows:
    (id, s, e) with s/e inclusive token positions. Occurrence starts
    are unique per doc, so the islands ORDER BY is tie-free."""
    g = _window_starts(df, w, id_col, text_col)
    dup = (
        g.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("gram")
    )
    occ = g.join(dup, "gram").select(
        F.col(id_col),
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(w - 1)).alias("e"),
    )
    win = Window.partitionBy(id_col).orderBy("s")
    prev_max = F.max("e").over(
        win.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    isl = occ.withColumn(
        "isl",
        F.sum(brk).over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy(id_col, "isl").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )


def dup_span_coverage(
    df: DataFrame, w: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Detection tier: per-doc duplicated-span token coverage.

    Output: (id, n_tokens, dup_tokens, dup_frac). ``dup_tokens`` is
    the size of the union of duplicated-window intervals (double
    counting removed by the island merge)."""
    base = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_tokens")
    )
    per = (
        duplicated_islands(df, w, id_col, text_col)
        .groupBy(id_col)
        .agg(F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"))
    )
    return base.join(per, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )


def span_dedup_clean(
    df: DataFrame, w: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Removal tier: cut every duplicated span, rebuild the text.

    The doc's islands aggregate to ONE array per doc (few islands by
    construction — they are merged intervals), broadcast back onto the
    token array via a map-side higher-order filter: token i survives
    iff no island covers i. Output: (id, n_removed, clean_text) with
    clean_text single-space normalized (token-stream granularity, the
    same normalization the window digests used)."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    arrs = (
        duplicated_islands(df, w, id_col, text_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("s"), F.col("e"))).alias("islands")
        )
    )
    j = toks.join(arrs, id_col, "left").select(
        F.col(id_col),
        F.col("toks"),
        F.coalesce(
            "islands",
            F.array().cast("array<struct<s:int,e:int>>"),
        ).alias("islands"),
    )
    indexed = F.transform(
        "toks", lambda x, i: F.struct(x.alias("tok"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            "islands",
            lambda r: (s["i"] >= r["s"]) & (s["i"] <= r["e"]),
        ),
    )
    # Project the filtered array ONCE before reusing it — an expression
    # referenced twice inside the same select would re-run the
    # island-exists filter per use (the HOF re-evaluation trap
    # documented in llm/quality.py).
    k = j.select(F.col(id_col), F.size("toks").alias("n_toks"), kept.alias("kept"))
    return k.select(
        F.col(id_col),
        (F.col("n_toks") - F.size("kept")).cast("long").alias("n_removed"),
        F.concat_ws(
            " ", F.transform("kept", lambda s: s["tok"])
        ).alias("clean_text"),
    )
