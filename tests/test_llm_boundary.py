"""Boundary tests for the LLM-pipeline shingle machinery — an
exactly-n-token document has exactly ONE n-gram, and both the Spark
side (llm/dedup.text_shingles) and the DuckDB oracle comprehension
(queries_ext4._decontaminate_oracle) must agree on it."""

from __future__ import annotations

import duckdb


def test_shingles_exact_n_token_doc(spark):
    from flink_spark.llm.dedup import text_shingles

    doc8 = "a b c d e f g h"          # exactly 8 tokens -> 1 shingle
    doc9 = "a b c d e f g h i"        # 9 tokens -> 2 shingles
    doc7 = "a b c d e f g"            # 7 tokens -> 0 shingles
    df = spark.createDataFrame(
        [(1, doc8), (2, doc9), (3, doc7)], "doc_id int, text string"
    )
    got = {
        (r.doc_id, r.shingle)
        for r in text_shingles(df, "doc_id", "text", n=8).collect()
    }
    assert got == {
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),
        (2, "b c d e f g h i"),
    }


def test_oracle_shingle_comprehension_includes_final_gram():
    """The DuckDB list comprehension mirrors text_shingles: range() is
    exclusive-upper, so the bound must be len(ws) - (n-2) to keep the
    final n-gram (the r4 oracle dropped it — an 8-token doc yielded
    zero shingles)."""
    n = 8
    gram = " || ' ' || ".join(
        "ws[i]" if j == 0 else f"ws[i+{j}]" for j in range(n)
    )
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH d AS (
          SELECT * FROM (VALUES
            (1, string_split('a b c d e f g h', ' ')),
            (2, string_split('a b c d e f g h i', ' '))
          ) AS t(doc_id, ws))
        SELECT doc_id, count(*) AS n_sh FROM (
          SELECT doc_id,
                 unnest([{gram} for i in range(1, len(ws) - {n - 2})]) AS s
          FROM d WHERE len(ws) >= {n})
        GROUP BY doc_id ORDER BY doc_id
    """).fetchall()
    con.close()
    assert rows == [(1, 1), (2, 2)]


def test_decontaminate_flags_final_gram_overlap(spark):
    """A train doc whose ONLY shared n-gram with the eval set is its
    final one must be flagged — exercises the boundary the off-by-one
    oracle never verified."""
    from flink_spark.llm.dedup import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "x x x q r s t u v w x")], "doc_id int, text string"
    )
    train = spark.createDataFrame(
        [
            # last 8-gram 'p q r s t u v w' vs eval's 'q r s t u v w x':
            # no overlap -> clean
            (1, "m n o p q r s t u v w"),
            # last 8-gram == an eval 8-gram -> contaminated
            (2, "z z z q r s t u v w x"),
            (3, "nothing in common here at all ok fine"),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r.contaminated
        for r in decontaminate(train, eval_df, n=8).collect()
    }
    assert got == {1: False, 2: True, 3: False}


def test_temporal_overlaps_reversed_period(spark):
    """Flink normalizes each (timePoint, end) pair so lo <= hi before
    the inclusive comparison (Calcite convertOverlaps) — a reversed
    period must give the same answer as its sorted spelling."""
    import pyspark.sql.functions as F

    from flink_spark.functions.scalar import temporal_overlaps

    df = spark.createDataFrame(
        [(1, 5, 4, 8), (5, 1, 4, 8), (1, 2, 3, 4), (2, 1, 4, 3)],
        "s1 int, e1 int, s2 int, e2 int",
    )
    rows = df.select(
        temporal_overlaps(
            F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")
        ).alias("o")
    ).collect()
    assert [r.o for r in rows] == [True, True, False, False]
