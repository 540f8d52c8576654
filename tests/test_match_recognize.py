"""SQL MATCH_RECOGNIZE front-end: clause parsing + scenarios ported from
the reference's MatchRecognizeITCase shapes (quantifiers, DEFINE
cross-variable refs, AFTER MATCH SKIP variants, WITHIN)."""

from __future__ import annotations

import datetime as dt

import pytest

from flink_spark.match_recognize import match_recognize, parse_match_recognize

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(1, T0 + dt.timedelta(seconds=i), sym, price)
         for i, (sym, price) in enumerate(rows)],
        "k long, ts timestamp, sym string, price double",
    )


def _run(spark, rows, clause, types=None):
    out = match_recognize(_df(spark, rows), clause, measure_types=types)
    return sorted(tuple(r) for r in out.collect())


def test_parse_sections():
    spec = parse_match_recognize(
        """
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(A.price) AS p0, COUNT(B.*) AS n
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO LAST B
        PATTERN (A B{2,3} C?)
        WITHIN INTERVAL '5' MINUTE
        DEFINE A AS A.sym = 'a', B AS B.price > FIRST(A.price)
        """
    )
    assert spec.partition_by == "k"
    assert spec.pattern == [("A", ""), ("B", "{2,3}"), ("C", "?")]
    assert spec.after_match == "skip_to_last" and spec.skip_var == "B"
    assert spec.within_ms == 300_000
    assert [a for _, a in spec.measures] == ["p0", "n"]


V_SHAPE = """
    PARTITION BY k ORDER BY ts
    MEASURES FIRST(A.price) AS start_p, LAST(DOWN.price) AS bottom_p,
             LAST(UP.price) AS end_p
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A DOWN+ UP+)
    DEFINE A AS A.sym = 's',
           DOWN AS DOWN.price < PREV(DOWN.price),
           UP AS UP.price > PREV(UP.price)
"""


def test_v_shape_pattern(spark):
    """The classic MatchRecognizeITCase V-pattern: strictly falling then
    strictly rising prices."""
    rows = [("s", 10.0), ("x", 8.0), ("x", 6.0), ("x", 9.0), ("x", 12.0)]
    got = _run(spark, rows, V_SHAPE,
               {"start_p": "double", "bottom_p": "double", "end_p": "double"})
    # greedy: DOWN consumes 8,6; UP consumes 9,12
    assert got == [(1, 0, 10.0, 6.0, 12.0)]


def test_times_quantifier_and_count(spark):
    rows = [("a", 1.0), ("b", 2.0), ("b", 3.0), ("c", 4.0)]
    got = _run(
        spark, rows,
        """
        PARTITION BY k ORDER BY ts
        MEASURES COUNT(B.*) AS nb, LAST(C.price) AS cp
        PATTERN (A B{2} C)
        DEFINE A AS A.sym = 'a', B AS B.sym = 'b', C AS C.sym = 'c'
        """,
        {"nb": "long", "cp": "double"},
    )
    assert got == [(1, 0, 2, 4.0)]


def test_optional_and_missing_measure_is_null(spark):
    rows = [("a", 1.0), ("c", 2.0)]
    got = _run(
        spark, rows,
        """
        PARTITION BY k ORDER BY ts
        MEASURES COUNT(B.*) AS nb, LAST(C.price) AS cp
        PATTERN (A B? C)
        DEFINE A AS A.sym = 'a', B AS B.sym = 'b', C AS C.sym = 'c'
        """,
        {"nb": "long", "cp": "double"},
    )
    assert got == [(1, 0, 0, 2.0)]


def test_skip_past_last_vs_to_next(spark):
    # overlapping AB matches: a1 b1 a2 b2 with relaxed X between
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    base = """
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(A.price) AS ap, FIRST(B.price) AS bp
        AFTER MATCH {skip}
        PATTERN (A X*? B)
        DEFINE A AS A.sym = 'a', B AS B.sym = 'b'
    """
    to_next = _run(spark, rows, base.format(skip="SKIP TO NEXT ROW"),
                   {"ap": "double", "bp": "double"})
    # one match per 'a', each takes the first 'b'
    assert to_next == [(1, 0, 1.0, 3.0), (1, 1, 2.0, 3.0)]
    past_last = _run(spark, rows, base.format(skip="SKIP PAST LAST ROW"),
                     {"ap": "double", "bp": "double"})
    # the first match spans a1..b1; everything starting inside is skipped
    assert past_last == [(1, 0, 1.0, 3.0)]


def test_within_window_excludes_boundary(spark):
    rows = [("a", 1.0), ("b", 2.0)]
    clause = """
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(B.price) AS bp
        PATTERN (A X*? B)
        WITHIN INTERVAL '1' SECOND
        DEFINE A AS A.sym = 'a', B AS B.sym = 'b'
    """
    # rows are 1s apart; WITHIN 1 SECOND is exclusive -> no match
    assert _run(spark, rows, clause, {"bp": "double"}) == []


def test_non_greedy_loop_emits_shortest(spark):
    rows = [("a", 1.0), ("b", 2.0), ("b", 3.0), ("c", 4.0), ("c", 5.0)]
    got = _run(
        spark, rows,
        """
        PARTITION BY k ORDER BY ts
        MEASURES COUNT(X.*) AS nx, FIRST(C.price) AS cp
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A X*? C)
        DEFINE A AS A.sym = 'a', C AS C.sym = 'c'
        """,
        {"nx": "long", "cp": "double"},
    )
    # reluctant X: the first 'c' wins (two bs skipped); one match per A
    assert got == [(1, 0, 2, 4.0)]


def test_match_recognize_stream_matches_batch(spark, tmp_path):
    """Streaming MATCH_RECOGNIZE equals the batch operator when every
    anchor's WITHIN window closes (flush row per key)."""
    import pandas as pd
    from flink_spark.match_recognize import (
        match_recognize,
        match_recognize_stream,
    )

    def rows(lo, hi):
        out = []
        for uid in (1, 2):
            for i in range(lo, hi):
                t = (
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(minutes=9 * i + uid)
                ).to_pydatetime()
                typ = "down" if i % 4 in (1, 2) else "up"
                out.append((uid, t, typ, float(i)))
        return out

    schema = ["user_id", "ts", "event_type", "v"]
    batches = [rows(0, 5), rows(5, 10), rows(10, 15)]
    batches[2] += [
        (uid, pd.Timestamp("2024-01-04").to_pydatetime(), "noop", 0.0)
        for uid in (1, 2)
    ]
    src = tmp_path / "mr_src"
    src.mkdir()
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )

    clause = """
      PARTITION BY user_id ORDER BY ts
      MEASURES COUNT(D.*) AS n_down, LAST(U.event_type) AS last_u
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (D+ U)
      WITHIN INTERVAL '1' HOUR
      DEFINE D AS D.event_type = 'down', U AS U.event_type = 'up'
    """
    mt = {"n_down": "long"}

    sdf = (
        spark.readStream.schema(
            spark.read.parquet(str(src / "b0.parquet")).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*/")
    )
    out = match_recognize_stream(sdf, clause, mt)
    from flink_spark.streaming import core as SC

    SC.run_to_memory(out, "t_mr_stream", "append")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, match_id, n_down, last_u FROM t_mr_stream"
        ).collect()
    )

    full = [r for b in batches for r in b]
    bdf = spark.createDataFrame(full, schema)
    want = sorted(
        tuple(r) for r in match_recognize(bdf, clause, mt).collect()
    )
    assert len(got) > 0
    assert got == want


def test_reluctant_plus_vs_greedy_plus(spark):
    """MatchRecognizeITCase greedy/reluctant contrast: B+? stops at the
    first row that lets C match, B+ absorbs every eligible row. Ported
    shape: testGreedyQuantifier/testReluctantQuantifier."""
    rows = [("a", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0), ("c", 9.0)]
    base = """
        PARTITION BY k ORDER BY ts
        MEASURES COUNT(B.*) AS nb, LAST(B.price) AS lastb
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B{q} C)
        DEFINE A AS A.sym = 'a', B AS B.sym = 'b', C AS C.sym = 'c'
    """
    types = {"nb": "long", "lastb": "double"}
    greedy = _run(spark, rows, base.format(q="+"), types)
    assert greedy == [(1, 0, 3, 4.0)]
    reluctant = _run(spark, rows, base.format(q="+?"), types)
    # reluctant still must consume all three b's before the only c —
    # contiguity forces the same rows, proving +? does not under-match
    assert reluctant == [(1, 0, 3, 4.0)]
    # with an alternative early exit (c appears mid-run), +? takes it
    rows2 = [("a", 1.0), ("b", 2.0), ("c", 5.0), ("b", 3.0), ("c", 6.0)]
    assert _run(spark, rows2, base.format(q="+?"), types) == [(1, 0, 1, 2.0)]


def test_skip_to_first_variable_restarts_inside_match(spark):
    """AFTER MATCH SKIP TO FIRST B (MatchRecognizeITCase
    testAfterMatchSkipToFirst): the next match attempt begins AT the
    first B row of the previous match, so runs of b's yield overlapping
    matches anchored at successive b's."""
    rows = [("a", 1.0), ("b", 2.0), ("b", 3.0), ("c", 4.0)]
    got = _run(
        spark, rows,
        """
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(B.price) AS firstb, COUNT(B.*) AS nb
        AFTER MATCH SKIP TO FIRST B
        PATTERN (A? B+ C)
        DEFINE A AS A.sym = 'a', B AS B.sym = 'b', C AS C.sym = 'c'
        """,
        {"firstb": "double", "nb": "long"},
    )
    # match 1: a b(2) b(3) c → restart AT b(2): match 2 is b(2) b(3) c;
    # its first B is again b(2), which would loop — the SQL:2016 loop
    # guard advances one row → match 3 is b(3) c. Three matches total,
    # anchored at successive B rows.
    firstbs = sorted(r[2] for r in got)
    assert firstbs == [2.0, 2.0, 3.0]


def test_all_rows_per_match_rejected():
    with pytest.raises(NotImplementedError, match="ALL ROWS PER MATCH"):
        parse_match_recognize(
            """
            PARTITION BY k ORDER BY ts
            MEASURES FIRST(A.price) AS p
            ALL ROWS PER MATCH
            PATTERN (A)
            DEFINE A AS A.sym = 'a'
            """
        )


def test_define_injection_rejected(spark):
    """The DEFINE compiler must reject non-expression Python constructs
    (attribute access, dunder reach-through, comprehensions) — the
    closed grammar is the injection guard."""
    bad_defs = [
        "A.price.__class__ = 1",            # statement → parse error
        "A.sym == 'a' and (__import__)",    # unknown name
        "[x for x in A.sym]",               # comprehension
    ]
    for bad in bad_defs:
        clause = f"""
            PARTITION BY k ORDER BY ts
            MEASURES FIRST(A.price) AS p
            PATTERN (A)
            DEFINE A AS {bad}
        """
        with pytest.raises((ValueError, NotImplementedError)):
            _run(spark, [("a", 1.0)], clause, {"p": "double"})


def test_define_vectorization_eligibility():
    """Current-row-only comparisons get a vectorized mask builder; any
    expression needing match state (PREV/FIRST/LAST/COUNT, other
    variables) stays on the scalar evaluator."""
    from flink_spark.match_recognize import _compile_expr

    vs = {"A", "B"}
    assert _compile_expr("A.price > 5", "A", vs).vectorized is not None
    assert _compile_expr(
        "A.price > 5 AND NOT A.sym = 'x' OR A.price < 1", "A", vs
    ).vectorized is not None
    assert _compile_expr("PREV(A.price) < A.price", "A", vs).vectorized is None
    assert _compile_expr("A.price > FIRST(A.price)", "A", vs).vectorized is None
    assert _compile_expr("COUNT(A.*) < 3", "A", vs).vectorized is None
    assert _compile_expr("A.price > B.price", "A", vs).vectorized is None


def test_define_vector_mask_equals_scalar_eval():
    """The numpy mask must agree with per-row scalar evaluation on a
    null-free batch — including and/or/not lowering and chained
    comparisons."""
    import numpy as np

    from flink_spark.match_recognize import _compile_expr

    rows = [
        {"price": float(p), "sym": s}
        for p, s in [(1, "a"), (5, "b"), (9, "a"), (3, "c"), (7, "a")]
    ]
    cols = {
        "price": np.array([r["price"] for r in rows]),
        "sym": np.array([r["sym"] for r in rows], dtype=object),
    }
    for expr in [
        "A.price > 4",
        "A.price > 2 AND A.sym = 'a'",
        "NOT A.sym = 'a' OR A.price >= 7",
        "2 < A.price AND A.price < 8",
    ]:
        fn = _compile_expr(expr, "A", {"A"})
        assert fn.vectorized is not None, expr
        mask = fn.vectorized(cols, len(rows))
        want = [bool(fn(r, {})) for r in rows]
        assert mask.tolist() == want, expr


def test_vectorized_and_scalar_paths_agree_end_to_end(spark, monkeypatch):
    """match_recognize output must be identical with vectorization
    disabled (mask path vs scalar path walk the same NFA)."""
    import flink_spark.match_recognize as MR

    rows = [("a", 2.0), ("b", 8.0), ("a", 9.0), ("c", 1.0),
            ("a", 7.0), ("b", 3.0), ("a", 5.0)]
    clause = """
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(A.price) AS p0, LAST(B.price) AS p1
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B)
        DEFINE A AS A.price > 4,
               B AS B.price < 4
    """
    got_vec = _run(spark, rows, clause, {"p0": "double", "p1": "double"})
    monkeypatch.setattr(MR, "_try_vectorize", lambda tree, expr: None)
    got_scalar = _run(spark, rows, clause, {"p0": "double", "p1": "double"})
    assert got_vec == got_scalar
    assert got_vec, "fixture must produce at least one match"


def test_vectorization_skipped_on_null_column(spark):
    """A referenced column with nulls must fall back to the scalar
    evaluator (SQL three-valued logic: NULL comparisons are not
    matches), not evaluate elementwise."""
    import datetime as dt2

    df = spark.createDataFrame(
        [
            (1, T0, "a", 5.0),
            (1, T0 + dt2.timedelta(seconds=1), "b", None),
            (1, T0 + dt2.timedelta(seconds=2), "c", 9.0),
        ],
        "k long, ts timestamp, sym string, price double",
    )
    clause = """
        PARTITION BY k ORDER BY ts
        MEASURES FIRST(A.sym) AS s
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A)
        DEFINE A AS NOT A.price > 4
    """
    out = match_recognize(df, clause, measure_types={"s": "string"})
    # NULL > 4 is NULL -> NOT NULL is NULL -> no match for the null row;
    # 5.0 and 9.0 fail NOT(>4); no row matches
    assert sorted(tuple(r) for r in out.collect()) == []
