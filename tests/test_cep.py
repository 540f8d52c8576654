"""CEP engine tests: NFA semantics on hand-built sequences + the Spark
pattern_match operator on the events table."""

from __future__ import annotations

from flink_spark.cep import Pattern, find_matches, pattern_match


def ev(t, typ, i=0):
    return {"__ts_ms": t, "event_type": typ, "event_id": i}


def test_begin_followed_by():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "X"), ev(3, "B"), ev(4, "B")]
    m = find_matches(events, p, "__ts_ms")
    # one match from the A at t=1 (relaxed skip over X, first B wins)
    assert len(m) == 1
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("b", 3)]


def test_next_strict_contiguity():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .next("b").where(lambda e, b: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "X"), ev(3, "B"), ev(4, "A"), ev(5, "B")]
    m = find_matches(events, p, "__ts_ms")
    # only A@4 -> B@5 is strictly contiguous
    assert len(m) == 1
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 4), ("b", 5)]


def test_times_quantifier():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A").times(2)
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "A"), ev(3, "B")]
    m = find_matches(events, p, "__ts_ms")
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("a", 2), ("b", 3)]
    # insufficient As -> no match
    assert find_matches([ev(1, "A"), ev(3, "B")], p, "__ts_ms") == []


def test_one_or_more_greedy():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A").one_or_more()
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "A"), ev(3, "A"), ev(4, "B")]
    m = find_matches(events, p, "__ts_ms")
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [
        ("a", 1), ("a", 2), ("a", 3), ("b", 4),
    ]


def test_optional_step():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("x").where(lambda e, b: e["event_type"] == "X").optional()
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    with_x = find_matches([ev(1, "A"), ev(2, "X"), ev(3, "B")], p, "__ts_ms")
    assert [(s, e["__ts_ms"]) for s, e in with_x[0]] == [("a", 1), ("x", 2), ("b", 3)]
    without_x = find_matches([ev(1, "A"), ev(3, "B")], p, "__ts_ms")
    assert [(s, e["__ts_ms"]) for s, e in without_x[0]] == [("a", 1), ("b", 3)]


def test_within_window():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
        .within(10)
    )
    assert find_matches([ev(1, "A"), ev(5, "B")], p, "__ts_ms")
    assert find_matches([ev(1, "A"), ev(20, "B")], p, "__ts_ms") == []


def test_after_match_skip():
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "A"), ev(3, "B"), ev(4, "B")]
    # NO_SKIP: both As start a match; each takes the first B after it
    m = find_matches(events, p, "__ts_ms")
    assert len(m) == 2
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("b", 3)]
    assert [(s, e["__ts_ms"]) for s, e in m[1]] == [("a", 2), ("b", 3)]
    # SKIP_PAST_LAST: the A@2 is inside the first match's span -> skipped
    p2 = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
        .after_match_skip_past_last()
    )
    m2 = find_matches(events, p2, "__ts_ms")
    assert len(m2) == 1


def test_binding_predicates():
    """Predicates can reference earlier bindings (PREV-style conditions)."""
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(
            lambda e, b: e["event_type"] == "A"
            and e["event_id"] > b["a"][0]["event_id"]
        )
    )
    events = [ev(1, "A", 10), ev(2, "A", 5), ev(3, "A", 20)]
    m = find_matches(events, p, "__ts_ms")
    assert [(s, e["event_id"]) for s, e in m[0]] == [("a", 10), ("b", 20)]


def test_pattern_match_on_spark(spark):
    """End-to-end on the events table: click then purchase within 1h."""
    from flink_spark.catalog import Catalog
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    ev_df = Catalog(spark, SF_DIR).events
    pat = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "click")
        .followed_by("b").where(
            lambda e, b: e["event_type"] == "purchase"
            and e["__ts_ms"] > b["a"][0]["__ts_ms"]
        )
        .within(3_600_000)
        .after_match_skip_past_last()
    )
    out = pattern_match(
        ev_df, pat, key="user_id", ts_col="ts",
        order_cols=["event_id"], payload_cols=["event_type", "event_id"],
    ).cache()
    n = out.count()
    assert n > 0 and n % 2 == 0  # pairs of (a, b) rows
    steps = {r["step"] for r in out.select("step").distinct().collect()}
    assert steps == {"a", "b"}
    # every matched 'b' is a purchase after its 'a' click within 1h
    a = out.where(F.col("step") == "a").select("user_id", "match_id", F.col("ts_ms").alias("a_ts"))
    b = out.where(F.col("step") == "b").select("user_id", "match_id", F.col("ts_ms").alias("b_ts"))
    j = a.join(b, ["user_id", "match_id"]).where(
        (F.col("b_ts") <= F.col("a_ts")) | (F.col("b_ts") > F.col("a_ts") + 3_600_000)
    )
    assert j.count() == 0
