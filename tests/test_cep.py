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


def test_relaxed_greedy_backtracking():
    """b+ c over "b x b c" must match {b,b,c} — relaxed internal
    contiguity steps over the gap while the loop keeps consuming
    (MatchRecognizeITCase-style scenario; r1 VERDICT item 6)."""
    p = (
        Pattern.begin("b").where(lambda e, _: e["event_type"] == "B").one_or_more()
        .followed_by("c").where(lambda e, _: e["event_type"] == "C")
    )
    events = [ev(1, "B"), ev(2, "X"), ev(3, "B"), ev(4, "C")]
    m = find_matches(events, p, "__ts_ms")
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [
        ("b", 1), ("b", 3), ("c", 4),
    ]


def test_greedy_backtracks_on_overlap():
    """Greedy loop gives back events the tail needs: a+ b where the
    last event matches both predicates."""
    p = (
        Pattern.begin("a").where(lambda e, _: e["event_type"] in ("A", "AB"))
        .one_or_more()
        .followed_by("b").where(lambda e, _: e["event_type"] == "AB")
    )
    events = [ev(1, "A"), ev(2, "AB")]
    m = find_matches(events, p, "__ts_ms")
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("b", 2)]


def test_followed_by_any_branches():
    """followedByAny (Pattern.java:343): every later matching event
    creates its own match branch."""
    p = (
        Pattern.begin("a").where(lambda e, _: e["event_type"] == "A")
        .followed_by_any("b").where(lambda e, _: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "B"), ev(3, "B")]
    m = find_matches(events, p, "__ts_ms")
    got = sorted([(s, e["__ts_ms"]) for s, e in mm] for mm in m)
    assert got == [
        [("a", 1), ("b", 2)],
        [("a", 1), ("b", 3)],
    ]


def test_consecutive_loop_contiguity():
    """consecutive(): the loop's internal contiguity becomes strict, so
    the gap ends consumption."""
    p = (
        Pattern.begin("b").where(lambda e, _: e["event_type"] == "B")
        .one_or_more().consecutive()
        .followed_by("c").where(lambda e, _: e["event_type"] == "C")
    )
    events = [ev(1, "B"), ev(2, "X"), ev(3, "B"), ev(4, "C")]
    m = find_matches(events, p, "__ts_ms")
    got = sorted([(s, e["__ts_ms"]) for s, e in mm] for mm in m)
    # b@1 can't reach past the gap; b@3 matches alone
    assert got == [
        [("b", 1), ("c", 4)],
        [("b", 3), ("c", 4)],
    ]


def test_non_greedy_emits_all_takes():
    """non_greedy(): every quota-satisfying take count is its own match
    (the reference's all-prefixes oneOrMore)."""
    p = (
        Pattern.begin("a").where(lambda e, _: e["event_type"] == "A")
        .one_or_more().non_greedy()
        .followed_by("b").where(lambda e, _: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "A"), ev(3, "B")]
    m = find_matches(events, p, "__ts_ms")
    got = sorted([(s, e["__ts_ms"]) for s, e in mm] for mm in m)
    assert [("a", 1), ("a", 2), ("b", 3)] in got
    assert [("a", 1), ("b", 3)] in got
    assert [("a", 2), ("b", 3)] in got


def _ab_pattern(strategy=None, step=None):
    p = (
        Pattern.begin("a").where(lambda e, _: e["event_type"] == "A")
        .followed_by("b").where(lambda e, _: e["event_type"] == "B")
    )
    if strategy == "skip_to_next":
        p.after_match_skip_to_next()
    elif strategy == "skip_past_last":
        p.after_match_skip_past_last()
    elif strategy == "skip_to_first":
        p.after_match_skip_to_first(step)
    elif strategy == "skip_to_last":
        p.after_match_skip_to_last(step)
    return p


def test_skip_to_next():
    """SKIP_TO_NEXT (nfa/aftermatch/SkipToNextStrategy): one match per
    start event."""
    p = (
        Pattern.begin("a").where(lambda e, _: e["event_type"] == "A")
        .followed_by_any("b").where(lambda e, _: e["event_type"] == "B")
        .after_match_skip_to_next()
    )
    events = [ev(1, "A"), ev(2, "B"), ev(3, "B")]
    m = find_matches(events, p, "__ts_ms")
    assert len(m) == 1  # the a@1 anchor emits only its first completion
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("b", 2)]


def test_skip_to_first_and_last():
    """SKIP_TO_FIRST/LAST[step] prune matches starting before the
    bound event of the accepted match."""
    # a{2} with overlapping candidates: events A A A B
    base = lambda: (
        Pattern.begin("a").where(lambda e, _: e["event_type"] == "A").times(2)
        .followed_by("b").where(lambda e, _: e["event_type"] == "B")
    )
    events = [ev(1, "A"), ev(2, "A"), ev(3, "A"), ev(4, "B")]
    no_skip = base()
    m0 = find_matches(events, no_skip, "__ts_ms")
    assert len(m0) == 2  # anchors at a@1 and a@2

    to_last = base().after_match_skip_to_last("a")
    m1 = find_matches(events, to_last, "__ts_ms")
    # first match binds a@[1,2]; skip-to-last moves the floor to a@2,
    # so the anchor at index of a@2 survives, nothing earlier
    assert len(m1) == 2
    assert [e["__ts_ms"] for _, e in m1[1]][:2] == [2, 3]

    to_first = base().after_match_skip_to_first("a")
    m2 = find_matches(events, to_first, "__ts_ms")
    # floor moves to the accepted match's own first event — later
    # anchors still eligible
    assert len(m2) == 2


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


def test_skip_order_is_start_event_order():
    """ADVICE r2 counterexample: pattern A followedBy B(val > A.val) over
    A(10)@1 A(1)@2 B(5)@3 X@4 B(20)@5 with SKIP_TO_NEXT must emit BOTH
    [a@1,b@5] and [a@2,b@3] — the reference holds the completed
    [a@2,b@3] back while the earlier-started a@1 partial is in flight,
    so the later-start match's pruning floor never kills the
    earlier-start match (NFA.java processMatchesAccordingToSkipStrategy)."""

    def v(t, typ, val):
        return {"__ts_ms": t, "event_type": typ, "val": val}

    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(
            lambda e, b: e["event_type"] == "B" and e["val"] > b["a"][0]["val"]
        )
        .after_match_skip_to_next()
    )
    events = [v(1, "A", 10), v(2, "A", 1), v(3, "B", 5), v(4, "X", 0),
              v(5, "B", 20)]
    m = find_matches(events, p, "__ts_ms")
    got = [[(s, e["__ts_ms"]) for s, e in match] for match in m]
    assert got == [[("a", 1), ("b", 5)], [("a", 2), ("b", 3)]]


def test_skip_past_last_prunes_held_later_start_match():
    """Dual of the above: with SKIP_PAST_LAST the emitted [a@1,b@5]
    prunes every match starting <= its last event — the held
    [a@2,b@3] dies even though it completed first."""

    def v(t, typ, val):
        return {"__ts_ms": t, "event_type": typ, "val": val}

    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(
            lambda e, b: e["event_type"] == "B" and e["val"] > b["a"][0]["val"]
        )
        .after_match_skip_past_last()
    )
    events = [v(1, "A", 10), v(2, "A", 1), v(3, "B", 5), v(4, "X", 0),
              v(5, "B", 20)]
    m = find_matches(events, p, "__ts_ms")
    got = [[(s, e["__ts_ms"]) for s, e in match] for match in m]
    assert got == [[("a", 1), ("b", 5)]]


def test_within_boundary_is_exclusive():
    """Event exactly at start + within must NOT extend the match
    (NFA.java isStateTimedOut: timestamp - startTimestamp >= window)."""
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
        .within(10)
    )
    assert find_matches([ev(1, "A"), ev(11, "B")], p, "__ts_ms") == []
    assert find_matches([ev(1, "A"), ev(10, "B")], p, "__ts_ms")


def test_not_next_blocks_immediate_match():
    """notNext (Pattern.java:309): the event immediately after the
    previous match must not satisfy the negative condition."""
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .not_next("no_x").where(lambda e, b: e["event_type"] == "X")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    # A X B  -> the X right after A kills the match
    assert find_matches([ev(1, "A"), ev(2, "X"), ev(3, "B")], p, "__ts_ms") == []
    # A Y X B -> the event right after A is Y (ok); X later is irrelevant
    m = find_matches([ev(1, "A"), ev(2, "Y"), ev(3, "X"), ev(4, "B")], p, "__ts_ms")
    assert len(m) == 1
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("b", 4)]


def test_not_followed_by_guards_the_gap():
    """notFollowedBy (Pattern.java:329): no negative-matching event may
    occur between the previous match and the next step's first match."""
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .not_followed_by("no_x").where(lambda e, b: e["event_type"] == "X")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
    )
    # A Y X B -> X in the gap kills it
    assert (
        find_matches([ev(1, "A"), ev(2, "Y"), ev(3, "X"), ev(4, "B")], p, "__ts_ms")
        == []
    )
    # A Y B X -> X after b's match is irrelevant
    m = find_matches([ev(1, "A"), ev(2, "Y"), ev(3, "B"), ev(4, "X")], p, "__ts_ms")
    assert len(m) == 1
    assert [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1), ("b", 3)]


def test_trailing_not_followed_by_requires_within():
    import pytest as _pytest

    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .not_followed_by("no_b").where(lambda e, b: e["event_type"] == "B")
    )
    with _pytest.raises(ValueError, match="within"):
        find_matches([ev(1, "A")], p, "__ts_ms")
    # with within(): A with no B inside the window matches; a B inside kills
    p = p.within(10)
    m = find_matches([ev(1, "A"), ev(20, "B")], p, "__ts_ms")
    assert len(m) == 1 and [(s, e["__ts_ms"]) for s, e in m[0]] == [("a", 1)]
    assert find_matches([ev(1, "A"), ev(5, "B")], p, "__ts_ms") == []


def test_not_followed_by_survives_skipped_optional():
    """The pending negation carries across an optional step that takes
    zero events: A notFollowedBy(X) C? D."""
    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .not_followed_by("no_x").where(lambda e, b: e["event_type"] == "X")
        .followed_by("c").where(lambda e, b: e["event_type"] == "C").optional()
        .followed_by("d").where(lambda e, b: e["event_type"] == "D")
    )
    # no C present: the X between A and D must still kill the match
    assert (
        find_matches([ev(1, "A"), ev(2, "X"), ev(3, "D")], p, "__ts_ms") == []
    )
    m = find_matches([ev(1, "A"), ev(2, "Y"), ev(3, "D")], p, "__ts_ms")
    assert len(m) == 1


def test_timeout_side_output():
    """Timed-out partials (TimedOutPartialMatchHandler): an A whose
    window expires without the required B emits its longest partial to
    the timeout channel; a completing A emits to the match channel."""
    from flink_spark.cep import find_matches_and_timeouts

    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
        .within(10)
    )
    events = [ev(1, "A"), ev(5, "A"), ev(7, "B"), ev(40, "C")]
    matches, timeouts = find_matches_and_timeouts(events, p, "__ts_ms")
    # both As complete (B at 7 is within both windows)
    assert len(matches) == 2 and len(timeouts) == 0
    # now B is out of the first A's window: that anchor times out
    events = [ev(1, "A"), ev(25, "A"), ev(27, "B"), ev(60, "C")]
    matches, timeouts = find_matches_and_timeouts(events, p, "__ts_ms")
    assert len(matches) == 1
    assert [(s, e["__ts_ms"]) for s, e in matches[0]] == [("a", 25), ("b", 27)]
    assert len(timeouts) == 1
    assert [(s, e["__ts_ms"]) for s, e in timeouts[0]] == [("a", 1)]


def test_timeout_window_still_open_is_not_emitted():
    from flink_spark.cep import find_matches_and_timeouts

    p = (
        Pattern.begin("a").where(lambda e, b: e["event_type"] == "A")
        .followed_by("b").where(lambda e, b: e["event_type"] == "B")
        .within(100)
    )
    # the key's last event is inside A's window: not yet a timeout
    events = [ev(1, "A"), ev(30, "C")]
    matches, timeouts = find_matches_and_timeouts(events, p, "__ts_ms")
    assert matches == [] and timeouts == []


def test_until_stops_loop_without_consuming_stop_event():
    """Pattern.java:228 until(): the loop stops at the first event
    satisfying the stop condition; a relaxed loop may not step over it,
    and the stopping event is not bound."""

    def v(t, val):
        return {"__ts_ms": t, "val": val}

    base = lambda: (  # noqa: E731
        Pattern.begin("a")
        .where(lambda e, b: e["val"] < 10)
        .one_or_more()
    )
    events = [v(1, 1), v(2, 2), v(3, 20), v(4, 3)]

    # without until: the relaxed loop steps over 20 and greedily
    # takes [1, 2, 3]
    m = find_matches(events, base(), "__ts_ms")
    assert [(s, e["val"]) for s, e in m[0]] == [("a", 1), ("a", 2), ("a", 3)]

    # with until(val >= 20): the loop is cut at the stop event
    p = base().until(lambda e, b: e["val"] >= 20)
    m = find_matches(events, p, "__ts_ms")
    assert [(s, e["val"]) for s, e in m[0]] == [("a", 1), ("a", 2)]
    # the stop event itself is never bound
    assert all(e["val"] != 20 for match in m for _, e in match)
