"""Property-based CEP tests (hypothesis): closed-form consequences of the
reference's contiguity/skip contracts checked against random event
sequences. These are independent re-derivations — not a second NFA — so
they can't share a bug with the implementation:

- next()            → matches are exactly the consecutive qualifying pairs
- followed_by()     → anchor binds the FIRST later qualifying event
- followed_by_any() → anchor binds EVERY later qualifying event
- within(w)         → every bound event's ts < anchor ts + w (strict edge)
- skip_to_next      → emitted starts strictly increase
- skip_past_last    → emitted matches never overlap, start order
- until(p)          → no bound loop event lies at-or-after the first
                      stop event following the anchor
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from flink_spark.cep import Pattern, find_matches

# events: increasing-ts sequences of small ints (values 0..4 so predicates
# hit often enough to exercise branching)
events_st = st.lists(
    st.integers(min_value=0, max_value=4), min_size=0, max_size=12
).map(lambda vals: [{"__ts_ms": i * 10, "v": v} for i, v in enumerate(vals)])

A = lambda e, b: e["v"] <= 2  # noqa: E731
B = lambda e, b: e["v"] >= 3  # noqa: E731


def idx_matches(events, pattern):
    ms = find_matches(events, pattern, "__ts_ms")
    return [
        [(name, ev["__ts_ms"] // 10) for name, ev in m] for m in ms
    ]


@settings(max_examples=200, deadline=None)
@given(events_st)
def test_next_is_exactly_consecutive_pairs(events):
    p = Pattern.begin("a").where(A).next("b").where(B)
    got = {tuple(m) for m in idx_matches(events, p)}
    want = {
        (("a", i), ("b", i + 1))
        for i in range(len(events) - 1)
        if A(events[i], {}) and B(events[i + 1], {})
    }
    assert got == want


@settings(max_examples=200, deadline=None)
@given(events_st)
def test_followed_by_binds_first_later_qualifier(events):
    p = Pattern.begin("a").where(A).followed_by("b").where(B)
    got = {tuple(m) for m in idx_matches(events, p)}
    want = set()
    for i in range(len(events)):
        if not A(events[i], {}):
            continue
        for j in range(i + 1, len(events)):
            if B(events[j], {}):
                want.add((("a", i), ("b", j)))
                break
    assert got == want


@settings(max_examples=200, deadline=None)
@given(events_st)
def test_followed_by_any_binds_every_later_qualifier(events):
    p = Pattern.begin("a").where(A).followed_by_any("b").where(B)
    got = {tuple(m) for m in idx_matches(events, p)}
    want = {
        (("a", i), ("b", j))
        for i in range(len(events))
        if A(events[i], {})
        for j in range(i + 1, len(events))
        if B(events[j], {})
    }
    assert got == want


@settings(max_examples=200, deadline=None)
@given(events_st, st.integers(min_value=1, max_value=5))
def test_within_bound_is_strict(events, w_steps):
    w_ms = w_steps * 10
    p = Pattern.begin("a").where(A).followed_by("b").where(B).within(w_ms)
    for m in find_matches(events, p, "__ts_ms"):
        start = m[0][1]["__ts_ms"]
        assert all(ev["__ts_ms"] < start + w_ms for _, ev in m)


@settings(max_examples=200, deadline=None)
@given(events_st)
def test_skip_to_next_starts_strictly_increase(events):
    p = (
        Pattern.begin("a").where(A).followed_by("b").where(B)
        .after_match_skip_to_next()
    )
    starts = [m[0][1] for m in idx_matches(events, p)]
    assert starts == sorted(starts)
    assert len(starts) == len(set(starts))


@settings(max_examples=200, deadline=None)
@given(events_st)
def test_skip_past_last_matches_never_overlap(events):
    p = (
        Pattern.begin("a").where(A).followed_by("b").where(B)
        .after_match_skip_past_last()
    )
    ms = idx_matches(events, p)
    prev_end = -1
    for m in ms:
        start, end = m[0][1], m[-1][1]
        assert start > prev_end
        prev_end = end


@settings(max_examples=200, deadline=None)
@given(events_st)
def test_until_never_binds_at_or_after_stop_event(events):
    stop = lambda e, b: e["v"] == 4  # noqa: E731
    p = (
        Pattern.begin("a")
        .where(lambda e, b: e["v"] <= 2)
        .one_or_more()
        .until(stop)
    )
    for m in idx_matches(events, p):
        anchor = m[0][1]
        stop_idx = next(
            (j for j in range(anchor + 1, len(events)) if stop(events[j], {})),
            None,
        )
        if stop_idx is not None:
            assert all(i < stop_idx for _, i in m)


# -- MATCH_RECOGNIZE parser properties (pure python, no Spark) --

from flink_spark.match_recognize import _build_pattern, parse_match_recognize


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=9),
    st.sampled_from(["", "+", "*", "?", "+?", "*?"]),
)
def test_mr_quantifiers_parse_to_expected_bounds(n, m_extra, simple_q):
    """PATTERN quantifiers land on the same (min, max, greedy) the
    Pattern API would set."""
    m = n + m_extra
    for quant, lo, hi, greedy in [
        (f"{{{n}}}", n, n, True),
        (f"{{{n},{m}}}", n, m, True),
        ("+", 1, 1_000_000, True),
        ("*", 0, 1_000_000, True),
        ("?", 0, 1, True),
        ("+?", 1, 1_000_000, False),
        ("*?", 0, 1_000_000, False),
    ]:
        spec = parse_match_recognize(
            f"""
            PARTITION BY k ORDER BY ts
            MEASURES LAST(A.v) AS last_v
            PATTERN (A{quant})
            DEFINE A AS A.v > 0
            """
        )
        step = _build_pattern(spec)[0].steps[0]
        assert (step.min_times, step.max_times, step.greedy) == (
            lo, hi, greedy,
        ), quant


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=96))
def test_mr_within_interval_units(hours):
    spec = parse_match_recognize(
        f"""
        PARTITION BY k ORDER BY ts
        MEASURES LAST(A.v) AS v
        PATTERN (A B)
        WITHIN INTERVAL '{hours}' HOUR
        DEFINE A AS A.v > 0, B AS B.v > 1
        """
    )
    built, _ = _build_pattern(spec)
    assert built.within_ms == hours * 3_600_000
    # concatenation is strict contiguity per the SQL standard
    assert all(s.contiguity == "strict" for s in built.steps)


# -- streaming closure properties (pure python, no Spark): simulate
# watermark advancement over random event sequences and check the
# incremental emission equals one batch pass --

from flink_spark.cep import find_matches_and_timeouts
from flink_spark.streaming.cep_stream import closed_matches


def _mk_events(vals):
    return [
        {"__ts_ms": i * 10, "__seq": i, "v": v} for i, v in enumerate(vals)
    ]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=14),
    st.integers(min_value=2, max_value=6),
    st.sampled_from(["no_skip", "skip_to_next", "skip_past_last"]),
    st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=4),
)
def test_incremental_closure_equals_batch(vals, w_steps, skip, cuts):
    """Feeding the same events through successive watermark advances
    (closed_matches with the carried floor, evicting as the operator
    does) emits exactly the batch find_matches output — for every skip
    strategy and any sequence of watermark cut points."""
    events = _mk_events(vals)
    within = w_steps * 10
    p = (
        Pattern.begin("a").where(A).followed_by("b").where(B).within(within)
    )
    if skip == "skip_to_next":
        p.after_match_skip_to_next()
    elif skip == "skip_past_last":
        p.after_match_skip_past_last()

    # batch over the full sequence, restricted to anchors that close
    # under the final watermark (= max ts here)
    final_wm = events[-1]["__ts_ms"]
    want, _ = closed_matches(events, p, final_wm, None)
    want_keys = [
        tuple((s, ev["__seq"]) for s, ev in m) for m in want
    ]

    # incremental: watermark advances through arbitrary intermediate
    # cuts; buffer evicts below wm - within each step
    got_keys = []
    floor = None
    buf = list(events)
    wms = sorted({min(final_wm, sum(cuts[: i + 1]) * 10) for i in range(len(cuts))} | {final_wm})
    for wm in wms:
        finals, floor = closed_matches(buf, p, wm, floor)
        got_keys.extend(
            tuple((s, ev["__seq"]) for s, ev in m) for m in finals
        )
        buf = [e for e in buf if e["__ts_ms"] > wm - within]
    assert got_keys == want_keys
