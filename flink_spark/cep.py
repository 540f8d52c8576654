"""CEP: complex event processing — Pattern API + NFA matcher.

Reference semantics (ported as *behavior*, not code):
- Pattern API: Pattern.begin/where/next/followedBy/followedByAny,
  quantifiers times/oneOrMore/optional/greedy/consecutive, within
  (flink-libraries/flink-cep/.../pattern/Pattern.java:137-418; the
  followedByAny branching is Pattern.java:343)
- NFA matching (flink-libraries/flink-cep/.../nfa/NFA.java) via a
  backtracking enumerator over each key's time-ordered events.
- After-match skip strategies (nfa/aftermatch/): NO_SKIP (default),
  SKIP_TO_NEXT, SKIP_PAST_LAST_EVENT, SKIP_TO_FIRST(step),
  SKIP_TO_LAST(step) — all five of the reference's strategies.
- SQL MATCH_RECOGNIZE glue (StreamExecMatch.java:59) is a later
  front-end; the Pattern API is the contract (SURVEY §7 M5).

Contiguity model (matching Flink):
- next()            strict  — the very next event must match
- followed_by()     relaxed — non-matching events are skipped; the
                              FIRST matching event continues the match
- followed_by_any() any     — every later matching event starts its own
                              branch (all-combinations, NFA forking)
- looping quantifiers use relaxed internal contiguity by default
  (non-matching gaps are stepped over while consuming, with full
  backtracking — `b+ c` over "b x b c" matches {b,b,c});
  .consecutive() switches the loop to strict internal contiguity.
- Quantifiers are greedy by default (longest take that still lets the
  rest of the pattern match wins — regex-style backtracking).
  .non_greedy() emits every quota-satisfying take count as its own
  match (the reference's default for oneOrMore emits all prefixes;
  our default is greedy because that is the overwhelmingly common
  query intent — the deviation is this flag's direction).

Match emission order is start-event order (then end index): the
reference's NFA holds a completed match back while a partial match that
started earlier is still in flight, so emission — and after-match
pruning — happen in start order (NFA.java
processMatchesAccordingToSkipStrategy: completedMatches is a priority
queue keyed by start, isEarlier gates emission, and each emitted match
prunes both partial and held completed matches).

Execution: per-key sequential scan over time-ordered events — the same
shape as Flink's keyed NFA state. On Spark the per-key work runs inside
applyInPandas; parallelism comes from the key partitioning, so the
operator scales with key cardinality (a single mega-key is the same
bottleneck it is in the reference). `any` contiguity is exponential in
the worst case, exactly as in the reference's SharedBuffer branching.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Predicate = Callable[[dict, dict], bool]
"""(event_row, bindings_so_far) -> bool; bindings maps step name -> list of rows."""

# contiguity for the first event of a step
STRICT, RELAXED, ANY = "strict", "relaxed", "any"


@dataclass
class _Step:
    name: str
    predicate: Predicate | None = None
    contiguity: str = RELAXED  # next()=strict / followed_by()=relaxed / _any()=any
    min_times: int = 1
    max_times: int = 1
    greedy: bool = True
    loop_contiguity: str = RELAXED  # internal; consecutive() -> strict
    negated: bool = False  # notNext / notFollowedBy (Pattern.java:309,329)
    until: Predicate | None = None  # loop stop condition (Pattern.java:228)


@dataclass
class Pattern:
    """Fluent pattern builder mirroring the reference's Pattern API."""

    steps: list[_Step] = field(default_factory=list)
    within_ms: int | None = None
    after_match: str = "no_skip"
    skip_to_step: str | None = None  # for skip_to_first / skip_to_last

    @staticmethod
    def begin(name: str) -> "Pattern":
        p = Pattern()
        p.steps.append(_Step(name, contiguity=STRICT))
        return p

    def where(self, pred: Predicate) -> "Pattern":
        self.steps[-1].predicate = pred
        return self

    def next(self, name: str) -> "Pattern":
        self.steps.append(_Step(name, contiguity=STRICT))
        return self

    def followed_by(self, name: str) -> "Pattern":
        self.steps.append(_Step(name, contiguity=RELAXED))
        return self

    def followed_by_any(self, name: str) -> "Pattern":
        """All-combinations branching (Pattern.java:343 followedByAny)."""
        self.steps.append(_Step(name, contiguity=ANY))
        return self

    def not_next(self, name: str) -> "Pattern":
        """Negative strict step (Pattern.java:309 notNext): the event
        immediately after the previous match must NOT satisfy the
        condition. Binds no rows."""
        self.steps.append(_Step(name, contiguity=STRICT, negated=True))
        return self

    def not_followed_by(self, name: str) -> "Pattern":
        """Negative relaxed step (Pattern.java:329 notFollowedBy): no
        event satisfying the condition may occur between the previous
        match and the next step's first match. As the LAST step it
        requires ``within()`` (the reference's MalformedPatternException
        contract): the negation is then checked to the window edge."""
        self.steps.append(_Step(name, contiguity=RELAXED, negated=True))
        return self

    def times(self, n: int, n_max: int | None = None) -> "Pattern":
        self.steps[-1].min_times = n
        self.steps[-1].max_times = n_max if n_max is not None else n
        return self

    def one_or_more(self, max_times: int = 1_000_000) -> "Pattern":
        self.steps[-1].min_times = 1
        self.steps[-1].max_times = max_times
        return self

    def optional(self) -> "Pattern":
        self.steps[-1].min_times = 0
        return self

    def greedy(self) -> "Pattern":
        self.steps[-1].greedy = True
        return self

    def non_greedy(self) -> "Pattern":
        """Emit a match for every quota-satisfying take count (the
        reference's all-prefixes oneOrMore behavior)."""
        self.steps[-1].greedy = False
        return self

    def consecutive(self) -> "Pattern":
        """Strict internal contiguity for the current looping step
        (Pattern.java consecutive())."""
        self.steps[-1].loop_contiguity = STRICT
        return self

    def until(self, pred: Predicate) -> "Pattern":
        """Stop condition for the current looping step (Pattern.java:228):
        once an event satisfying ``pred`` is reached, the loop accepts no
        further events on that branch — the stopping event itself is NOT
        consumed (the reference's IterativeCondition stop semantics).
        Meaningful with oneOrMore/times ranges; a relaxed loop can no
        longer step over the stopping event either."""
        self.steps[-1].until = pred
        return self

    def within(self, duration_ms: int) -> "Pattern":
        self.within_ms = duration_ms
        return self

    # -- after-match skip strategies (nfa/aftermatch/) --

    def after_match_skip_past_last(self) -> "Pattern":
        self.after_match = "skip_past_last"
        return self

    def after_match_skip_to_next(self) -> "Pattern":
        self.after_match = "skip_to_next"
        return self

    def after_match_skip_to_first(self, step: str) -> "Pattern":
        self.after_match = "skip_to_first"
        self.skip_to_step = step
        return self

    def after_match_skip_to_last(self, step: str) -> "Pattern":
        self.after_match = "skip_to_last"
        self.skip_to_step = step
        return self


def _enumerate_from(
    events: list[dict], start: int, pattern: Pattern, ts_field: str
) -> Iterator[list[tuple[str, int]]]:
    """Yield every complete match anchored at events[start].

    Backtracking search over (step, position, take-count) decisions.
    Greedy steps prefer consuming and suppress the shorter alternative
    once the longer one succeeds; non-greedy steps emit both.
    """
    steps = pattern.steps
    n = len(events)
    deadline = (
        events[start][ts_field] + pattern.within_ms
        if pattern.within_ms is not None
        else None
    )

    def in_window(idx: int) -> bool:
        # strict: the reference times out when ts - startTs >= windowTime
        # (NFA.java isStateTimedOut), so an event exactly at the window
        # edge must NOT extend a match.
        return deadline is None or events[idx][ts_field] < deadline

    def rec(
        si: int, pos: int, taken: int,
        matched: list[tuple[str, int]], bindings: dict,
        pending_neg: tuple = (),
    ) -> Iterator[list[tuple[str, int]]]:
        if si == len(steps):
            yield list(matched)
            return
        step = steps[si]

        if step.negated:
            hit = lambda p: (  # noqa: E731 — negative condition at p
                step.predicate is None or step.predicate(events[p], bindings)
            )
            if step.contiguity == STRICT:
                # notNext: the immediately following event must not match
                if pos < n and in_window(pos) and hit(pos):
                    return
                yield from rec(si + 1, pos, 0, matched, bindings, pending_neg)
            elif si == len(steps) - 1:
                # trailing notFollowedBy: only legal with within() — the
                # negation holds to the window edge (NFA stop state +
                # window timeout converting the pending match to emitted)
                p = pos
                while p < n and in_window(p):
                    if hit(p):
                        return
                    p += 1
                yield list(matched)
            else:
                # notFollowedBy: becomes a pending stop condition checked
                # while the NEXT positive step scans for its first event
                yield from rec(
                    si + 1, pos, 0, matched, bindings, pending_neg + (step,)
                )
            return

        def advance() -> Iterator[list[tuple[str, int]]]:
            if taken >= step.min_times:
                # an optional step taking zero events keeps the pending
                # notFollowedBy guard alive for the following step
                yield from rec(
                    si + 1, pos, 0, matched, bindings,
                    pending_neg if taken == 0 else (),
                )

        def consume() -> Iterator[list[tuple[str, int]]]:
            if taken >= step.max_times:
                return
            # contiguity governing the next event of this step
            contig = step.contiguity if taken == 0 else step.loop_contiguity
            p = pos
            while p < n:
                if not in_window(p):
                    return
                ev = events[p]
                if taken == 0 and any(
                    ns.predicate is None or ns.predicate(ev, bindings)
                    for ns in pending_neg
                ):
                    # a notFollowedBy condition fired in the gap before
                    # this step's first event — the branch dies (the
                    # reference's stop state wins over a take)
                    return
                if (
                    step.until is not None
                    and taken > 0
                    and step.until(ev, bindings)
                ):
                    # loop stop condition: no further takes on this
                    # branch, and the stopping event is not consumed
                    return
                ok = step.predicate is None or step.predicate(ev, bindings)
                if ok:
                    matched.append((step.name, p))
                    bindings.setdefault(step.name, []).append(ev)
                    yield from rec(si, p + 1, taken + 1, matched, bindings)
                    bindings[step.name].pop()
                    if not bindings[step.name]:
                        del bindings[step.name]
                    matched.pop()
                    if contig != ANY:
                        return  # committed to the first matching event
                    p += 1  # any: also branch on later matching events
                else:
                    if contig == STRICT:
                        return
                    if si == 0 and taken == 0:
                        return  # begin step anchors at `start`
                    p += 1  # relaxed/any: step over the non-matching event

        if step.greedy:
            produced = False
            for m in consume():
                produced = True
                yield m
            # greedy: the shorter (advance) alternative only if no longer
            # take succeeded — regex-style backtracking
            if not produced:
                yield from advance()
        else:
            yield from advance()
            yield from consume()

    yield from rec(0, start, 0, [], {})


def find_matches(
    events: list[dict], pattern: Pattern, ts_field: str
) -> list[list[tuple[str, dict]]]:
    """Run the NFA over one key's time-ordered events and apply the
    after-match skip strategy in start-event order.

    The reference emits a completed match only once no surviving partial
    match starts earlier (NFA.java processMatchesAccordingToSkipStrategy
    / isEarlier), so among completed matches both emission and pruning
    happen in (start idx, end idx) order — an earlier-start/later-end
    match is never pruned by a later-start/earlier-end match's floor.
    """
    if (
        pattern.steps
        and pattern.steps[-1].negated
        and pattern.steps[-1].contiguity == RELAXED
        and pattern.within_ms is None
    ):
        raise ValueError(
            "notFollowedBy as the last step requires within() "
            "(Pattern.java MalformedPatternException contract)"
        )
    raw: list[list[tuple[str, int]]] = []
    for i in range(len(events)):
        raw.extend(_enumerate_from(events, i, pattern, ts_field))
    # start-event order: (start idx, end idx, full index tuple)
    raw.sort(key=lambda m: (m[0][1], m[-1][1], tuple(idx for _, idx in m)))

    out: list[list[tuple[str, dict]]] = []
    min_start = 0
    for m in raw:
        m_start, m_end = m[0][1], m[-1][1]
        if m_start < min_start:
            continue  # pruned by the strategy (reference: discardComputationStates)
        out.append([(name, events[idx]) for name, idx in m])
        if pattern.after_match == "skip_to_next":
            min_start = m_start + 1
        elif pattern.after_match == "skip_past_last":
            min_start = m_end + 1
        elif pattern.after_match in ("skip_to_first", "skip_to_last"):
            bound = [idx for name, idx in m if name == pattern.skip_to_step]
            if bound:
                tgt = bound[0] if pattern.after_match == "skip_to_first" else bound[-1]
                # clamp: never move backwards (the reference throws on
                # would-not-advance; we keep same-start matches eligible)
                min_start = max(min_start, tgt)
    return out


def _longest_partial_from(
    events: list[dict], start: int, pattern: Pattern, ts_field: str
) -> list[tuple[str, int]]:
    """Longest incomplete prefix match anchored at events[start] — the
    partial match a timed-out NFA computation state would hold. Longest
    by bound-event count, earliest events on ties (DFS order); negative
    steps bind nothing and are skipped in partial reporting."""
    steps = pattern.steps
    n = len(events)
    deadline = events[start][ts_field] + pattern.within_ms
    best: list[tuple[str, int]] = []

    def rec(si, pos, taken, matched, bindings):
        nonlocal best
        if len(matched) > len(best):
            best = list(matched)
        if si == len(steps):
            return
        step = steps[si]
        if step.negated:
            rec(si + 1, pos, 0, matched, bindings)
            return
        if taken >= step.min_times:
            rec(si + 1, pos, 0, matched, bindings)
        if taken < step.max_times:
            contig = step.contiguity if taken == 0 else step.loop_contiguity
            p = pos
            while p < n:
                if events[p][ts_field] >= deadline:
                    return
                ev = events[p]
                if (
                    step.until is not None
                    and taken > 0
                    and step.until(ev, bindings)
                ):
                    return
                ok = step.predicate is None or step.predicate(ev, bindings)
                if ok:
                    matched.append((step.name, p))
                    bindings.setdefault(step.name, []).append(ev)
                    rec(si, p + 1, taken + 1, matched, bindings)
                    bindings[step.name].pop()
                    if not bindings[step.name]:
                        del bindings[step.name]
                    matched.pop()
                    if contig != ANY:
                        return
                    p += 1
                else:
                    if contig == STRICT or (si == 0 and taken == 0):
                        return
                    p += 1

    rec(0, start, 0, [], {})
    return best


def find_matches_and_timeouts(
    events: list[dict], pattern: Pattern, ts_field: str
) -> tuple[list[list[tuple[str, dict]]], list[list[tuple[str, dict]]]]:
    """find_matches plus the reference's timeout side output
    (CepOperator + TimedOutPartialMatchHandler.processTimedOutMatch):
    for every start anchor whose window has conclusively expired (the
    key's last event time is at-or-past the anchor's deadline) without a
    complete match, the longest partial match is emitted to the timeout
    channel. Requires within(); documented narrowing vs the reference:
    ONE (maximal) partial per anchor rather than one per surviving NFA
    branch."""
    matches = find_matches(events, pattern, ts_field)
    if pattern.within_ms is None or not events:
        return matches, []
    complete_anchors: set[int] = set()
    for i in range(len(events)):
        for _m in _enumerate_from(events, i, pattern, ts_field):
            complete_anchors.add(i)
            break
    last_ts = events[-1][ts_field]
    timeouts: list[list[tuple[str, dict]]] = []
    for i in range(len(events)):
        if i in complete_anchors:
            continue
        if last_ts < events[i][ts_field] + pattern.within_ms:
            continue  # window still open — the partial could yet complete
        partial = _longest_partial_from(events, i, pattern, ts_field)
        if partial and partial[0][1] == i:
            timeouts.append([(name, events[idx]) for name, idx in partial])
    return matches, timeouts


def pattern_match(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Batch CEP over a keyed DataFrame (CepOperator.java:82 analogue).

    Output: one row per matched event —
    (key, match_id, step, ts_ms, <payload_cols as strings>).
    match_id numbers matches per key in match order.
    """
    schema = ", ".join(
        [f"{key} long", "match_id long", "step string", "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *order_cols])
        key_val = pdf[key].iloc[0]
        # normalize to ns first: under pandas 2 / Arrow the column may be
        # datetime64[us], where a bare astype('int64') would yield micros
        # and silently corrupt within() windows.
        ts_ms = (
            pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000
        ).tolist()
        events = []
        for i, row in enumerate(pdf[payload_cols].itertuples(index=False)):
            d = dict(zip(payload_cols, row))
            d["__key"] = key_val
            d["__ts_ms"] = int(ts_ms[i])
            events.append(d)
        matches = find_matches(events, pattern, "__ts_ms")
        rows = []
        for mid, m in enumerate(matches):
            for step_name, ev in m:
                rows.append(
                    [ev["__key"], mid, step_name, ev["__ts_ms"]]
                    + [str(ev[c]) for c in payload_cols]
                )
        cols = [key, "match_id", "step", "ts_ms"] + payload_cols
        return pd.DataFrame(rows, columns=cols)

    return df.groupBy(key).applyInPandas(per_key, schema=schema)


def pattern_match_with_timeouts(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """pattern_match plus the timed-out-partial side output
    (PatternStream.select(timeoutTag, ...) surface): rows carry a
    ``kind`` column — 'match' for completed matches, 'timeout' for the
    maximal partial of every expired start anchor. match_id numbers the
    two channels independently, in the reference's tag-separated style.
    """
    schema = ", ".join(
        [f"{key} long", "kind string", "match_id long", "step string",
         "ts_ms long"]
        + [f"{c} string" for c in payload_cols]
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *order_cols])
        key_val = pdf[key].iloc[0]
        ts_ms = (
            pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000
        ).tolist()
        events = []
        for i, row in enumerate(pdf[payload_cols].itertuples(index=False)):
            d = dict(zip(payload_cols, row))
            d["__key"] = key_val
            d["__ts_ms"] = int(ts_ms[i])
            events.append(d)
        matches, timeouts = find_matches_and_timeouts(
            events, pattern, "__ts_ms"
        )
        rows = []
        for kind, mlist in (("match", matches), ("timeout", timeouts)):
            for mid, m in enumerate(mlist):
                for step_name, ev2 in m:
                    rows.append(
                        [ev2["__key"], kind, mid, step_name, ev2["__ts_ms"]]
                        + [str(ev2[c]) for c in payload_cols]
                    )
        cols = [key, "kind", "match_id", "step", "ts_ms"] + payload_cols
        return pd.DataFrame(rows, columns=cols)

    return df.groupBy(key).applyInPandas(per_key, schema=schema)
