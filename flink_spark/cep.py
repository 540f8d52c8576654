"""CEP: complex event processing — Pattern API + NFA matcher.

Reference semantics (ported as *behavior*, not code):
- Pattern API: Pattern.begin/where/next/followedBy, quantifiers
  times/oneOrMore/optional, within
  (flink-libraries/flink-cep/.../pattern/Pattern.java:137-418)
- NFA matching (flink-libraries/flink-cep/.../nfa/NFA.java) with
  after-match skip strategies (nfa/aftermatch/):
  NO_SKIP (default) and SKIP_PAST_LAST_EVENT implemented.
- SQL MATCH_RECOGNIZE glue (StreamExecMatch.java:59) is a later
  front-end; the Pattern API is the contract (SURVEY §7 M5).

Contiguity model (matching Flink):
- next()        strict      — the very next event must match
- followed_by() relaxed     — non-matching events are skipped; the FIRST
                              matching event continues the match
  (followedByAny's all-combinations branching is not implemented.)
- quantifiers greedily consume consecutive matching events up to their
  max; relaxed skipping applies only while below the min quota. (Full
  relaxed-greedy backtracking, as in b+ c over b x b c, is a known
  simplification — the first non-match after the quota ends the step.)

Execution: per-key sequential scan over time-ordered events — the same
shape as Flink's keyed NFA state. On Spark the per-key work runs inside
applyInPandas; parallelism comes from the key partitioning, so the
operator scales with key cardinality (a single mega-key is the same
bottleneck it is in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Predicate = Callable[[dict, dict], bool]
"""(event_row, bindings_so_far) -> bool; bindings maps step name -> list of rows."""


@dataclass
class _Step:
    name: str
    predicate: Predicate | None = None
    strict: bool = False  # next() vs followedBy()
    min_times: int = 1
    max_times: int = 1


@dataclass
class Pattern:
    """Fluent pattern builder mirroring the reference's Pattern API."""

    steps: list[_Step] = field(default_factory=list)
    within_ms: int | None = None
    after_match: str = "no_skip"  # or "skip_past_last"

    @staticmethod
    def begin(name: str) -> "Pattern":
        p = Pattern()
        p.steps.append(_Step(name))
        return p

    def where(self, pred: Predicate) -> "Pattern":
        self.steps[-1].predicate = pred
        return self

    def next(self, name: str) -> "Pattern":
        self.steps.append(_Step(name, strict=True))
        return self

    def followed_by(self, name: str) -> "Pattern":
        self.steps.append(_Step(name, strict=False))
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

    def within(self, duration_ms: int) -> "Pattern":
        self.within_ms = duration_ms
        return self

    def after_match_skip_past_last(self) -> "Pattern":
        self.after_match = "skip_past_last"
        return self


def _match_from(
    events: list[dict], start: int, pattern: Pattern, ts_field: str
) -> list[tuple[str, int]] | None:
    """Try to build one match starting at events[start].

    Returns [(step_name, event_index), ...] or None. Deterministic
    single-continuation semantics (see module docstring).
    """
    bindings: dict[str, list[dict]] = {}
    matched: list[tuple[str, int]] = []
    pos = start
    deadline = (
        events[start][ts_field] + pattern.within_ms
        if pattern.within_ms is not None
        else None
    )

    for si, step in enumerate(pattern.steps):
        taken = 0
        while taken < step.max_times:
            if pos >= len(events):
                break
            ev = events[pos]
            if deadline is not None and ev[ts_field] > deadline:
                break
            ok = step.predicate is None or step.predicate(ev, bindings)
            if ok:
                matched.append((step.name, pos))
                bindings.setdefault(step.name, []).append(ev)
                pos += 1
                taken += 1
            elif step.strict or taken >= step.min_times:
                # strict: a non-matching next event kills the step;
                # relaxed with quota met: stop consuming, move on
                break
            else:
                if si == 0:
                    return None  # begin step anchors at `start`
                pos += 1  # relaxed: skip the non-matching event
        if taken < step.min_times:
            return None
    return matched


def find_matches(
    events: list[dict], pattern: Pattern, ts_field: str
) -> list[list[tuple[str, dict]]]:
    """Run the NFA over one key's time-ordered events."""
    out = []
    i = 0
    while i < len(events):
        m = _match_from(events, i, pattern, ts_field)
        if m:
            out.append([(name, events[idx]) for name, idx in m])
            if pattern.after_match == "skip_past_last":
                i = m[-1][1] + 1
                continue
        i += 1
    return out


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
        events = []
        for _, row in pdf.iterrows():
            d = {c: row[c] for c in payload_cols}
            d["__key"] = row[key]
            d["__ts_ms"] = int(pd.Timestamp(row[ts_col]).value // 1_000_000)
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
