"""Per-source idleness/alignment ITCases (WatermarkStrategy.java:147,168).

Pure-python contract tests plus a micro-batch windowing simulation:
an idle source must stop holding back the combined watermark, and an
aligned fast source must have its too-far-ahead rows deferred."""

from __future__ import annotations

from flink_spark.streaming.watermark_group import (
    WatermarkGroup,
    split_aligned,
)


def test_combined_is_min_over_active_sources():
    g = WatermarkGroup(["a", "b"], delay_ms=100)
    wm = g.advance({"a": 1_000, "b": 5_000})
    assert wm == 900  # min(1000-100, 5000-100)


def test_idle_source_stops_holding_back_watermark():
    g = WatermarkGroup(["a", "b"], delay_ms=0, idle_batches=2)
    assert g.advance({"a": 1_000, "b": 10_000}) == 1_000
    # a stalls: for two batches it still holds the min (not yet idle)
    assert g.advance({"b": 11_000}) == 1_000
    assert g.advance({"b": 12_000}) == 12_000  # a idle -> excluded
    assert g.idle_sources() == ["a"]


def test_reactivated_source_resumes_and_never_regresses():
    g = WatermarkGroup(["a", "b"], idle_batches=1)
    g.advance({"a": 1_000, "b": 9_000})
    g.advance({"b": 10_000})  # a idle after 1 unseen batch
    assert g.combined == 10_000
    # a comes back with OLD events: active again, but the combined
    # watermark is monotonic (output-valve contract)
    assert g.advance({"a": 2_000, "b": 11_000}) == 10_000
    # once a catches up past the high-water mark, min rules again
    assert g.advance({"a": 12_000, "b": 13_000}) == 12_000


def test_all_idle_holds_watermark():
    g = WatermarkGroup(["a", "b"], idle_batches=1)
    g.advance({"a": 5_000, "b": 6_000})
    assert g.advance({}) == 5_000
    assert g.advance({}) == 5_000
    assert set(g.idle_sources()) == {"a", "b"}


def test_per_source_delay_dict():
    g = WatermarkGroup(["a", "b"], delay_ms={"a": 1_000, "b": 0})
    assert g.advance({"a": 10_000, "b": 9_500}) == 9_000


def test_alignment_defers_far_ahead_rows():
    g = WatermarkGroup(["slow", "fast"], delay_ms=0)
    g.advance({"slow": 1_000, "fast": 50_000})  # combined = 1000
    rows = [
        {"src": "fast", "ts": 1_500},
        {"src": "fast", "ts": 70_000},
        {"src": "slow", "ts": 1_200},
    ]
    now, deferred = split_aligned(rows, "ts", g, max_drift_ms=2_000)
    assert [r["ts"] for r in now] == [1_500, 1_200]  # within frontier 3000
    assert [r["ts"] for r in deferred] == [70_000]
    # next batch: slow catches up, frontier moves, deferred row drains
    g.advance({"slow": 69_000, "fast": 70_000})
    now2, deferred2 = split_aligned(deferred, "ts", g, max_drift_ms=2_000)
    assert [r["ts"] for r in now2] == [70_000]
    assert deferred2 == []


def test_windowed_agg_equivalence_with_idle_source():
    """Micro-batch simulation: tumbling 10s counts over a union of two
    sources where source b dies mid-stream. With idleness, every window
    of a's data closes; the final counts equal a batch pass over all
    delivered rows (stream ≡ batch)."""
    g = WatermarkGroup(["a", "b"], delay_ms=0, idle_batches=2)
    batches = [
        {"a": [1_000, 4_000], "b": [2_000]},
        {"a": [12_000]},          # b silent
        {"a": [23_000]},          # b silent -> idle
        {"a": [35_000]},
        {"a": [47_000]},          # advances wm past every window below
    ]
    delivered: list[int] = []
    emitted: dict[int, int] = {}
    pending: list[int] = []
    for batch in batches:
        for src, ts_list in batch.items():
            delivered.extend(ts_list)
            pending.extend(ts_list)
        wm = g.advance(
            {src: max(ts) for src, ts in batch.items() if ts}
        )
        # close windows whose end <= wm
        still = []
        for ts in pending:
            win = ts // 10_000
            if (win + 1) * 10_000 <= wm:
                emitted[win] = emitted.get(win, 0) + 1
            else:
                still.append(ts)
        pending = still
    batch_counts: dict[int, int] = {}
    for ts in delivered:
        if (ts // 10_000 + 1) * 10_000 <= g.combined:
            win = ts // 10_000
            batch_counts[win] = batch_counts.get(win, 0) + 1
    assert emitted == batch_counts
    assert emitted  # the idle exclusion actually closed windows
