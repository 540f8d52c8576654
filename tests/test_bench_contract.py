"""Driver-bench contract (VERDICT r5 #8): the real-TPC-DS component
must be present in every BENCH_r{N}.json — it silently vanished in r5
when benchdata was cleaned mid-round. These tests pin (a) the corpus
regeneration path and (b) the component itself producing a ratio on
the fact-volume corpus."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tpcds_real_component_contract():
    bench = _load_bench()
    # the driver contract: >= 6 representative verbatim texts per round
    assert len(bench.TPCDS_REAL_QIDS) >= 6
    # main() must wire the component into the emitted JSON (string-level
    # pin — cheaper than running the full bench here)
    src = open(os.path.join(REPO, "bench.py")).read()
    assert '"tpcds_real": tpcds_real' in src


def test_missing_corpus_triggers_regeneration(tmp_path, monkeypatch):
    bench = _load_bench()
    calls = []
    import flink_spark.tpcds_data as TD

    monkeypatch.setattr(TD, "generate", lambda d, fact_scale: calls.append((d, fact_scale)))
    bench._ensure_tpcds_sf1(str(tmp_path / "nope"))
    assert calls and calls[0][1] == 15

    # a stale manifest (wrong fact scale) also regenerates
    stale = tmp_path / "stale"
    stale.mkdir()
    (stale / "_MANIFEST").write_text("tpcds@1")
    bench._ensure_tpcds_sf1(str(stale))
    assert len(calls) == 2


def test_tpcds_real_component_runs_end_to_end(spark):
    """One query, one timed run, against the real corpus — asserts the
    component emits the block shape the driver records."""
    bench = _load_bench()
    out = bench._tpcds_real_bench(spark, qids=["3"], runs=1)
    assert out is not None, "component must not skip when the corpus exists"
    assert out["queries"]["q3"] > 0
    assert out["oracle_s"]["q3"] > 0
    assert out["ratio"] > 0
