"""Bench contamination gate (bench.py): the committed BENCH artifact
must never be a run the host degraded mid-flight.  Two rounds running
the round record was contaminated (r7: sentinel 0.49 s -> 2.50 s,
47 spread retries) while the clean run lived only in PERF.md prose —
the gate makes that artifact impossible to emit.

These tests are Spark-free: the verdict is a pure function, and the
refusal path is exercised by driving main() with stubbed measurement
passes.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

_BENCH = Path(__file__).resolve().parent.parent / "bench.py"


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clean_run_passes(bench):
    bad, ratio = bench.contamination_verdict(0.49, 0.52, 3)
    assert not bad
    assert ratio == pytest.approx(1.061, abs=1e-3)


def test_sentinel_degradation_trips_gate(bench):
    # the exact committed-r7 signature: 0.4882 -> 2.5006, 47 retries
    bad, ratio = bench.contamination_verdict(0.4882, 2.5006, 47)
    assert bad
    assert ratio > bench.MAX_SENTINEL_RATIO


def test_sentinel_ratio_alone_trips_gate(bench):
    bad, _ = bench.contamination_verdict(0.50, 0.70, 0)
    assert bad  # 1.4 > 1.3 even with zero retries


def test_retry_count_alone_trips_gate(bench):
    bad, ratio = bench.contamination_verdict(0.50, 0.50, 16)
    assert bad
    assert ratio == 1.0  # sentinel clean; retries are the tripwire


def test_boundary_values_pass(bench):
    bad, _ = bench.contamination_verdict(
        0.50, 0.50 * bench.MAX_SENTINEL_RATIO, bench.MAX_SPREAD_RETRIES
    )
    assert not bad  # <= is clean on both axes


def test_zero_sentinel_is_contaminated(bench):
    bad, ratio = bench.contamination_verdict(0.0, 0.5, 0)
    assert bad and ratio == float("inf")


def _run_main_with_stub(bench, monkeypatch, passes, force_emit=False):
    """Drive main() with _measure_once stubbed to return canned
    sentinel pairs; returns (exit_code, emitted payloads)."""
    emitted = []
    calls = {"n": 0}

    class _FakeSpark:
        def stop(self):
            pass

    def fake_measure(spark, sf_dir, sf, load_start):
        s0, s1, retries = passes[min(calls["n"], len(passes) - 1)]
        calls["n"] += 1
        return (
            {
                "queries": {"q": 1.0},
                "sentinel_start_sec": s0,
                "sentinel_end_sec": s1,
                "queries_retried_for_spread": retries,
                # the gate reads the UNRESOLVED count (r11); the stub
                # treats every canned retry as unresolved
                "queries_retry_unresolved": retries,
            },
            {},
        )

    monkeypatch.setattr(bench, "_measure_once", fake_measure)
    monkeypatch.setattr(bench, "get_spark", lambda **kw: _FakeSpark())
    monkeypatch.setattr(bench, "_wait_for_idle", lambda *a: 0.1)
    monkeypatch.setattr(
        bench, "_emit", lambda full, extras, timings: emitted.append(full)
    )
    if force_emit:
        monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE_EMIT", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE_EMIT", raising=False)
    code = 0
    try:
        bench.main()
    except SystemExit as e:
        code = e.code
    return code, emitted, calls["n"]


def test_main_emits_clean_first_pass(bench, monkeypatch):
    code, emitted, n = _run_main_with_stub(
        bench, monkeypatch, [(0.5, 0.52, 2)]
    )
    assert code == 0 and len(emitted) == 1 and n == 1
    assert emitted[0]["sentinel_ratio"] == pytest.approx(1.04)
    assert "contaminated" not in emitted[0]


def test_main_retries_once_then_emits_clean(bench, monkeypatch):
    code, emitted, n = _run_main_with_stub(
        bench,
        monkeypatch,
        [(0.49, 2.50, 47), (0.50, 0.51, 1)],
    )
    assert code == 0 and len(emitted) == 1 and n == 2
    assert emitted[0]["sentinel_ratio"] == pytest.approx(1.02)


def test_main_refuses_after_two_contaminated_passes(bench, monkeypatch):
    code, emitted, n = _run_main_with_stub(
        bench,
        monkeypatch,
        [(0.49, 2.50, 47), (0.48, 1.90, 22)],
    )
    assert code == 2  # hard refusal: no artifact line at all
    assert emitted == [] and n == 2


def test_probe_summary_median_and_spread(bench):
    """Rate keys become <key>_med3 + <key>_spread (median, not min:
    a real mid-run degradation must move the number); deterministic
    descriptors pass through; descriptors that vary across reps are
    dropped from the artifact (they're noise, detail-file only)."""
    reps = [
        {"stream_ingest_docs_per_sec": 900.0, "stream_ingest_wave_docs": 4000,
         "stream_ingest_accept_frac": 0.81, "stream_wall_sec": 9.1},
        {"stream_ingest_docs_per_sec": 1100.0, "stream_ingest_wave_docs": 4000,
         "stream_ingest_accept_frac": 0.81, "stream_wall_sec": 7.7},
        {"stream_ingest_docs_per_sec": 1000.0, "stream_ingest_wave_docs": 4000,
         "stream_ingest_accept_frac": 0.81, "stream_wall_sec": 8.3},
    ]
    out = bench.summarize_probe_reps(reps)
    assert out["stream_ingest_docs_per_sec_med3"] == 1000.0
    assert out["stream_ingest_docs_per_sec_spread"] == pytest.approx(0.2)
    assert out["stream_ingest_wave_docs"] == 4000
    assert out["stream_ingest_accept_frac"] == 0.81
    assert "stream_wall_sec" not in out  # varies and isn't a rate key
    assert "stream_ingest_docs_per_sec" not in out  # renamed to _med3


def test_probe_summary_even_reps_and_seconds_precision(bench):
    # median of an even rep count interpolates; *_sec keys keep 3 dp;
    # the suffix carries the ACTUAL rep count (ADVICE r10 #3: a
    # reps=5 override must not emit keys claiming 3 samples)
    reps = [{"stream_recovery_sec": 4.1}, {"stream_recovery_sec": 4.9}]
    out = bench.summarize_probe_reps(reps)
    assert out["stream_recovery_sec_med2"] == pytest.approx(4.5)
    assert out["stream_recovery_sec_spread"] == pytest.approx(0.178)


def test_probe_summary_tolerates_missing_keys(bench):
    """A key a later rep omits (a probe that conditionally reports a
    diagnostic) must not crash the whole bench (ADVICE r10 #3): rate
    keys summarize over the reps that have them; descriptors missing
    from any rep are dropped."""
    reps = [
        {"stream_ingest_docs_per_sec": 900.0, "stream_ingest_wave_docs": 4000},
        {"stream_ingest_docs_per_sec": 1000.0},
        {"stream_ingest_docs_per_sec": 1100.0},
    ]
    out = bench.summarize_probe_reps(reps)
    assert out["stream_ingest_docs_per_sec_med3"] == 1000.0
    assert "stream_ingest_wave_docs" not in out


def test_probe_summary_suffix_counts_actual_samples(bench):
    """A rate key only SOME reps report carries the true sample count
    in its suffix (a 1-of-3 diagnostic must say _med1, never _med3
    with a perfect spread), and a key absent from rep 0 still reaches
    the summary (keys are unioned across reps)."""
    reps = [
        {"stream_ingest_docs_per_sec": 900.0},
        {
            "stream_ingest_docs_per_sec": 1000.0,
            "stream_recovery_sec": 4.5,  # rate key, rep 1 only
        },
        {"stream_ingest_docs_per_sec": 1100.0},
    ]
    out = bench.summarize_probe_reps(reps)
    assert out["stream_ingest_docs_per_sec_med3"] == 1000.0
    assert out["stream_recovery_sec_med1"] == pytest.approx(4.5)
    assert out["stream_recovery_sec_spread"] == 0.0
    assert "stream_recovery_sec_med3" not in out


def test_spread_unresolved_blip_absorbed(bench):
    """One slow outlier among otherwise-agreeing samples: the retry
    RESOLVED (the fastest N cluster agrees), so it must not count
    toward the contamination gate."""
    # runs=3, one blip at 2.1s, retry landed 1.02 — best 3 agree
    assert not bench.spread_unresolved([1.0, 2.1, 1.05, 1.02], 3)


def test_spread_unresolved_still_noisy(bench):
    # even the fastest 3 of 4 disagree >25% and >0.2s
    assert bench.spread_unresolved([1.0, 1.9, 1.6, 2.2], 3)


def test_spread_unresolved_subsecond_floor(bench):
    # sub-second scheduling noise: relative spread is high but the
    # 0.2s absolute floor keeps it out of the gate
    assert not bench.spread_unresolved([0.3, 0.45, 0.42, 0.31], 3)


def test_main_force_emit_stamps_contaminated(bench, monkeypatch):
    code, emitted, n = _run_main_with_stub(
        bench,
        monkeypatch,
        [(0.49, 2.50, 47), (0.48, 1.90, 22)],
        force_emit=True,
    )
    assert code == 0 and len(emitted) == 1
    assert emitted[0]["contaminated"] is True
