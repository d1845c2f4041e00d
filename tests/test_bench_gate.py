"""Bench quiet-gate invariants (VERDICT r10 item 2).

Pure gate-logic tests: ``_load_avg`` and ``time.sleep`` are
monkeypatched, no Spark session and no calibration burst runs.
"""

from __future__ import annotations

import bench


def _run_gate(monkeypatch, readings):
    it = iter(readings)
    monkeypatch.setattr(bench, "_load_avg", lambda: next(it))
    sleeps: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    return bench._wait_for_quiet(), sleeps


def test_quiet_gate_needs_two_consecutive_decaying_polls(monkeypatch):
    """1m spike, then 5m above threshold, then two clean decaying polls:
    the gate must exit on the SECOND consecutive quiet reading (a single
    threshold snapshot passed during residual-load decay is exactly the
    r10 early-window contamination the gate now rejects)."""
    out, sleeps = _run_gate(
        monkeypatch,
        [
            (0.9, 0.2),    # 1m over QUIET_LOAD
            (0.2, 0.95),   # 5m over QUIET_LOAD_5M (0.7) — the r10 hole
            (0.05, 0.4),   # quiet #1 — must still wait to confirm
            (0.02, 0.3),   # quiet #2 — exit
        ],
    )
    assert out == (0.02, 0.3)
    assert len(sleeps) == 3  # two rejected polls + one confirmation wait


def test_quiet_gate_rejects_fresh_spike_and_resets_streak(monkeypatch):
    """A 1m reading above the 5m average (+tolerance) is a fresh spike:
    it must not count as quiet even under both thresholds, and it must
    reset a previously-started confirmation streak."""
    out, sleeps = _run_gate(
        monkeypatch,
        [
            (0.05, 0.4),   # quiet #1
            (0.25, 0.05),  # under both thresholds but 1m >> 5m: spike, reset
            (0.04, 0.2),   # quiet #1 again
            (0.03, 0.15),  # quiet #2 — exit
        ],
    )
    assert out == (0.03, 0.15)
    assert len(sleeps) == 3


def test_quiet_gate_idle_jitter_within_tolerance(monkeypatch):
    """At true idle the 1m can blip 0.03-0.05 over a 0.00 5m — inside
    QUIET_TREND_TOL, so a genuinely idle machine clears in the minimum
    two polls."""
    out, sleeps = _run_gate(monkeypatch, [(0.04, 0.0), (0.0, 0.0)])
    assert out == (0.0, 0.0)
    assert len(sleeps) == 1  # just the confirmation wait


def test_quiet_gate_bounded_when_never_quiet(monkeypatch):
    """A permanently-busy host exhausts QUIET_RETRIES and still returns
    the final reading so the artifact records the contaminated start."""
    monkeypatch.setattr(bench, "QUIET_RETRIES", 3)
    out, sleeps = _run_gate(monkeypatch, [(5.0, 5.0)] * 4)
    assert out == (5.0, 5.0)
    assert len(sleeps) == 3
