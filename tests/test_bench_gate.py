"""Whole-window steal gate in bench.py (VERDICT r13 finding #1).

The per-query clean test requires only ONE run below the steal
threshold, so uniform background steal — which inflates every sample
without any individual run looking anomalous against its neighbours —
could historically produce a polluted record with ``steal_dirty: []``
(the driver's r13 sheet ran at window steal_frac 0.0297 yet flagged
nothing).  ``window_dirtiness`` closes that hole: the artifact is dirty
whenever the WHOLE bench window's steal fraction exceeds the clean
threshold, regardless of per-query flags.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_uniform_steal_window_is_dirty():
    # Synthetic uniform-steal record: 3% of the whole window stolen —
    # the exact shape the r13 driver sheet showed with steal_dirty: [].
    window = {"steal_sec": 410.0, "busy_frac": 0.9, "steal_frac": 0.0297,
              "wall_sec": 430.0}
    dirty, reason = bench.window_dirtiness(window)
    assert dirty
    assert "0.0297" in reason


def test_quiet_window_is_clean():
    window = {"steal_sec": 0.4, "busy_frac": 0.85, "steal_frac": 0.0011,
              "wall_sec": 90.0}
    dirty, reason = bench.window_dirtiness(window)
    assert not dirty
    assert reason == ""


def test_boundary_is_inclusive_clean():
    # Exactly at the threshold counts as clean (gate is strictly >).
    dirty, _ = bench.window_dirtiness({"steal_frac": 0.005})
    assert not dirty
    dirty, _ = bench.window_dirtiness({"steal_frac": 0.0051})
    assert dirty


def test_missing_sample_is_dirty():
    # No /proc/stat (or a malformed window) must not silently pass as
    # clean — unmeasurable steal is treated as dirty.
    dirty, reason = bench.window_dirtiness(None)
    assert dirty and "unmeasurable" in reason
    dirty, reason = bench.window_dirtiness({})
    assert dirty and "steal_frac" in reason


def test_custom_threshold_respected():
    dirty, _ = bench.window_dirtiness({"steal_frac": 0.04}, clean_frac=0.05)
    assert not dirty
    dirty, _ = bench.window_dirtiness({"steal_frac": 0.06}, clean_frac=0.05)
    assert dirty


def test_committed_artifact_is_window_clean():
    # The canonical committed artifact must itself pass the gate it
    # introduced — a dirty BENCH_FULL.json should have been routed to
    # BENCH_FULL_DIRTY.json by bench.main().
    path = os.path.join(REPO, "BENCH_FULL.json")
    with open(path) as f:
        rec = json.load(f)
    window = rec["env"]["bench_window"]
    dirty, reason = bench.window_dirtiness(window)
    assert not dirty, reason
