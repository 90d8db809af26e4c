"""Ground-truth tests for the audio feature operators
(`operators/audio.py`): the FFT kernel against an independent O(n²)
direct DFT, and the autocorrelation kernel against pure-Python sums."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from national_caseload_data_ingest_spark.operators.audio import (
    _BANDS,
    AC_LAGS,
    PITCH_MAX,
    PITCH_MIN,
    autocorr_features_kernel,
    spectrogram_stats_kernel,
)
from national_caseload_data_ingest_spark.operators.multimodal import (
    AUDIO_RATE,
    wav_encode,
)


def _payload(samples: np.ndarray) -> bytes:
    return wav_encode(samples.astype(np.int16), AUDIO_RATE)


def _run_kernel(kernel, docs: dict[int, np.ndarray]) -> dict[int, dict]:
    pdf = pd.DataFrame(
        {
            "doc_id": list(docs),
            "payload": [_payload(s) for s in docs.values()],
        }
    )
    out = pd.concat(list(kernel(iter([pdf]))))
    return {int(r["doc_id"]): r for _, r in out.iterrows()}


def _naive_dft_power(s: np.ndarray) -> list[float]:
    """O(n²) direct DFT power spectrum, bins 1..n/2 — no numpy FFT."""
    n = len(s)
    out = []
    for b in range(1, n // 2 + 1):
        re = sum(s[k] * math.cos(-2 * math.pi * b * k / n) for k in range(n))
        im = sum(s[k] * math.sin(-2 * math.pi * b * k / n) for k in range(n))
        out.append(re * re + im * im)
    return out


def test_spectrogram_matches_naive_dft():
    rng = np.random.default_rng(7)
    docs = {
        # pure tone at bin 16 (+ small noise): dominant bin must be 16
        0: (
            8000 * np.sin(2 * np.pi * 16 * np.arange(256) / 256)
            + rng.integers(-50, 50, 256)
        ).astype(np.int16),
        1: rng.integers(-20000, 20000, 256).astype(np.int16),
    }
    got = _run_kernel(spectrogram_stats_kernel, docs)
    for doc_id, s in docs.items():
        power = _naive_dft_power(s.astype(np.float64))
        n_bins = len(power)
        total = sum(power)
        dom = max(range(n_bins), key=lambda i: power[i]) + 1
        centroid = (
            sum((i + 1) * p for i, p in enumerate(power)) / total
        ) * (AUDIO_RATE / 256)
        flat = math.exp(
            sum(math.log(p + 1e-12) for p in power) / n_bins
        ) / (total / n_bins)
        lo, mid = _BANDS
        r = got[doc_id]
        assert r["n_bins"] == n_bins
        assert r["dominant_bin"] == dom
        assert r["dominant_hz"] == pytest.approx(dom * AUDIO_RATE / 256, rel=1e-12)
        assert r["spectral_centroid"] == pytest.approx(centroid, rel=1e-9)
        assert r["spectral_flatness"] == pytest.approx(flat, rel=1e-9)
        assert r["low_frac"] == pytest.approx(sum(power[:lo]) / total, rel=1e-9)
        assert r["mid_frac"] == pytest.approx(
            sum(power[lo:mid]) / total, rel=1e-9
        )
        assert r["high_frac"] == pytest.approx(
            sum(power[mid:]) / total, rel=1e-9
        )
    assert got[0]["dominant_bin"] == 16


def test_autocorr_matches_pure_python():
    rng = np.random.default_rng(11)
    # strong period-8 sawtooth: pitch_lag must be 8 (or a multiple tie
    # broken to 8, the smallest)
    saw = np.tile(np.linspace(-30000, 30000, 8), 32).astype(np.int16)
    docs = {0: saw, 1: rng.integers(-30000, 30000, 256).astype(np.int16)}
    got = _run_kernel(autocorr_features_kernel, docs)
    for doc_id, arr in docs.items():
        s = [int(x) for x in arr]
        n = len(s)
        r0 = sum(x * x for x in s)
        zc = sum(1 for k in range(1, n) if (s[k] < 0) != (s[k - 1] < 0))
        r = got[doc_id]
        assert r["zero_crossings"] == zc
        for lag in range(1, AC_LAGS + 1):
            want = sum(s[k] * s[k + lag] for k in range(n - lag)) / r0
            assert r[f"ac{lag}"] == pytest.approx(want, rel=1e-12)
        rs = {
            lag: sum(s[k] * s[k + lag] for k in range(n - lag))
            for lag in range(PITCH_MIN, PITCH_MAX + 1)
        }
        best = max(sorted(rs), key=lambda l: (rs[l], -l))
        assert r["pitch_lag"] == best
        assert r["periodicity"] == pytest.approx(rs[best] / r0, rel=1e-12)
    assert got[0]["pitch_lag"] == 8


def test_spectrogram_spark_plan_is_narrow(spark):
    """The whole audio pass must be two chained mapInPandas with no
    exchange: payloads never shuffle."""
    from national_caseload_data_ingest_spark.operators.audio import (
        audio_spectrogram_stats,
    )

    df = audio_spectrogram_stats(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() > 0
