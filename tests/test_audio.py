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
    """PAYLOADS never shuffle: the only exchange in the plan is the
    round-robin fan-out of the skinny doc_id relation, and it sits BELOW
    both Arrow kernels (plans print top-down, so the kernels' string
    offsets come first).  The synthesized binary column itself flows
    kernel→kernel within each task."""
    from national_caseload_data_ingest_spark.operators.audio import (
        audio_spectrogram_stats,
    )

    df = audio_spectrogram_stats(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "roundrobinpartitioning" in plan.lower()
    assert plan.index("MapInPandas") < plan.index("Exchange")
    assert df.count() > 0


# ------------------------------------------------------- telephony codecs


def test_g711_decode_known_extremes():
    """Spec anchors: the loudest mu-law code decodes to +-32124, A-law to
    +-32256, and both quiet codes decode near zero."""
    import numpy as np

    from national_caseload_data_ingest_spark.operators.audio import (
        alaw_decode,
        ulaw_decode,
    )

    u = ulaw_decode(np.arange(256))
    a = alaw_decode(np.arange(256))
    assert int(u.max()) == 32124 and int(u.min()) == -32124
    assert int(a.max()) == 32256 and int(a.min()) == -32256
    # code 0xFF is mu-law positive zero; 0xD5 is A-law +8 (quietest)
    assert int(ulaw_decode([0xFF])[0]) == 0
    assert int(alaw_decode([0xD5])[0]) == 8


def test_g711_reencode_is_canonical():
    """encode(decode(c)) == c for every A-law code and all mu-law codes
    except the +-0 pair (0x7F/0xFF both decode to 0 — the spec's known
    collision)."""
    import numpy as np

    from national_caseload_data_ingest_spark.operators.audio import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    assert (alaw_encode(alaw_decode(codes)) == codes).all()
    ru = ulaw_encode(ulaw_decode(codes))
    mismatch = np.nonzero(ru != codes)[0]
    assert list(mismatch) == [0x7F]
    assert int(ulaw_decode([0x7F])[0]) == 0  # decodes identically to 0xFF


def test_g711_encode_quantization_error_bounded():
    """Expansion of the compressed code must land within the segment's
    step of the original (logarithmic companding error bound)."""
    import numpy as np

    from national_caseload_data_ingest_spark.operators.audio import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    rng = np.random.default_rng(5)
    s = rng.integers(-32000, 32000, 4000).astype(np.int16)
    for enc, dec, limit in (
        (ulaw_encode, ulaw_decode, 1024),  # top mu-law segment step
        (alaw_encode, alaw_decode, 1024),
    ):
        err = np.abs(dec(enc(s)).astype(np.int64) - s)
        assert int(err.max()) <= limit


def test_ima_adpcm_tables_and_roundtrip():
    import numpy as np

    from national_caseload_data_ingest_spark.operators.audio import (
        IMA_STEP_TABLE,
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[-1] == 32767
    assert all(a < b for a, b in zip(IMA_STEP_TABLE, IMA_STEP_TABLE[1:]))
    t = np.arange(512)
    sig = (8000 * np.sin(2 * np.pi * t / 37)).astype(np.int16)
    dec = ima_adpcm_decode(ima_adpcm_encode(sig))
    err = dec.astype(float) - sig.astype(float)
    snr = 10 * np.log10((sig.astype(float) ** 2).mean() / (err**2).mean())
    assert snr > 15.0, snr  # reference IMA quality on a mid-level sine


def test_ima_adpcm_decoder_clamps():
    """A run of maximal-magnitude nibbles must clamp at int16 extremes,
    never wrap."""
    from national_caseload_data_ingest_spark.operators.audio import (
        ima_adpcm_decode,
    )

    up = ima_adpcm_decode([7] * 200)
    down = ima_adpcm_decode([15] * 200)
    assert int(up.max()) == 32767 and int(up.min()) >= 0
    assert int(down.min()) == -32768


def test_g711_and_adpcm_queries(spark):
    from national_caseload_data_ingest_spark.operators.audio import (
        adpcm_audio_features,
        g711_audio_features,
    )

    g = g711_audio_features(spark, "/root/testdata/sf0.001").collect()
    assert g and all(r["n_samples"] == 256 for r in g)
    a = adpcm_audio_features(spark, "/root/testdata/sf0.001").collect()
    assert a and all(r["n_samples"] == 64 for r in a)
