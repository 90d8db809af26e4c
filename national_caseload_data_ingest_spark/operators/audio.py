"""Audio feature-extraction operators over WAV payload columns:
time-domain autocorrelation/pitch features (exact-arithmetic oracle) and
frequency-domain spectral statistics (FFT, ground-truth-tested).

The audio analysis pass of a multimodal training pipeline: decode PCM,
compute per-clip descriptors (periodicity, pitch period, zero-crossing
rate, spectral centroid/flatness/band energies), and keep them as narrow
typed columns next to the opaque payload.  Spark-side shape follows the
multimodal module's convention: payloads are synthesized and decoded
inside Arrow ``mapInPandas`` kernels — 1:1 row batches, no shuffle, the
binary never leaves the executor — so the pass scales as an
embarrassingly-parallel scan at any corpus size.

Two operators, two verification strengths:

* ``audio_autocorr_features`` uses only INTEGER-exact quantities (int64
  lag dot-products, sign-change counts) plus single divisions of exact
  integers, so a DuckDB oracle recomputes it bit-for-bit from the
  closed-form sample series (same technique as ``wav_decode_features``,
  multimodal.py).  The pitch period is an argmax over exact int64
  autocorrelations — deterministic, ties to the smaller lag.
* ``audio_spectrogram_stats`` needs a real FFT; transcendental libm
  differences make a cross-engine hash unreliable, so it is registered
  rows-only and pinned by a pytest against an independent O(n²) direct
  DFT reference (the PNG/JPEG codec convention).

The reference (/root/reference/ncd/) has no audio surface; this extends
the build brief's multimodal band.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from national_caseload_data_ingest_spark.operators.multimodal import (
    AUDIO_N_SAMPLES,
    AUDIO_RATE,
    _synthesize_wav_payloads,
    wav_decode,
)
from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

# Autocorrelation lags: report r(1..4)/r(0); pitch = argmax r(l) over
# PITCH_MIN..PITCH_MAX.  Keep literals in sync with the oracle SQL.
AC_LAGS = 4
PITCH_MIN = 2
PITCH_MAX = 32

AUTOCORR_SCHEMA = (
    "doc_id bigint, zero_crossings bigint, "
    + ", ".join(f"ac{i} double" for i in range(1, AC_LAGS + 1))
    + ", pitch_lag bigint, periodicity double"
)


def autocorr_features_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """WAV payload → integer-exact time-domain features.

    All dot products run in int64 (256 · 32768² ≈ 2.7e11 ≪ 2⁶³); the
    only doubles are single divisions of those exact integers, which any
    engine reproduces identically.
    """
    import numpy as np  # noqa: PLC0415

    for pdf in batches:
        out: dict[str, list] = {
            k: []
            for k in ["doc_id", "zero_crossings"]
            + [f"ac{i}" for i in range(1, AC_LAGS + 1)]
            + ["pitch_lag", "periodicity"]
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _, _, s2 = wav_decode(bytes(payload))
            s = s2.astype(np.int64).ravel()
            out["doc_id"].append(int(doc_id))
            neg = s < 0
            out["zero_crossings"].append(int((neg[1:] != neg[:-1]).sum()))
            r0 = int(np.dot(s, s))
            for lag in range(1, AC_LAGS + 1):
                out[f"ac{lag}"].append(float(int(np.dot(s[:-lag], s[lag:])) / r0))
            best_lag, best_r = PITCH_MIN, None
            for lag in range(PITCH_MIN, PITCH_MAX + 1):
                r = int(np.dot(s[:-lag], s[lag:]))
                if best_r is None or r > best_r:
                    best_lag, best_r = lag, r
            out["pitch_lag"].append(best_lag)
            out["periodicity"].append(float(best_r / r0))
        yield pd.DataFrame(out)


# Closed-form sample series (matches _synthesize_wav_payloads):
#   s(k) = (doc_id*7 + k*13) % 65536 - 32768
_S = "((d.doc_id*7 + {k}*13) % 65536 - 32768)"

_AC_COLS = ",\n           ".join(
    f"""CAST((SELECT SUM({_S.format(k='t.k')} * {_S.format(k=f'(t.k + {lag})')})
                 FROM range(0, {AUDIO_N_SAMPLES} - {lag}) t(k))
                AS DOUBLE)
           / (SELECT SUM({_S.format(k='t.k')} * {_S.format(k='t.k')})
              FROM range(0, {AUDIO_N_SAMPLES}) t(k)) AS ac{lag}"""
    for lag in range(1, AC_LAGS + 1)
)

_AUTOCORR_ORACLE = f"""
WITH lagged AS (
    SELECT d.doc_id, l.lag,
           SUM({_S.format(k='t.k')} * {_S.format(k='(t.k + l.lag)')}) AS r
    FROM documents d,
         range({PITCH_MIN}, {PITCH_MAX} + 1) l(lag),
         range(0, {AUDIO_N_SAMPLES}) t(k)
    WHERE t.k + l.lag < {AUDIO_N_SAMPLES}
    GROUP BY d.doc_id, l.lag
),
pitch AS (
    SELECT doc_id, lag AS pitch_lag, r,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY r DESC, lag ASC) AS rk
    FROM lagged
)
SELECT d.doc_id,
       (SELECT COUNT(*) FROM range(1, {AUDIO_N_SAMPLES}) t(k)
        WHERE ({_S.format(k='t.k')} < 0)
              <> ({_S.format(k='(t.k - 1)')} < 0)) AS zero_crossings,
       {_AC_COLS},
       CAST(p.pitch_lag AS BIGINT) AS pitch_lag,
       CAST(p.r AS DOUBLE)
       / (SELECT SUM({_S.format(k='t.k')} * {_S.format(k='t.k')})
          FROM range(0, {AUDIO_N_SAMPLES}) t(k)) AS periodicity
FROM documents d JOIN pitch p ON d.doc_id = p.doc_id AND p.rk = 1
"""


@query("audio_autocorr_features", oracle=_AUTOCORR_ORACLE)
def audio_autocorr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-domain audio descriptors per document — zero-crossing count,
    normalized autocorrelation at lags 1–4, and the dominant pitch period
    (argmax autocorrelation over lags 2–32) — decoded through the real
    WAV path and verified bit-for-bit by an integer-arithmetic SQL
    oracle.  Two narrow ``mapInPandas`` passes, no shuffle."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    payloads = d.select("doc_id").mapInPandas(
        _synthesize_wav_payloads, schema="doc_id bigint, payload binary"
    )
    return payloads.mapInPandas(
        autocorr_features_kernel, schema=AUTOCORR_SCHEMA
    )


# -- frequency domain ----------------------------------------------------

SPECTRO_SCHEMA = (
    "doc_id bigint, n_bins int, dominant_bin bigint, dominant_hz double, "
    "spectral_centroid double, spectral_flatness double, "
    "low_frac double, mid_frac double, high_frac double"
)

# Band split points as bin indices over the positive-frequency bins
# (1..N/2): thirds of the Nyquist range.
_BANDS = (AUDIO_N_SAMPLES // 6, AUDIO_N_SAMPLES // 3)


def spectrogram_stats_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """WAV payload → rFFT power-spectrum descriptors (DC excluded):
    dominant bin/frequency, power-weighted centroid (in Hz), spectral
    flatness (geometric/arithmetic mean), and low/mid/high band energy
    fractions."""
    import numpy as np  # noqa: PLC0415

    for pdf in batches:
        out: dict[str, list] = {
            k: []
            for k in (
                "doc_id n_bins dominant_bin dominant_hz spectral_centroid "
                "spectral_flatness low_frac mid_frac high_frac"
            ).split()
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, _, s2 = wav_decode(bytes(payload))
            s = s2.astype(np.float64).ravel()
            power = np.abs(np.fft.rfft(s)[1:]) ** 2  # drop DC
            n_bins = len(power)
            bins = np.arange(1, n_bins + 1, dtype=np.float64)
            total = float(power.sum())
            dom = int(np.argmax(power)) + 1
            hz_per_bin = rate / len(s)
            out["doc_id"].append(int(doc_id))
            out["n_bins"].append(n_bins)
            out["dominant_bin"].append(dom)
            out["dominant_hz"].append(dom * hz_per_bin)
            out["spectral_centroid"].append(
                float((bins * power).sum() / total) * hz_per_bin
            )
            out["spectral_flatness"].append(
                float(np.exp(np.mean(np.log(power + 1e-12))) / (total / n_bins))
            )
            lo, mid = _BANDS
            out["low_frac"].append(float(power[:lo].sum() / total))
            out["mid_frac"].append(float(power[lo:mid].sum() / total))
            out["high_frac"].append(float(power[mid:].sum() / total))
        pdf_out = pd.DataFrame(out)
        pdf_out["n_bins"] = pdf_out["n_bins"].astype("int32")
        yield pdf_out


@query("audio_spectrogram_stats", oracle=None)
def audio_spectrogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio descriptors per document via numpy rFFT —
    rows-only at the driver (transcendental libm differences defeat a
    cross-engine hash); pinned by a pytest against an independent O(n²)
    direct-DFT reference (`tests/test_audio.py`)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    payloads = d.select("doc_id").mapInPandas(
        _synthesize_wav_payloads, schema="doc_id bigint, payload binary"
    )
    return payloads.mapInPandas(
        spectrogram_stats_kernel, schema=SPECTRO_SCHEMA
    )
