"""FLAC subset codec (pure stdlib/numpy): bit IO, UTF-8 frame numbers,
CRC verification, fixed predictors, Rice partitions + escapes, all four
channel assignments, honest gates, and the oracle-checked query.
Format reference: the public FLAC specification (RFC 9639)."""

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.flac import (
    _crc8,
    _crc16,
    _MsbReader,
    _read_utf8_number,
    _utf8_number,
    flac_decode,
    flac_encode,
)

RNG = np.random.default_rng(21)


@pytest.mark.parametrize(
    "n", [0, 1, 127, 128, 300, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1]
)
def test_utf8_frame_number_roundtrip(n):
    assert _read_utf8_number(_MsbReader(_utf8_number(n))) == n


def test_crc_known_vectors():
    """CRC-8 poly 0x07 and CRC-16 poly 0x8005 standard check values."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS (init 0)


@pytest.mark.parametrize(
    "name,sig",
    [
        ("constant", np.full(1000, 123, np.int16)),
        ("ramp", (np.arange(5000) % 4000 - 2000).astype(np.int16)),
        ("noise", RNG.integers(-30000, 30000, 9000).astype(np.int16)),
        ("sine", (12000 * np.sin(np.arange(10000) / 17.0)).astype(np.int16)),
        ("tiny", np.array([5, -3, 7], np.int16)),
        ("alternating-extremes",
         np.where(np.arange(8192) % 2, 30000, -30000).astype(np.int16)),
        ("odd-tail", RNG.integers(-100, 100, 4097).astype(np.int16)),
        ("int16-extremes",
         np.array([-32768, 32767] * 300, np.int16)),
    ],
)
def test_mono_roundtrip(name, sig):
    rate, ch, out = flac_decode(flac_encode(sig, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], sig)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_roundtrip_all_channel_assignments(mode):
    st = np.stack(
        [
            (9000 * np.sin(np.arange(6000) / 23.0)).astype(np.int16),
            RNG.integers(-20000, 20000, 6000).astype(np.int16),
        ],
        axis=-1,
    )
    rate, ch, out = flac_decode(flac_encode(st, 44100, stereo_mode=mode))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, st)


def test_crc_corruption_detected():
    sig = RNG.integers(-1000, 1000, 500).astype(np.int16)
    payload = bytearray(flac_encode(sig))
    payload[-10] ^= 0x40  # flip a bit inside the last frame body
    with pytest.raises(ValueError, match="CRC"):
        flac_decode(bytes(payload))


@pytest.mark.parametrize("order", [1, 2, 4, 8, 12, 32])
def test_lpc_mono_roundtrip(order):
    t = np.arange(9000)
    sig = (
        8000 * np.sin(t / 23.0)
        + 4000 * np.sin(t / 7.1)
        + RNG.integers(-50, 50, 9000)
    ).astype(np.int16)
    rate, ch, out = flac_decode(flac_encode(sig, 8000, lpc_order=order))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], sig)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_lpc_stereo_roundtrip_all_channel_assignments(mode):
    t = np.arange(6000)
    left = (9000 * np.sin(t / 23.0)).astype(np.int16)
    st = np.stack([left, np.roll(left, 3)], axis=-1)
    rate, ch, out = flac_decode(
        flac_encode(st, 44100, stereo_mode=mode, lpc_order=8)
    )
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, st)


def test_lpc_roundtrip_on_noise_and_extremes():
    """LPC must stay bit-exact even on signals it predicts badly."""
    for sig in (
        RNG.integers(-32768, 32768, 5000).astype(np.int16),
        np.array([-32768, 32767] * 300, np.int16),
    ):
        _, _, out = flac_decode(flac_encode(sig, lpc_order=8))
        assert np.array_equal(out[:, 0], sig)


def test_lpc_subframes_actually_emitted():
    """Non-vacuity: the lpc_order stream must CONTAIN an LPC subframe
    (type >= 32) and the fixed stream must not — checked at the subframe
    level so a silent fall-back to FIXED can't pass the roundtrips."""
    from national_caseload_data_ingest_spark.operators.flac import (
        _encode_subframe,
        _MsbWriter,
    )

    t = np.arange(4096)
    sig = (6000 * np.sin(t / 19.0)).astype(np.int64)
    for lpc_order, expect_lpc in ((8, True), (None, False)):
        bw = _MsbWriter()
        _encode_subframe(bw, sig, 16, lpc_order)
        bw.align()
        br = _MsbReader(bw.bytes())
        assert br.read(1) == 0
        stype = br.read(6)
        assert (stype >= 32) == expect_lpc, stype


def test_lpc_compresses_tonal_signal_beyond_fixed():
    rng = np.random.default_rng(7)
    t = np.arange(9000)
    sig = (
        8000 * np.sin(t / 23.0)
        + 4000 * np.sin(t / 7.1)
        + rng.integers(-50, 50, 9000)
    ).astype(np.int16)
    assert len(flac_encode(sig, lpc_order=8)) < len(flac_encode(sig))


def test_rice_escape_partition_roundtrip():
    """Residual magnitudes past the largest 4-bit Rice parameter force
    the escape-to-raw partition path on BOTH sides (the encoder picks
    param >= 15 for mean |residual| >= 2^15 and the decoder reads the
    raw-width branch)."""
    from national_caseload_data_ingest_spark.operators.flac import (
        _best_rice_param,
        _fixed_residual,
    )

    alt = np.tile(np.array([30000, -30000], dtype=np.int16), 300)
    # the chosen fixed order's residuals really do escape
    assert _best_rice_param(_fixed_residual(alt.astype(np.int64), 0)) >= 15
    _, _, out = flac_decode(flac_encode(alt))
    assert np.array_equal(out[:, 0], alt)


def test_reserved_subframe_type_rejected():
    sig = RNG.integers(-1000, 1000, 500).astype(np.int16)
    payload = bytearray(flac_encode(sig))
    # frame starts right after the 4+4+34 byte header; its first subframe
    # header byte sits after the 32-bit frame header + 1-byte frame no +
    # 2-byte blocksize + CRC8 = offset 8 within the frame
    frame_off = 4 + 4 + 34
    sub_hdr = frame_off + 4 + 1 + 2 + 1
    payload[sub_hdr] = 0x04  # 0 + type 2 (reserved) + wasted 0
    with pytest.raises(ValueError):
        flac_decode(bytes(payload))


def test_garbage_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_decode(b"NOTFLAC!")


def test_flac_audio_features_query(spark):
    from national_caseload_data_ingest_spark.operators.audio import (
        FLAC_N,
        flac_audio_features,
    )

    rows = flac_audio_features(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:14]:
        assert r["n_samples"] == FLAC_N
        mode = r["doc_id"] % 7
        assert r["channels"] == {0: 1, 5: 6, 6: 8}.get(mode, 2)


# ---------------------------------------------------------------------------
# 8- and 24-bit depths (round-10: the depth gate narrows to exotic widths)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bps,amp", [(8, 127), (24, 8_000_000)])
@pytest.mark.parametrize("lpc", [None, 8])
def test_mono_roundtrip_8_and_24_bit(bps, amp, lpc):
    """Bit-exact round trip at both non-16 depths, fixed and LPC
    subframes, including the signed extremes of each width."""
    sig = RNG.integers(-amp - 1, amp, 5000).astype(np.int64)
    sig[:4] = [-(1 << (bps - 1)), (1 << (bps - 1)) - 1, 0, -1]
    rate, ch, out = flac_decode(flac_encode(sig, 8000, lpc_order=lpc,
                                            bps=bps))
    assert (rate, ch) == (8000, 1)
    assert out.dtype == (np.int32 if bps == 24 else np.int16)
    assert np.array_equal(out[:, 0].astype(np.int64), sig)


@pytest.mark.parametrize("bps", [8, 24])
@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_roundtrip_8_and_24_bit(bps, mode):
    """All four channel assignments round-trip at 8 and 24 bits — the
    side channel carries bps+1 bits at every depth."""
    amp = (1 << (bps - 1)) - 1
    st = np.stack(
        [
            RNG.integers(-amp - 1, amp + 1, 3000),
            RNG.integers(-amp - 1, amp + 1, 3000),
        ],
        axis=-1,
    ).astype(np.int64)
    rate, ch, out = flac_decode(flac_encode(st, 44100, stereo_mode=mode,
                                            bps=bps))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out.astype(np.int64), st)


def test_flac_depth_gates_and_range_checks():
    """Depths outside 8/16/24 still gate loudly on decode; the encoder
    rejects unsupported widths and out-of-range samples."""
    from national_caseload_data_ingest_spark.operators.flac import (
        _MsbWriter,
        FLAC_MAGIC,
    )

    with pytest.raises(ValueError, match="bps must be one of 8/16/24"):
        flac_encode(np.zeros(10, np.int64), bps=12)
    with pytest.raises(ValueError, match="exceed signed 8-bit range"):
        flac_encode(np.array([200], np.int64), bps=8)
    info = _MsbWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(0, 48)
    info.write(8000, 20)
    info.write(0, 3)
    info.write(19, 5)  # 20 bps -> still a gate
    info.write(0, 36)
    info.align()
    payload = (FLAC_MAGIC + bytes([0x80]) + (34).to_bytes(3, "big")
               + info.bytes() + b"\x00" * 16)
    with pytest.raises(NotImplementedError,
                       match="only 8/16/24 bps supported, got 20"):
        flac_decode(payload)


# ---------------------------------------------------------------------------
# multichannel (round-10: the channel gate is gone — 1-8 channels decode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nch", [3, 6, 8])
@pytest.mark.parametrize("bps,amp", [(8, 127), (16, 30000), (24, 8_000_000)])
def test_multichannel_roundtrip(nch, bps, amp):
    """Independent-assignment multichannel frames (the only layout FLAC
    defines past stereo) round-trip bit-exactly at every depth."""
    sig = RNG.integers(-amp - 1, amp + 1, (3000, nch)).astype(np.int64)
    sig[0, :] = -(1 << (bps - 1))
    sig[1, :] = (1 << (bps - 1)) - 1
    rate, ch, out = flac_decode(flac_encode(sig, 48000, bps=bps))
    assert (rate, ch) == (48000, nch)
    assert np.array_equal(out.astype(np.int64), sig)


def test_multichannel_lpc_roundtrip():
    sig = RNG.integers(-20000, 20000, (4097, 6)).astype(np.int64)
    _, ch, out = flac_decode(flac_encode(sig, 8000, lpc_order=8))
    assert ch == 6
    assert np.array_equal(out.astype(np.int64), sig)


def test_encoder_rejects_over_8_channels():
    with pytest.raises(ValueError, match="1-8 channels"):
        flac_encode(np.zeros((100, 9), np.int64))
