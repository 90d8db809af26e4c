"""Round-9 operators: the codec gate report (payload → gate reason
routing relation) and its classifier."""

import numpy as np
import pytest

from national_caseload_data_ingest_spark.operators.multimodal import (
    _gate_report_payloads,
    classify_codec_payload,
    codec_gate_report,
)

SF_DIR = "/root/testdata/sf0.001"


def test_classifier_covers_all_statuses():
    """The six fixture classes exercise every status the relation can
    emit — decoded, gated, corrupt, unrouted — with the exact gate
    messages the oracle pins (messages are part of the contract)."""
    got = [classify_codec_payload(p) for p in _gate_report_payloads()]
    assert got == [
        ("jpeg", "decoded", ""),
        ("webp", "decoded", ""),
        ("webp", "gated", "webp: lossy VP8 not supported (VP8L lossless only)"),
        ("flac", "gated", "flac: only 16 bps supported, got 8"),
        ("webp", "corrupt", "vp8l: bad signature byte"),
        ("unknown", "unrouted", "no native decoder claims this container"),
    ]


def test_classifier_never_raises_on_adversarial_bytes():
    """The whole point: gates and corruption become rows, not job
    failures — random and truncated junk under every sniffed magic must
    classify, not throw."""
    rng = np.random.default_rng(3)
    sniffed_heads = [
        b"fLaC",
        b"RIFF\x10\x00\x00\x00AVI ",
        b"RIFF\x10\x00\x00\x00WEBP",
        b"\x89PNG\r\n\x1a\n",
        b"GIF89a",
        b"\xff\xd8",
        b"BM",
        b"II*\x00",
        b"MM\x00*",
        b"",
    ]
    for head in sniffed_heads:
        for n in (0, 1, 7, 40):
            payload = head + bytes(rng.integers(0, 256, n, dtype=np.uint8))
            fmt, status, reason = classify_codec_payload(payload)
            assert status in {"decoded", "gated", "corrupt", "unrouted"}
            if status in {"gated", "corrupt"}:
                assert reason


def test_codec_gate_report_query(spark):
    rows = codec_gate_report(spark, SF_DIR).collect()
    assert len(rows) > 0
    by_class = {}
    for r in rows:
        by_class.setdefault(r["doc_id"] % 6, set()).add(
            (r["fmt"], r["status"], r["reason"])
        )
    # every class present and deterministic (one distinct triple each)
    assert set(by_class) == set(range(6))
    assert all(len(v) == 1 for v in by_class.values())
    statuses = {next(iter(v))[1] for v in by_class.values()}
    assert statuses == {"decoded", "gated", "corrupt", "unrouted"}
