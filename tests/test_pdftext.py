"""PDF subset reader (sources/pdftext.py): a HAND-WRITTEN spec-shaped
fixture (independent of the builder twin — the same role as the RFC
vector tables elsewhere), builder round-trips, escape/operator edges,
and the honest gates."""

from __future__ import annotations

import zlib

import pytest

from national_caseload_data_ingest_spark.sources.pdftext import (
    PdfFile,
    build_pdf,
    extract_text,
)


def _handwritten_pdf() -> bytes:
    """Composed byte-by-byte from ISO 32000-1's structure examples —
    shares nothing with build_pdf: different object order, an indirect
    /Length, a TJ array with kern numbers, hex strings, comments,
    and a Contents ARRAY of two streams."""
    content1 = (b"% a comment the lexer must skip\n"
                b"BT /F1 12 Tf 72 720 Td\n"
                b"[(Hel) -120 (lo)] TJ\n"
                b"T*\n"
                b"<776f726c64> Tj\n"  # hex string 'world'
                b"ET")
    content2 = b"BT 72 600 Td (tail \\(escaped\\)) Tj ET"
    objs = {
        5: b"<< /Type /Catalog /Pages 4 0 R >>",
        4: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 4 0 R "
            b"/Contents [1 0 R 6 0 R] >>"),
        1: (b"<< /Length 2 0 R >>\nstream\n" + content1
            + b"\nendstream"),
        2: str(len(content1)).encode(),
        6: (b"<< /Length " + str(len(content2)).encode()
            + b" >>\nstream\n" + content2 + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in (5, 4, 3, 1, 2, 6):  # deliberately shuffled order
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size 7 /Root 5 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


def test_handwritten_fixture_extracts():
    got = extract_text(_handwritten_pdf())
    assert got == "Hello\nworld\ntail (escaped)"


def test_builder_roundtrip_edges():
    pages = [
        ["parens (nested (deep)) ok", "back\\slash", "octal \x07 bell"],
        ["second page"],
    ]
    for flate in (True, False):
        got = extract_text(build_pdf(pages, flate=flate))
        assert got == "\n".join(pages[0]) + "\n" + "\n".join(pages[1])


def test_literal_string_escapes():
    # exercised through a tiny one-page doc per escape form
    for text, want in [
        ("a(b)c", "a(b)c"),
        ("back\\slash", "back\\slash"),
        ("tab\there", "tab\there"),
    ]:
        assert extract_text(build_pdf([[text]])) == want


def test_gates_and_guards():
    with pytest.raises(ValueError, match="%PDF header"):
        extract_text(b"not a pdf")
    good = build_pdf([["x"]])
    with pytest.raises(ValueError, match="startxref"):
        extract_text(good[: good.rfind(b"startxref")])
    # xref-stream marker instead of a classic table
    mangled = bytearray(good)
    at = mangled.rfind(b"xref\n0 ")
    mangled[at : at + 4] = b"12 0"  # points at something not 'xref'
    with pytest.raises((ValueError, NotImplementedError)):
        extract_text(bytes(mangled))
    # unsupported filter gates (same-length name so xref offsets hold)
    bad = good.replace(b"/Filter /FlateDecode", b"/Filter /LZWWWDecode")
    with pytest.raises(NotImplementedError, match="filter"):
        extract_text(bad)
    # corrupt flate payload is ValueError, not a crash
    flat = build_pdf([["corrupt me"]], flate=True)
    z = zlib.compress(b"BT (x) Tj ET")
    idx = flat.find(b"stream\n") + 7
    corrupted = flat[:idx] + bytes([flat[idx] ^ 0xFF]) + flat[idx + 1:]
    with pytest.raises(ValueError, match="Flate|literal|stray"):
        extract_text(corrupted)
    assert z  # silence linters


def test_multi_page_order_and_page_tree_recursion():
    pages = [[f"page {i}"] for i in range(5)]
    got = extract_text(build_pdf(pages))
    assert got.splitlines() == [f"page {i}" for i in range(5)]
    pdf = PdfFile(build_pdf(pages))
    assert len(pdf.pages()) == 5
