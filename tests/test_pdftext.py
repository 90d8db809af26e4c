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


def test_modern_xref_stream_and_objstm_roundtrip():
    """PDF 1.5+ containers (xref STREAM + object streams + PNG-Up
    predictor) must extract identically to the classic container."""
    from national_caseload_data_ingest_spark.sources.pdftext import (
        build_pdf_modern,
    )
    pages = [
        ["Doc 7 (generated\\backslash)"],
        ["body text with (parens)", "and a second line"],
    ]
    want = extract_text(build_pdf(pages))
    for objstm in (True, False):
        for predictor in (12, 0):
            for flate in (True, False):
                got = extract_text(build_pdf_modern(
                    pages, flate=flate, objstm=objstm,
                    predictor=predictor))
                assert got == want, (objstm, predictor, flate)
    # structure spot-check: type-2 entries exist when objstm=True
    pdf = PdfFile(build_pdf_modern(pages, objstm=True))
    kinds = {v[0] for v in pdf.xref.values()}
    assert kinds == {"n", "c"}
    assert len(pdf.pages()) == 2


def test_png_predictor_filters_roundtrip():
    """All five PNG row filters reconstruct, checked against an
    in-test reference ENCODER (independent of the decoder's loops)."""
    import random

    from national_caseload_data_ingest_spark.sources.pdftext import (
        _png_unpredict,
    )

    def ref_encode(rows, ftype, bpp):
        out = bytearray()
        prev = bytes(len(rows[0]))
        for row in rows:
            out.append(ftype)
            for i, x in enumerate(row):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                out.append((x - pred) & 0xFF)
            prev = bytes(row)
        return bytes(out)

    rng = random.Random(12)
    for columns, colors, bpc in [(7, 1, 8), (5, 3, 8), (4, 1, 16)]:
        row_len = (columns * colors * bpc + 7) // 8
        bpp = max(1, (colors * bpc + 7) // 8)
        rows = [bytes(rng.randrange(256) for _ in range(row_len))
                for _ in range(6)]
        raw = b"".join(rows)
        for ftype in range(5):
            enc = ref_encode(rows, ftype, bpp)
            assert _png_unpredict(enc, columns, colors, bpc) == raw, \
                (columns, colors, bpc, ftype)
    # guards
    with pytest.raises(ValueError, match="filter type"):
        _png_unpredict(bytes([9, 0, 0]), 2, 1, 8)
    with pytest.raises(ValueError, match="whole rows"):
        _png_unpredict(bytes(4), 4, 1, 8)


def test_incremental_update_xref_stream_prev_to_classic():
    """An appended update whose xref STREAM /Prev points back at the
    CLASSIC table: the update's entry for the replaced content stream
    must win, everything else resolves through /Prev."""
    import re
    import zlib as _z

    from national_caseload_data_ingest_spark.sources.pdftext import (
        _png_predict,
    )
    base = build_pdf([["original text"]])
    classic_at = int(
        re.search(rb"startxref\s+(\d+)", base).group(1))
    out = bytearray(base)
    content = b"BT /F1 12 Tf 72 720 Td\n(updated text) Tj\nET"
    body = _z.compress(content)
    off4 = len(out)
    out += (b"4 0 obj\n<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body
            + b"\nendstream\nendobj\n")
    xoff = len(out)
    rows = (bytes([1]) + off4.to_bytes(4, "big") + bytes(2)
            + bytes([1]) + xoff.to_bytes(4, "big") + bytes(2))
    data = _z.compress(_png_predict(rows, 7))
    out += (b"5 0 obj\n<< /Type /XRef /Size 6 /W [1 4 2] "
            b"/Index [4 1 5 1] /Root 1 0 R /Prev "
            + str(classic_at).encode()
            + b" /Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns 7 >> /Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream\nendobj\n")
    out += b"startxref\n" + str(xoff).encode() + b"\n%%EOF\n"
    assert extract_text(bytes(out)) == "updated text"
    # and the pre-update file still reads the original
    assert extract_text(base) == "original text"


def test_hybrid_xrefstm_takes_precedence_over_classic_row():
    """Hybrid-reference file: the classic trailer's /XRefStm entries
    must be consulted BEFORE the classic table's own rows (we corrupt
    the classic row so only the precedence order extracts)."""
    import re
    import zlib as _z

    base = bytearray(build_pdf([["hybrid wins"]]))
    xref_at = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    # classic rows: free + objects 1..4, 20 bytes each after "xref\n0 5\n"
    rows_at = xref_at + len(b"xref\n0 5\n")
    row4_at = rows_at + 4 * 20
    off4 = int(base[row4_at : row4_at + 10])
    off3 = int(base[rows_at + 3 * 20 : rows_at + 3 * 20 + 10])
    base[row4_at : row4_at + 10] = f"{off3:010d}".encode()  # corrupt
    # append an xref stream with the CORRECT entry for object 4;
    # fixed-point the /XRefStm offset (inserting it shifts the tail)
    ins_at = base.index(b" >>", base.index(b"trailer"))
    xoff = 0
    for _ in range(4):
        ins = f" /XRefStm {xoff}".encode()
        new_xoff = len(base) + len(ins)
        if new_xoff == xoff:
            break
        xoff = new_xoff
    rows = bytes([1]) + off4.to_bytes(4, "big") + bytes(2)
    data = _z.compress(rows)
    out = bytes(base[:ins_at]) + ins + bytes(base[ins_at:])
    assert len(out) == xoff
    out += (b"5 0 obj\n<< /Type /XRef /Size 6 /W [1 4 2] /Index [4 1]"
            b" /Root 1 0 R /Filter /FlateDecode /Length "
            + str(len(data)).encode() + b" >>\nstream\n" + data
            + b"\nendstream\nendobj\n")
    out += (b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    assert extract_text(out) == "hybrid wins"


def test_stock_filter_family_roundtrips():
    """All §7.4 stock filters extract identically: LZW (9→12-bit
    early-change codes), ASCIIHex, ASCII85, RunLength, and the
    [ASCII85 Flate] filter ARRAY — in both classic and modern
    containers."""
    from national_caseload_data_ingest_spark.sources.pdftext import (
        build_pdf_modern,
    )
    pages = [
        ["aaaa bbbb aaaa bbbb run run run run"],  # RL-friendly repeats
        ["body (text) with\\escapes", "second line"],
    ]
    want = extract_text(build_pdf(pages))
    for cf in (None, "flate", "lzw", "ahx", "rl", "a85flate"):
        assert extract_text(build_pdf(pages, content_filter=cf)) \
            == want, cf
        assert extract_text(
            build_pdf_modern(pages, content_filter=cf)) == want, cf


def test_lzw_filter_primitives():
    """LZW codec twins: width-boundary roundtrips, the PDF-reference
    EarlyChange semantics, and the KwKwK case."""
    import random

    from national_caseload_data_ingest_spark.sources.pdftext import (
        _lzw_decode,
        _lzw_encode,
    )
    rng = random.Random(7)
    cases = [
        b"", b"A", b"aaaaaaa",  # KwKwK territory
        bytes(rng.randrange(4) for _ in range(20000)),  # many merges
        bytes(rng.randrange(256) for _ in range(60000)),  # 12-bit+clear
    ]
    for data in cases:
        for early in (1, 0):
            assert _lzw_decode(_lzw_encode(data, early), early) == data
    # EarlyChange matters: a stream long enough to cross the 9→10
    # boundary decodes DIFFERENTLY (or fails) under the wrong setting
    data = bytes(rng.randrange(8) for _ in range(4000))
    enc = _lzw_encode(data, 1)
    try:
        assert _lzw_decode(enc, 0) != data
    except ValueError:
        pass  # desync detected as a range error is equally fine
    # guards
    with pytest.raises(ValueError, match="EOD"):
        _lzw_decode(b"\x80\x11")  # clear + truncated
    with pytest.raises(ValueError, match="out of range"):
        # clear then an impossible high code (table has no entry 300)
        _lzw_decode(bytes([0b10000000, 0b0_1001011, 0b00_000000]))


def test_ascii85_and_runlength_primitives():
    import random

    from national_caseload_data_ingest_spark.sources.pdftext import (
        _ascii85_decode,
        _ascii85_encode,
        _asciihex_decode,
        _runlength_decode,
        _runlength_encode,
    )
    # Adobe's canonical 4-byte vector + 'z' shorthand
    assert _ascii85_encode(b"Man ") == b"9jqo^~>"
    assert _ascii85_decode(b"9jqo^~>") == b"Man "
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ascii85_decode(b"<~9jqo^~>") == b"Man "  # optional <~ lead
    rng = random.Random(3)
    for n in list(range(12)) + [100, 1001]:
        b = bytes(rng.randrange(256) for _ in range(n))
        assert _ascii85_decode(_ascii85_encode(b)) == b
        assert _runlength_decode(_runlength_encode(b)) == b
    runs = b"x" * 300 + b"ab" + b"y" * 3 + b"tail"
    assert _runlength_decode(_runlength_encode(runs)) == runs
    assert _asciihex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    assert _asciihex_decode(b"48656C6C6F2") == b"Hello "  # odd pads 0
    with pytest.raises(ValueError, match="non-hex"):
        _asciihex_decode(b"4z>")
    with pytest.raises(ValueError, match="ascii85"):
        _ascii85_decode(b"9jz~>")  # z inside a group
    with pytest.raises(ValueError, match="EOD"):
        _runlength_decode(b"\x02abc")  # no terminator


def test_modern_gates():
    """Corrupt modern containers raise cleanly."""
    from national_caseload_data_ingest_spark.sources.pdftext import (
        build_pdf_modern,
    )
    good = build_pdf_modern([["x"]], objstm=True)
    # /Type /XRef renamed (same length so offsets hold)
    bad = good.replace(b"/Type /XRef", b"/Type /XreF")
    with pytest.raises(ValueError, match="XRef"):
        extract_text(bad)
    # /Type /ObjStm renamed
    bad = good.replace(b"/Type /ObjStm", b"/Type /ObjStX")
    with pytest.raises(ValueError, match="ObjStm"):
        extract_text(bad)
    # mislabeling PNG-filtered data as TIFF predictor 2 fails loudly
    # (row arithmetic no longer fits) rather than desynchronizing
    bad = good.replace(b"/Predictor 12", b"/Predictor 02")
    with pytest.raises(ValueError):
        extract_text(bad)
    # unknown predictor id
    bad = good.replace(b"/Predictor 12", b"/Predictor 77")
    with pytest.raises(ValueError, match="predictor"):
        extract_text(bad)


def test_tiff_predictor_2():
    """TIFF horizontal differencing reconstructs (per-row, per-color
    channel), checked against an in-test difference encoder."""
    import random

    from national_caseload_data_ingest_spark.sources.pdftext import (
        _tiff_unpredict,
    )
    rng = random.Random(9)
    for columns, colors in [(7, 1), (5, 3)]:
        row_len = columns * colors
        raw = bytes(rng.randrange(256) for _ in range(row_len * 6))
        enc = bytearray(raw)
        for at in range(0, len(enc), row_len):
            for i in range(row_len - 1, colors - 1, -1):
                enc[at + i] = (raw[at + i] - raw[at + i - colors]) & 0xFF
        assert _tiff_unpredict(bytes(enc), columns, colors, 8) == raw
    with pytest.raises(NotImplementedError, match="TIFF"):
        _tiff_unpredict(bytes(4), 2, 1, 16)
    with pytest.raises(ValueError, match="whole rows"):
        _tiff_unpredict(bytes(5), 2, 1, 8)


def test_multi_page_order_and_page_tree_recursion():
    pages = [[f"page {i}"] for i in range(5)]
    got = extract_text(build_pdf(pages))
    assert got.splitlines() == [f"page {i}" for i in range(5)]
    pdf = PdfFile(build_pdf(pages))
    assert len(pdf.pages()) == 5
