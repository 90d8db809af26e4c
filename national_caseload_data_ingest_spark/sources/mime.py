"""Native RFC 5322 / MIME message parser — header grammar, multipart
walking, content-transfer-encodings, and RFC 2047 encoded-words.

Mail archives are a standing training-data source (support threads,
mailing lists, the classic research corpora), shipped as RFC 5322
messages inside mbox/maildir containers.  This module parses the
MESSAGE format natively:

* header unfolding (continuation lines start with SP/HT),
  case-insensitive field names, the ``Name: value`` grammar;
* ``Content-Type`` parameter parsing (quoted and bare values) and
  recursive ``multipart/*`` boundary walking (RFC 2046 §5.1: parts
  delimited by ``--boundary`` lines, terminated by ``--boundary--``,
  preamble/epilogue ignored) — NESTED multiparts included;
* content-transfer-encodings: ``7bit``/``8bit``/``binary`` (identity),
  ``quoted-printable`` (=XX escapes, soft line breaks, trailing-space
  robustness — decoded natively), and ``base64`` (via the stdlib
  primitive, the zlib convention); unknown encodings raise;
* RFC 2047 encoded-words in headers (``=?charset?B|Q?...?=``,
  underscore-as-space in Q form, adjacent-word whitespace collapsing);
* RFC 5322 date parsing to epoch seconds (numeric timezone offsets).

The ENCODE twin is the stdlib ``email`` package — an independent
implementation maintained with CPython — so every fixture the tests
decode was produced by code this module does not share a line with.

Spark shape: the established per-payload Arrow kernel — one message (or
one mbox of messages) per row, zero shuffle.
"""

from __future__ import annotations

import base64
import re


def unfold_headers(head: str) -> list[tuple[str, str]]:
    """Raw header block → [(name, value)] with folding undone."""
    lines = head.split("\r\n") if "\r\n" in head else head.split("\n")
    out: list[tuple[str, str]] = []
    for line in lines:
        if not line:
            continue
        if line[0] in " \t":
            if not out:
                raise ValueError("mime: continuation before any header")
            name, val = out[-1]
            out[-1] = (name, val + " " + line.strip())
            continue
        name, sep, val = line.partition(":")
        if not sep:
            raise ValueError(f"mime: malformed header line {line!r}")
        out.append((name.strip().lower(), val.strip()))
    return out


def header(headers: list[tuple[str, str]], name: str) -> str | None:
    name = name.lower()
    for n, v in headers:
        if n == name:
            return v
    return None


def parse_content_type(value: str | None) -> tuple[str, dict[str, str]]:
    """``type/subtype; key=value; key="quoted"`` → (type, params)."""
    if not value:
        return "text/plain", {}
    parts = value.split(";")
    ctype = parts[0].strip().lower()
    params: dict[str, str] = {}
    for p in parts[1:]:
        k, sep, v = p.partition("=")
        if not sep:
            continue
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
        params[k.strip().lower()] = v
    return ctype, params


def decode_qp(data: bytes) -> bytes:
    """Quoted-printable per RFC 2045 §6.7: ``=XX`` escapes, ``=`` at end
    of line = soft break, transport-added trailing whitespace dropped."""
    out = bytearray()
    lines = data.split(b"\n")
    for li, line in enumerate(lines):
        line = line.rstrip(b"\r")
        # trailing SP/HT are transport padding unless part of a soft break
        stripped = line.rstrip(b" \t")
        soft = stripped.endswith(b"=")
        body = stripped[:-1] if soft else stripped
        i = 0
        while i < len(body):
            b = body[i]
            if b == 0x3D:  # '='
                if len(body) - i < 3:
                    raise ValueError("mime: truncated =XX escape")
                hexpair = body[i + 1 : i + 3]
                try:
                    out.append(int(hexpair, 16))
                except ValueError:
                    raise ValueError(
                        f"mime: bad quoted-printable escape {hexpair!r}"
                    ) from None
                i += 3
            else:
                out.append(b)
                i += 1
        if not soft and li != len(lines) - 1:
            out += b"\n"
    return bytes(out)


def decode_body(payload: bytes, cte: str | None) -> bytes:
    enc = (cte or "7bit").strip().lower()
    if enc in ("7bit", "8bit", "binary"):
        return payload
    if enc == "quoted-printable":
        return decode_qp(payload)
    if enc == "base64":
        compact = re.sub(rb"\s+", b"", payload)
        return base64.b64decode(compact, validate=True)
    raise NotImplementedError(f"mime: content-transfer-encoding {enc!r}")


_EW_RX = re.compile(r"=\?([^?]+)\?([BbQq])\?([^?]*)\?=")


def decode_encoded_words(value: str) -> str:
    """RFC 2047: decode every encoded-word; whitespace BETWEEN two
    adjacent encoded-words is dropped (§6.2)."""
    # drop linear whitespace between adjacent encoded-words first
    value = re.sub(r"(\?=)\s+(=\?)", r"\1\2", value)

    def repl(m: re.Match) -> str:
        charset, kind, text = m.group(1), m.group(2).upper(), m.group(3)
        if kind == "B":
            raw = base64.b64decode(text + "=" * (-len(text) % 4))
        else:  # Q: underscore = space, =XX escapes
            raw = decode_qp(
                text.replace("_", " ").encode("ascii", "strict")
            )
        return raw.decode(charset.split("*")[0])

    return _EW_RX.sub(repl, value)


_DATE_RX = re.compile(
    r"(?:\w+,\s*)?(\d{1,2})\s+(\w{3})\s+(\d{4})\s+"
    r"(\d{2}):(\d{2}):(\d{2})\s+([+-]\d{4})"
)
_MONTHS = {m: i + 1 for i, m in enumerate(
    "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split())}


def parse_date_epoch(value: str) -> int:
    """RFC 5322 date-time → epoch seconds (numeric zones only)."""
    m = _DATE_RX.search(value)
    if not m or m.group(2) not in _MONTHS:
        raise ValueError(f"mime: unparseable date {value!r}")
    import calendar  # noqa: PLC0415

    day, mon, year = int(m.group(1)), _MONTHS[m.group(2)], int(m.group(3))
    hh, mm, ss = int(m.group(4)), int(m.group(5)), int(m.group(6))
    tz = m.group(7)
    offset = (int(tz[1:3]) * 60 + int(tz[3:5])) * 60
    if tz[0] == "-":
        offset = -offset
    return calendar.timegm((year, mon, day, hh, mm, ss, 0, 0, 0)) - offset


def _split_message(raw: bytes) -> tuple[list[tuple[str, str]], bytes]:
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = raw.find(sep)
        if idx >= 0:
            head = raw[:idx].decode("utf-8", "replace")
            return unfold_headers(head), raw[idx + len(sep):]
    raise ValueError("mime: no header/body separator")


def walk_message(raw: bytes) -> list[dict]:
    """Parse a message into its LEAF parts (depth-first):
    ``{"content_type", "body", "depth"}`` per leaf, multiparts recursed.
    The body bytes are fully transfer-decoded."""
    return _walk(raw, 0)


def _walk(raw: bytes, depth: int) -> list[dict]:
    if depth > 64:
        raise ValueError("mime: multipart nesting deeper than 64")
    headers, body = _split_message(raw)
    ctype, params = parse_content_type(header(headers, "content-type"))
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("mime: multipart without boundary")
        delim = b"--" + boundary.encode()
        close = delim + b"--"
        parts: list[bytes] = []
        cur: list[bytes] | None = None  # None = in the preamble
        closed = False
        for line in body.splitlines(keepends=True):
            stripped = line.rstrip(b"\r\n").rstrip(b" \t")
            if stripped == close:
                if cur is None:
                    raise ValueError("mime: closing boundary before any part")
                parts.append(b"".join(cur))
                closed = True
                break  # epilogue ignored (RFC 2046 §5.1.1)
            if stripped == delim:
                if cur is not None:
                    parts.append(b"".join(cur))
                cur = []
            elif cur is not None:
                cur.append(line)
        if not closed:
            raise ValueError("mime: multipart missing closing boundary")
        leaves: list[dict] = []
        for part in parts:
            # the CRLF preceding a delimiter belongs to the delimiter
            if part.endswith(b"\r\n"):
                part = part[:-2]
            elif part.endswith(b"\n"):
                part = part[:-1]
            leaves.extend(_walk(part, depth + 1))
        return leaves
    decoded = decode_body(
        body, header(headers, "content-transfer-encoding"))
    return [{
        "content_type": ctype,
        "body": decoded,
        "depth": depth,
        "filename": parse_content_type(
            header(headers, "content-disposition"))[1].get("filename"),
    }]


def message_features(raw: bytes) -> dict:
    """Envelope + structure features of one message: decoded subject,
    sender, epoch date, leaf-part census, text body, attachment bytes."""
    headers, _body = _split_message(raw)
    leaves = walk_message(raw)
    text = b"".join(
        p["body"] for p in leaves if p["content_type"] == "text/plain"
    )
    att = [p for p in leaves if p["filename"]]
    return {
        "subject": decode_encoded_words(header(headers, "subject") or ""),
        "sender": header(headers, "from") or "",
        "date_epoch": parse_date_epoch(header(headers, "date") or ""),
        "n_leaves": len(leaves),
        "max_depth": max(p["depth"] for p in leaves),
        "text_body": text,
        "n_attachments": len(att),
        "att_bytes": sum(len(p["body"]) for p in att),
        "att_checksum": sum(sum(p["body"]) for p in att),
    }


# -- mbox container (RFC 4155 / mboxrd) --------------------------------------

def mbox_build(messages: list[bytes], sender: str = "x@x") -> bytes:
    """Messages → one mbox: each preceded by a ``From `` envelope line,
    body lines matching ``^>*From `` quoted with one more ``>``
    (the mboxrd convention — reversible, unlike mboxo)."""
    out = bytearray()
    for msg in messages:
        out += f"From {sender} Mon Jan  1 00:00:00 2024\n".encode()
        for line in msg.split(b"\n"):
            if re.match(rb"^>*From ", line):
                out += b">"
            out += line + b"\n"
        out += b"\n"
    return bytes(out)


def mbox_split(payload: bytes) -> list[bytes]:
    """One mbox → message byte blocks, mboxrd quoting reversed
    (``^>+From `` loses one ``>``); the envelope line and the blank
    separator line are framing, not message content."""
    if not payload.startswith(b"From "):
        raise ValueError("mbox: payload does not start with an envelope")
    messages: list[bytes] = []
    cur: list[bytes] | None = None
    for line in payload.split(b"\n"):
        if line.startswith(b"From "):
            if cur is not None:
                messages.append(b"\n".join(cur).rstrip(b"\n") + b"\n")
            cur = []
            continue
        if cur is None:
            raise ValueError("mbox: content before the first envelope")
        if re.match(rb"^>+From ", line):
            line = line[1:]
        cur.append(line)
    if cur is not None:
        messages.append(b"\n".join(cur).rstrip(b"\n") + b"\n")
    return messages


def mbox_thread_stats(payload: bytes) -> dict:
    """Thread reconstruction over one mbox: messages join the thread of
    the message their ``In-Reply-To``/``References`` names (union-find,
    container-local — threads do not span mboxes, like WebDataset
    samples don't span shards).  Returns the thread census plus the
    count of body lines whose mboxrd ``From``-quoting was reversed."""
    msgs = mbox_split(payload)
    ids: dict[str, int] = {}
    parent = list(range(len(msgs)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_from_lines = 0
    for i, raw in enumerate(msgs):
        headers, body = _split_message(raw)
        mid = header(headers, "message-id")
        if mid:
            ids[mid.strip()] = i
        ref = header(headers, "in-reply-to") or ""
        refs = header(headers, "references") or ""
        for token in (ref + " " + refs).split():
            j = ids.get(token.strip())
            if j is not None:
                parent[find(i)] = find(j)
        n_from_lines += sum(
            1 for line in body.split(b"\n") if line.startswith(b"From ")
        )
    roots: dict[int, int] = {}
    for i in range(len(msgs)):
        r = find(i)
        roots[r] = roots.get(r, 0) + 1
    return {
        "n_messages": len(msgs),
        "n_threads": len(roots),
        "max_thread_len": max(roots.values()) if roots else 0,
        "n_from_lines": n_from_lines,
    }
