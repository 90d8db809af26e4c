"""RFC 5322 / MIME parser (sources/mime.py): every fixture decoded here
was built by the stdlib email package (independent implementation), plus
hand-built edge cases for the grammar corners stdlib won't emit."""

from __future__ import annotations

from email.message import EmailMessage

import pytest

from national_caseload_data_ingest_spark.sources.mime import (
    decode_body,
    decode_encoded_words,
    decode_qp,
    message_features,
    parse_date_epoch,
    unfold_headers,
    walk_message,
)


def test_header_unfolding_and_case():
    head = "Subject: part one\n\tpart two\nX-Thing: a\n continues"
    h = unfold_headers(head)
    assert h == [("subject", "part one part two"),
                 ("x-thing", "a continues")]
    with pytest.raises(ValueError, match="continuation"):
        unfold_headers(" starts folded")
    with pytest.raises(ValueError, match="malformed"):
        unfold_headers("no colon here")


def test_quoted_printable_edges():
    # soft break joins lines; hard newline kept; =XX decodes
    assert decode_qp(b"ab=\ncd\nef") == b"abcd\nef"
    assert decode_qp(b"caf=C3=A9") == "café".encode()
    # transport-added trailing spaces dropped; CRLF handled
    assert decode_qp(b"line  \r\nnext") == b"line\nnext"
    # soft break with trailing transport spaces after '='
    assert decode_qp(b"a= \r\nb") == b"ab"
    with pytest.raises(ValueError, match="truncated"):
        decode_qp(b"oops=4")
    with pytest.raises(ValueError, match="bad quoted-printable"):
        decode_qp(b"oops=ZZ done")


def test_base64_and_unknown_cte():
    assert decode_body(b"aGVsbG8=\r\n", "base64") == b"hello"
    assert decode_body(b"as-is", None) == b"as-is"
    assert decode_body(b"as-is", "8BIT") == b"as-is"
    with pytest.raises(NotImplementedError, match="uuencode"):
        decode_body(b"x", "uuencode")


def test_encoded_words():
    assert decode_encoded_words("=?utf-8?B?w6k=?=") == "é"
    # Q form: underscore = space, =XX escape
    assert decode_encoded_words("=?utf-8?Q?caf=C3=A9_x?=") == "café x"
    # whitespace between ADJACENT encoded-words is dropped (RFC 2047 §6.2)
    assert decode_encoded_words(
        "=?utf-8?B?YQ==?= =?utf-8?B?Yg==?=") == "ab"
    # but plain text between words survives
    assert decode_encoded_words("x =?utf-8?B?eQ==?= z") == "x y z"
    # charset with RFC 2231 language tag
    assert decode_encoded_words("=?utf-8*en?B?aGk=?=") == "hi"


def test_date_parsing():
    assert parse_date_epoch("Mon, 01 Jan 2024 00:00:00 +0000") == 1704067200
    assert parse_date_epoch("01 Jan 2024 00:00:00 +0000") == 1704067200
    assert parse_date_epoch("Tue, 02 Jan 2024 10:00:00 +0530") \
        == 1704169800
    assert parse_date_epoch("Mon, 01 Jan 2024 00:00:00 -0130") \
        == 1704067200 + 5400
    with pytest.raises(ValueError, match="unparseable date"):
        parse_date_epoch("yesterday-ish")


def test_nested_multipart_depths():
    m = EmailMessage()
    m["From"] = "a@example.com"
    m["Subject"] = "s"
    m["Date"] = "Mon, 01 Jan 2024 00:00:00 +0000"
    m.set_content("plain body")
    m.add_alternative("<p>html body</p>", subtype="html")
    m.add_attachment(b"\x00\x01", maintype="application",
                     subtype="octet-stream", filename="x.bin")
    f = message_features(m.as_bytes())
    assert f["n_leaves"] == 3
    assert f["max_depth"] == 2  # mixed > alternative > text parts
    assert f["text_body"] == b"plain body\n"
    assert (f["n_attachments"], f["att_bytes"], f["att_checksum"]) \
        == (1, 2, 1)


def test_multipart_guards():
    raw = (b"Content-Type: multipart/mixed; boundary=\"B\"\n\n"
           b"--B\nContent-Type: text/plain\n\nhi\n")
    with pytest.raises(ValueError, match="missing closing boundary"):
        walk_message(raw)
    raw2 = b"Content-Type: multipart/mixed\n\n--X--\n"
    with pytest.raises(ValueError, match="without boundary"):
        walk_message(raw2)
    with pytest.raises(ValueError, match="no header/body separator"):
        walk_message(b"Subject: x")


def test_preamble_and_epilogue_ignored():
    raw = (b"Content-Type: multipart/mixed; boundary=B\r\n\r\n"
           b"this is a preamble\r\n"
           b"--B\r\nContent-Type: text/plain\r\n\r\npart one\r\n"
           b"--B\r\nContent-Type: text/plain\r\n\r\npart two\r\n"
           b"--B--\r\nepilogue junk\r\n")
    leaves = walk_message(raw)
    assert [p["body"] for p in leaves] == [b"part one", b"part two"]


# -- mbox --------------------------------------------------------------------

def test_mbox_roundtrip_with_from_quoting():
    from national_caseload_data_ingest_spark.sources.mime import (
        mbox_build,
        mbox_split,
    )

    m1 = b"Subject: a\n\nbody one\nFrom the top\n>From quoted already\n"
    m2 = b"Subject: b\n\nplain\n"
    payload = mbox_build([m1, m2])
    # quoting happened on the wire
    assert b"\n>From the top\n" in payload
    assert b"\n>>From quoted already\n" in payload
    back = mbox_split(payload)
    assert back == [m1, m2]


def test_mbox_guards():
    from national_caseload_data_ingest_spark.sources.mime import mbox_split

    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not start"):
        mbox_split(b"Subject: x\n\nbody\n")


def test_mbox_split_matches_stdlib_mailbox(tmp_path):
    """Splitting parity with the stdlib mailbox reader on messages free
    of From-quoting (where mboxo and mboxrd agree)."""
    import mailbox

    from national_caseload_data_ingest_spark.sources.mime import mbox_split

    path = tmp_path / "t.mbox"
    mb = mailbox.mbox(str(path))
    for j in range(3):
        mb.add(f"Subject: s{j}\n\nbody {j}\n")
    mb.flush()
    payload = path.read_bytes()
    ours = mbox_split(payload)
    theirs = [mb.get_bytes(k) for k in mb.keys()]
    assert [m.rstrip(b"\n") for m in ours] == [
        t.rstrip(b"\n") for t in theirs]


def test_thread_reconstruction():
    from national_caseload_data_ingest_spark.sources.mime import (
        mbox_build,
        mbox_thread_stats,
    )

    def msg(mid, reply_to=None, refs=None):
        h = [f"Message-ID: <{mid}@x>", "Subject: s"]
        if reply_to:
            h.append(f"In-Reply-To: <{reply_to}@x>")
        if refs:
            h.append("References: " + " ".join(f"<{r}@x>" for r in refs))
        return ("\n".join(h) + "\n\nb\n").encode()

    # chain a<-b<-c via In-Reply-To, d alone, e joins a's thread via
    # References only
    payload = mbox_build([
        msg("a"), msg("b", "a"), msg("c", "b"), msg("d"),
        msg("e", refs=["a"]),
    ])
    stats = mbox_thread_stats(payload)
    assert stats["n_messages"] == 5
    assert stats["n_threads"] == 2
    assert stats["max_thread_len"] == 4
    # a reply to an UNSEEN id starts its own thread (no crash)
    stats2 = mbox_thread_stats(mbox_build([msg("x", "ghost")]))
    assert (stats2["n_messages"], stats2["n_threads"]) == (1, 1)
