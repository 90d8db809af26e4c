"""FLAC (subset) codec — pure stdlib/numpy, no codec libraries.

The flagship lossless audio format, completing the audio band next to
PCM WAV, G.711, and IMA ADPCM.  Format reference: the public FLAC
format specification (xiph.org / RFC 9639).

Implemented subset (what the encoder here emits and real FLAC files
commonly contain — 8/16/24-bit depths):

- fLaC magic + STREAMINFO (and skipping any other metadata block),
- frames with UTF-8-coded frame numbers, CRC-8 header / CRC-16 frame
  checks (verified, not just parsed),
- subframe types CONSTANT, VERBATIM, FIXED orders 0-4, and LPC orders
  1-32 (quantized-coefficient linear prediction — the dominant coding
  mode in real-world FLAC; encoder computes coefficients via
  Levinson–Durbin and quantizes with error feedback, decoder restores
  with exact integer arithmetic and the spec's arithmetic right shift),
- Rice-coded residuals (both 4- and 5-bit parameter methods, partition
  orders, escape-to-raw partitions — the escape is reachable from the
  encoder for large-residual signals, with the raw width sized to the
  partition's widest value),
- channel assignments: independent 1-8 channels (mono through 7.1 —
  FLAC's whole channel range) plus the left/side, right/side, and
  mid/side stereo decorrelation modes.

Remaining honest gates: bit depths other than 8/16/24 and reserved
subframe/residual types — everything this module
claims to decode it decodes bit-exactly (roundtrip property tests in
``tests/test_flac.py``), and what it does not, it refuses loudly.
"""

from __future__ import annotations

FLAC_MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _MsbReader:
    """MSB-first bit reader (FLAC convention, unlike VP8L)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("flac: bitstream exhausted")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _MsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (values beyond 7 bits use
    multi-byte sequences exactly like UTF-8 code points)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _MsbReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad UTF-8 frame number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# Fixed-prediction residual (encoder side): order-k difference.
def _fixed_residual(samples, order: int):
    import numpy as np  # noqa: PLC0415

    res = np.asarray(samples, dtype=np.int64)
    for _ in range(order):
        res = np.diff(res)
    return res


def _restore_fixed(warmup, residual, order: int):
    import numpy as np  # noqa: PLC0415

    out = list(int(x) for x in warmup)
    coeffs = _FIXED_COEFFS[order]
    for r in residual:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
        out.append(int(r) + pred)
    return np.asarray(out, dtype=np.int64)


def _lpc_quantized(samples, order: int, precision: int = 12):
    """Levinson–Durbin LPC coefficients, quantized libFLAC-style.

    Returns ``(qcoefs, shift, precision)`` with ``qcoefs`` integer
    coefficients of ``precision`` bits and ``shift`` the right-shift
    applied after the integer dot product, or ``None`` when the signal
    is degenerate (constant/zero autocorrelation, unstable recursion) —
    the caller then falls back to a FIXED subframe.  Quantization
    carries the rounding error forward (error feedback), matching the
    reference encoder's approach; floats appear ONLY here on the
    encoder side — the emitted stream and the decoder are pure
    integers, so the codec stays lossless regardless."""
    import numpy as np  # noqa: PLC0415

    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n <= order:
        return None
    autoc = np.array(
        [float(np.dot(x[: n - i], x[i:])) for i in range(order + 1)]
    )
    if autoc[0] <= 0:
        return None
    err = autoc[0]
    a = np.zeros(0)
    for i in range(order):
        acc = autoc[i + 1]
        if i:
            acc -= float(np.dot(a, autoc[i:0:-1]))
        k = acc / err
        a = (
            np.concatenate([a - k * a[::-1], [k]]) if i else np.array([k])
        )
        err *= 1.0 - k * k
        if err <= 0 or not np.isfinite(err):
            return None
    cmax = float(np.max(np.abs(a)))
    if cmax <= 0 or not np.isfinite(cmax):
        return None
    import math  # noqa: PLC0415

    shift = precision - 1 - int(math.floor(math.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    q = []
    e = 0.0
    for c in a:
        v = c * (1 << shift) + e
        qi = max(qmin, min(qmax, int(round(v))))
        e = v - qi
        q.append(qi)
    if not any(q):
        return None
    return q, shift, precision


def _lpc_residual(samples, qcoefs, shift: int):
    import numpy as np  # noqa: PLC0415

    s = np.asarray(samples, dtype=np.int64)
    order = len(qcoefs)
    acc = np.zeros(len(s) - order, dtype=np.int64)
    for i, c in enumerate(qcoefs):
        acc += c * s[order - 1 - i : len(s) - 1 - i]
    # numpy >> on int64 is the arithmetic shift the spec requires
    return s[order:] - (acc >> shift)


def _restore_lpc(warmup, residual, qcoefs, shift: int):
    import numpy as np  # noqa: PLC0415

    out = [int(x) for x in warmup]
    for r in residual:
        acc = sum(c * out[-i - 1] for i, c in enumerate(qcoefs))
        out.append(int(r) + (acc >> shift))
    return np.asarray(out, dtype=np.int64)


def _write_rice_partition(bw: _MsbWriter, residual, param: int) -> None:
    if param > 30:  # escape: raw 5-bit-chosen width (encoder uses 17)
        raise ValueError("rice param too large")
    for r in residual:
        u = _zigzag(int(r))
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(residual) -> int:
    import numpy as np  # noqa: PLC0415

    if len(residual) == 0:
        return 0
    mean = float(np.mean([abs(int(r)) for r in residual]))
    p = 0
    while (1 << p) < mean and p < 30:
        p += 1
    return p


def _write_residual(bw: _MsbWriter, res, bs: int, order: int) -> None:
    """Residual coding method 0 (4-bit params): partition order 1 on big
    even blocks (exercises per-partition params in the decoder), else 0.
    A partition whose best Rice parameter would not fit the 4-bit field
    escapes to raw, with the width sized to the widest signed value in
    the partition (the spec's verbatim-partition path)."""
    porder = 1 if (bs % 2 == 0 and bs >= 256 and order < bs // 2) else 0
    bw.write(0, 2)
    bw.write(porder, 4)
    start = 0
    for part in range(1 << porder):
        count = (bs >> porder) - (order if part == 0 else 0)
        chunk = res[start : start + count]
        start += count
        param = _best_rice_param(chunk)
        if param >= 15:
            width = max(
                (int(r).bit_length() + 1 for r in chunk), default=1
            )
            bw.write(15, 4)  # escape
            bw.write(width, 5)  # raw width
            for r in chunk:
                bw.write(int(r) & ((1 << width) - 1), width)
        else:
            bw.write(param, 4)
            _write_rice_partition(bw, chunk, param)


def _encode_subframe(
    bw: _MsbWriter, samples, bps: int, lpc_order: int | None = None
) -> None:
    import numpy as np  # noqa: PLC0415

    s = np.asarray(samples, dtype=np.int64)
    bw.write(0, 1)  # mandatory zero bit
    if len(set(s.tolist())) == 1:
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(s[0]) & ((1 << bps) - 1), bps)
        return
    bs = len(s)
    if lpc_order is not None and 1 <= lpc_order <= 32 and bs > lpc_order:
        lpc = _lpc_quantized(s, lpc_order)
        if lpc is not None:
            qcoefs, shift, precision = lpc
            res = _lpc_residual(s, qcoefs, shift)
            if int(np.abs(res).max()) < (1 << 28):
                bw.write(32 + lpc_order - 1, 6)  # LPC, order encoded -1
                bw.write(0, 1)  # no wasted bits
                for w in s[:lpc_order]:
                    bw.write(int(w) & ((1 << bps) - 1), bps)
                bw.write(precision - 1, 4)
                bw.write(shift, 5)  # nonnegative, fits signed 5-bit
                for c in qcoefs:
                    bw.write(c & ((1 << precision) - 1), precision)
                _write_residual(bw, res, bs, lpc_order)
                return
    # pick the fixed order with the smallest residual magnitude sum
    best_order, best_cost = 0, None
    for order in range(0, 5):
        if order >= len(s):
            break
        res = _fixed_residual(s, order)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    res = _fixed_residual(s, order)
    # range guard: residuals must zigzag into reasonable rice codes;
    # fall back to VERBATIM if the signal is adversarial
    if len(res) and int(np.abs(res).max()) >= (1 << 28):
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in s:
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for w in s[:order]:
        bw.write(int(w) & ((1 << bps) - 1), bps)
    _write_residual(bw, res, bs, order)


_BPS_CODES = {8: 0b001, 16: 0b100, 24: 0b110}  # frame-header sample sizes


def flac_encode(
    samples,
    sample_rate: int = 8000,
    stereo_mode: str = "independent",
    lpc_order: int | None = None,
    bps: int = 16,
) -> bytes:
    """integer array ``(n,)`` mono or ``(n, ch)`` (ch ≤ 8) → FLAC bytes.

    ``stereo_mode``: ``independent``, ``left_side``, ``right_side`` or
    ``mid_side`` — emits the corresponding channel assignment so the
    decoder's decorrelation paths are exercised.  Beyond two channels
    FLAC defines only the independent assignment (chan_assign = ch-1),
    which is what multichannel (5.1 / 7.1) streams carry.  ``lpc_order``
    (1-32) forces quantized-LPC subframes of that order (falling back to
    FIXED only on degenerate signals); ``None`` keeps the fixed-predictor
    search.  ``bps`` selects the sample depth — 8, 16, or 24 bits (the
    depths real audio corpora carry); samples must fit the signed
    range."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if bps not in _BPS_CODES:
        raise ValueError(f"flac_encode: bps must be one of 8/16/24, got {bps}")
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac_encode: 1-8 channels")
    if ch != 2 and stereo_mode != "independent":
        raise ValueError("stereo_mode needs exactly 2 channels")
    if n and (
        int(s.max()) >= (1 << (bps - 1)) or int(s.min()) < -(1 << (bps - 1))
    ):
        raise ValueError(f"flac_encode: samples exceed signed {bps}-bit range")
    block_size = 4096
    frames = bytearray()
    frame_no = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        bs = blk.shape[0]
        hdr = _MsbWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        hdr.write(0b0111, 4)  # block size: 16-bit value - 1 follows
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        if ch != 2 or stereo_mode == "independent":
            chan_assign = ch - 1
        elif stereo_mode == "left_side":
            chan_assign = 8
        elif stereo_mode == "right_side":
            chan_assign = 9
        else:
            chan_assign = 10  # mid_side
        hdr.write(chan_assign, 4)
        hdr.write(_BPS_CODES[bps], 3)  # sample size
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_number(frame_no)
        head += struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])
        body = _MsbWriter()
        if chan_assign <= 7:
            for c in range(ch):
                _encode_subframe(body, blk[:, c], bps, lpc_order)
        else:
            left, right = blk[:, 0], blk[:, 1]
            if chan_assign == 8:  # left + side(=l-r)
                _encode_subframe(body, left, bps, lpc_order)
                _encode_subframe(body, left - right, bps + 1, lpc_order)
            elif chan_assign == 9:  # side + right
                _encode_subframe(body, left - right, bps + 1, lpc_order)
                _encode_subframe(body, right, bps, lpc_order)
            else:  # mid + side: mid = (l+r)>>1
                _encode_subframe(body, (left + right) >> 1, bps, lpc_order)
                _encode_subframe(body, left - right, bps + 1, lpc_order)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        frame_no += 1

    info = _MsbWriter()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    info.align()
    streaminfo = info.bytes() + b"\x00" * 16  # md5 unset (all zero)
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80 | 0])  # last metadata block, type STREAMINFO
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo
    out += frames
    return bytes(out)


def _decode_subframe(br: _MsbReader, bs: int, bps: int):
    import numpy as np  # noqa: PLC0415

    if br.read(1) != 0:
        raise ValueError("flac: subframe sync bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted bits flag
        wasted = 1 + br.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = np.full(bs, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.asarray([br.read_signed(bps) for _ in range(bs)], np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warmup = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = _restore_fixed(warmup, res, order)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warmup = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4)
        if precision == 0b1111:
            raise ValueError("flac: invalid qlp precision code")
        precision += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift is reserved")
        qcoefs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = _restore_lpc(warmup, res, qcoefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted if wasted else out


def _decode_residual(br: _MsbReader, bs: int, order: int):
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    out = []
    for p in range(n_parts):
        count = bs >> part_order
        if p == 0:
            count -= order
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            out.extend(br.read_signed(width) for _ in range(count))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                out.append(_unzigzag(u))
    return out


def flac_decode(payload: bytes):
    """FLAC → ``(sample_rate, channels, samples (n, ch))`` — int16 for
    8/16-bit streams, int32 for 24-bit.

    Verifies the frame header CRC-8 and whole-frame CRC-16; raises
    ``ValueError`` on corruption and ``NotImplementedError`` on
    unsupported stream shapes (depths outside 8/16/24)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos]
        btype = hdr & 0x7F
        (blen,) = (int.from_bytes(payload[pos + 1 : pos + 4], "big"),)
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    si = _MsbReader(streaminfo)
    si.read(16)  # min block
    si.read(16)
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    ch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if bps not in (8, 16, 24):
        raise NotImplementedError(
            f"flac: only 8/16/24 bps supported, got {bps}"
        )

    chans = [[] for _ in range(ch)]
    decoded = 0
    while decoded < total:
        br = _MsbReader(payload, pos * 8)
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_assign = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _frame_no = _read_utf8_number(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 1:
            bs = 192
        else:
            raise ValueError("flac: reserved block size code")
        if sr_code in (0b1100, 0b1101, 0b1110):
            br.read(8 if sr_code == 0b1100 else 16)
        header_end_bits = br.pos
        head = payload[pos : header_end_bits // 8]
        crc8 = br.read(8)
        if _crc8(head) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        # frame sample-size code must be "from STREAMINFO" or agree
        # with it; a genuine per-frame override is a gate
        code_bits = {0b001: 8, 0b010: 12, 0b100: 16,
                     0b101: 20, 0b110: 24, 0b111: 32}
        if bps_code != 0 and code_bits.get(bps_code) != bps:
            raise NotImplementedError("flac: frame bps override unsupported")
        if chan_assign <= 7:
            n_sub = chan_assign + 1
            if n_sub != ch:
                raise ValueError("flac: channel count mismatch")
            subs = [_decode_subframe(br, bs, bps) for _ in range(n_sub)]
            outs = subs
        elif chan_assign == 8:  # left/side
            left = _decode_subframe(br, bs, bps)
            side = _decode_subframe(br, bs, bps + 1)
            outs = [left, left - side]
        elif chan_assign == 9:  # side/right
            side = _decode_subframe(br, bs, bps + 1)
            right = _decode_subframe(br, bs, bps)
            outs = [right + side, right]
        elif chan_assign == 10:  # mid/side
            mid = _decode_subframe(br, bs, bps)
            side = _decode_subframe(br, bs, bps + 1)
            left = ((mid << 1) | (side & 1)) + side
            outs = [left >> 1, (left >> 1) - side]
        else:
            raise ValueError("flac: reserved channel assignment")
        br.align()
        frame_bytes = payload[pos : br.pos // 8]
        (crc16,) = struct.unpack(">H", payload[br.pos // 8 : br.pos // 8 + 2])
        if _crc16(frame_bytes) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.pos // 8 + 2
        for c in range(ch):
            chans[c].extend(int(x) for x in outs[c])
        decoded += bs
    data = np.stack(
        [np.asarray(c[:total], dtype=np.int64) for c in chans], axis=-1
    )
    return sample_rate, ch, data.astype(np.int32 if bps > 16 else np.int16)
