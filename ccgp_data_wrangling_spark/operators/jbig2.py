"""JBIG2 (ITU-T T.88) — embedded generic regions, from scratch.

Scanned-document PDFs compress bitonal pages with one of two codecs:
CCITT Group 3/4 fax (already in ``media_codecs``) or JBIG2.  This
module implements the JBIG2 subset those PDFs actually need for the
*generic region* path, directly against the public spec:

* the **MQ arithmetic coder** (T.88 Annex E — the same coder JPEG 2000
  uses): the 47-state Qe probability table (Table E.1), the
  software-convention decoder (INITDEC / BYTEIN / DECODE, Figures
  E.15–E.19) and encoder (INITENC / CODEMPS / CODELPS / BYTEOUT /
  FLUSH, Figures E.5–E.11), implemented with the byte-stuffing rules
  around 0xFF bytes;
* **generic region decoding** (§6.2): arithmetic templates 0–3 with
  their adaptive (AT) pixels, TPGDON typical-prediction rows with the
  per-template SLTP contexts (0x9B25 / 0x0795 / 0x00E5 / 0x0195), and
  the MMR=1 branch which is T.6 two-dimensional coding — reusing
  ``media_codecs.decode_ccitt_g4``;
* the **embedded segment stream** organization PDF carries (§7.2
  segment headers; PDF 32000-1 §7.4.7 /JBIG2Decode): page information
  (type 48), immediate (lossless) generic regions (38/39), end of
  page / stripe / file (49/50/51), with the §8.2 page composition
  operators (OR / AND / XOR / XNOR / REPLACE);
* a **generic-region encoder** (the exact context model run forward
  through the MQ encoder) and an embedded-stream builder so fixtures
  are real JBIG2 bitstreams, not replayed buffers.

Out-of-scope segment kinds gate honestly with ``NotImplementedError``:
symbol dictionaries / text regions (type 0, 4–7), pattern/halftone
(16, 20–23), and refinement (40–43) are the OCR-oriented half of the
spec; the generic region is what scanner output uses.

Reference parity: the reference repo has no image pipeline at all —
this is north-star multimodal surface, same as the CCITT/JPEG work.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# MQ coder (T.88 Annex E)
# ---------------------------------------------------------------------------

# Table E.1 — (Qe, NMPS, NLPS, SWITCH) per state index.
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """T.88 E.3.2/E.3.4 software-convention decoder.

    Context state (index into Table E.1 + current MPS sense) is held
    per integer context label in caller-owned arrays so one decoder
    instance serves a whole region's 2**16 generic contexts. Bytes
    past the end of the buffer read as 0xFF (marker-terminated
    streams decode to completion, Figure E.19's B1 > 0x8F branch).
    """

    def __init__(self, data: bytes, n_contexts: int) -> None:
        self._d = data
        self.icx = np.zeros(n_contexts, np.uint8)
        self.mps = np.zeros(n_contexts, np.uint8)
        self._bp = 0
        b = self._byte(0)
        self._c = b << 16
        self._bytein()
        self._c = (self._c << 7) & 0xFFFFFFFF
        self._ct -= 7
        self._a = 0x8000

    def _byte(self, i: int) -> int:
        return self._d[i] if i < len(self._d) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self._bp) == 0xFF:
            if self._byte(self._bp + 1) > 0x8F:
                self._c += 0xFF00
                self._ct = 8
            else:
                self._bp += 1
                self._c += self._byte(self._bp) << 9
                self._ct = 7
        else:
            self._bp += 1
            self._c += self._byte(self._bp) << 8
            self._ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[self.icx[cx]]
        self._a -= qe
        if (self._c >> 16) < qe:
            # LPS exchange (Figure E.17)
            if self._a < qe:
                d = int(self.mps[cx])
                self.icx[cx] = nmps
            else:
                d = 1 - int(self.mps[cx])
                if switch:
                    self.mps[cx] ^= 1
                self.icx[cx] = nlps
            self._a = qe
        else:
            self._c -= qe << 16
            if self._a & 0x8000:
                return int(self.mps[cx])
            # MPS exchange (Figure E.18)
            if self._a < qe:
                d = 1 - int(self.mps[cx])
                if switch:
                    self.mps[cx] ^= 1
                self.icx[cx] = nlps
            else:
                d = int(self.mps[cx])
                self.icx[cx] = nmps
        # RENORMD (Figure E.18 tail)
        while True:
            if self._ct == 0:
                self._bytein()
            self._a = (self._a << 1) & 0xFFFF
            self._c = (self._c << 1) & 0xFFFFFFFF
            self._ct -= 1
            if self._a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 E.3.1/E.3.3 software-convention encoder (fixture side)."""

    def __init__(self, n_contexts: int) -> None:
        self.icx = np.zeros(n_contexts, np.uint8)
        self.mps = np.zeros(n_contexts, np.uint8)
        self._a = 0x8000
        self._c = 0
        self._ct = 12
        # out[0] is the notional byte before BPST (INITENC sets
        # BP = BPST - 1); it absorbs a first-byteout carry and is
        # dropped by flush().
        self._out = bytearray([0])

    def encode(self, cx: int, d: int) -> None:
        qe, nmps, nlps, switch = _QE[self.icx[cx]]
        if d == self.mps[cx]:
            # CODEMPS (Figure E.7)
            self._a -= qe
            if self._a & 0x8000:
                self._c += qe
                return
            if self._a < qe:
                self._a = qe
            else:
                self._c += qe
            self.icx[cx] = nmps
        else:
            # CODELPS (Figure E.6)
            self._a -= qe
            if self._a < qe:
                self._c += qe
            else:
                self._a = qe
            if switch:
                self.mps[cx] ^= 1
            self.icx[cx] = nlps
        # RENORME (Figure E.8)
        while True:
            self._a = (self._a << 1) & 0xFFFF
            self._c = (self._c << 1) & 0xFFFFFFFF
            self._ct -= 1
            if self._ct == 0:
                self._byteout()
            if self._a & 0x8000:
                break

    def _byteout(self) -> None:
        # Figure E.9 with the 0xFF bit-stuffing branches.
        out = self._out
        if out[-1] == 0xFF:
            out.append((self._c >> 20) & 0x7F)
            self._c &= 0xFFFFF
            self._ct = 7
        elif self._c < 0x8000000:
            out.append((self._c >> 19) & 0xFF)
            self._c &= 0x7FFFF
            self._ct = 8
        else:
            out[-1] += 1  # carry into the previous byte
            if out[-1] == 0xFF:
                self._c &= 0x7FFFFFF
                out.append((self._c >> 20) & 0x7F)
                self._c &= 0xFFFFF
                self._ct = 7
            else:
                out.append((self._c >> 19) & 0xFF)
                self._c &= 0x7FFFF
                self._ct = 8

    def flush(self) -> bytes:
        # SETBITS + FLUSH (Figures E.10/E.11).
        tempc = self._c + self._a - 1
        self._c |= 0xFFFF
        if self._c >= tempc:
            self._c -= 0x8000
        self._c = (self._c << self._ct) & 0xFFFFFFFF
        self._byteout()
        self._c = (self._c << self._ct) & 0xFFFFFFFF
        self._byteout()
        out = self._out
        # discard trailing 0xFF bytes (decoder re-synthesizes them),
        # then the spec's optional 0xFF 0xAC terminator
        while out and out[-1] == 0xFF:
            out.pop()
        out += b"\xff\xac"
        if out[0] != 0:
            raise AssertionError("MQ carry escaped the stream head")
        return bytes(out[1:])


# ---------------------------------------------------------------------------
# Generic region (T.88 §6.2): context templates + TPGDON
# ---------------------------------------------------------------------------

# Per-template pixel taps as (dx, dy, shift) with AT slots marked by
# index into the at list. Ordering follows §6.2.5.7's CONTEXT
# composition (low bit = nearest neighbour (x-1, y)).
_NOMINAL_AT = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}

_SLTP_CX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}

_CX_BITS = {0: 16, 1: 13, 2: 10, 3: 10}


def _template_taps(
    template: int, at: tuple[tuple[int, int], ...]
) -> list[tuple[int, int]]:
    """Tap list in shift order (index == context bit position)."""
    if template == 0:
        a1, a2, a3, a4 = at
        return [
            (-1, 0), (-2, 0), (-3, 0), (-4, 0), a1,
            (2, -1), (1, -1), (0, -1), (-1, -1), (-2, -1), a2,
            a3, (1, -2), (0, -2), (-1, -2), a4,
        ]
    if template == 1:
        (a1,) = at
        return [
            (-1, 0), (-2, 0), (-3, 0), a1,
            (2, -1), (1, -1), (0, -1), (-1, -1), (-2, -1),
            (2, -2), (1, -2), (0, -2), (-1, -2),
        ]
    if template == 2:
        (a1,) = at
        return [
            (-1, 0), (-2, 0), a1,
            (1, -1), (0, -1), (-1, -1), (-2, -1),
            (1, -2), (0, -2), (-1, -2),
        ]
    if template == 3:
        (a1,) = at
        return [
            (-1, 0), (-2, 0), (-3, 0), (-4, 0), a1,
            (1, -1), (0, -1), (-1, -1), (-2, -1), (-3, -1),
        ]
    raise ValueError(f"GBTEMPLATE {template}")


_PAD = 8  # zero border; AT offsets are validated against it


def _check_at(at: tuple[tuple[int, int], ...]) -> None:
    for dx, dy in at:
        if abs(dx) > _PAD or abs(dy) > _PAD:
            raise NotImplementedError(
                f"AT pixel offset ({dx},{dy}) beyond the ±{_PAD} "
                "fast-path border"
            )
        if dy > 0 or (dy == 0 and dx >= 0):
            # T.88 permits these (they read as 0); our encoder would
            # read true future pixels and diverge, so gate.
            raise NotImplementedError(
                f"AT pixel ({dx},{dy}) references undecoded pixels"
            )


def decode_generic_region(
    data: bytes,
    width: int,
    height: int,
    template: int = 0,
    tpgdon: bool = False,
    at: tuple[tuple[int, int], ...] | None = None,
) -> np.ndarray:
    """Arithmetic generic region decode → (h, w) boolean black-mask
    (JBIG2 1-pixels are foreground/black). §6.2.5.7 row loop with
    TPGDON SLTP handling."""
    at = tuple(at) if at is not None else _NOMINAL_AT[template]
    _check_at(at)
    taps = _template_taps(template, at)
    dec = MQDecoder(data, 1 << _CX_BITS[template])
    sltp_cx = _SLTP_CX[template]
    pad = _PAD
    img = np.zeros((height + 2 * pad, width + 2 * pad), np.uint8)
    ltp = 0
    for y in range(height):
        if tpgdon:
            ltp ^= dec.decode(sltp_cx)
            if ltp:
                img[pad + y] = img[pad + y - 1]
                continue
        row = img[pad + y]
        for x in range(width):
            cx = 0
            for shift, (dx, dy) in enumerate(taps):
                cx |= int(img[pad + y + dy, pad + x + dx]) << shift
            row[pad + x] = dec.decode(cx)
    return img[pad : pad + height, pad : pad + width].astype(bool)


def encode_generic_region(
    black: np.ndarray,
    template: int = 0,
    tpgdon: bool = False,
    at: tuple[tuple[int, int], ...] | None = None,
) -> bytes:
    """Run the §6.2.5.7 context model forward through the MQ encoder.
    With TPGDON, rows equal to the previous row are signalled typical
    (SLTP toggles LTP) and not coded — the decoder copies them."""
    at = tuple(at) if at is not None else _NOMINAL_AT[template]
    _check_at(at)
    taps = _template_taps(template, at)
    enc = MQEncoder(1 << _CX_BITS[template])
    sltp_cx = _SLTP_CX[template]
    pad = _PAD
    height, width = black.shape
    img = np.zeros((height + 2 * pad, width + 2 * pad), np.uint8)
    img[pad : pad + height, pad : pad + width] = black
    ltp = 0
    for y in range(height):
        if tpgdon:
            typical = y > 0 and bool(
                np.array_equal(img[pad + y], img[pad + y - 1])
            )
            want = 1 if typical else 0
            enc.encode(sltp_cx, ltp ^ want)
            ltp = want
            if ltp:
                continue
        for x in range(width):
            cx = 0
            for shift, (dx, dy) in enumerate(taps):
                cx |= int(img[pad + y + dy, pad + x + dx]) << shift
            enc.encode(cx, int(img[pad + y, pad + x]))
    return enc.flush()


# ---------------------------------------------------------------------------
# Embedded segment stream (§7.2) — the organization PDF carries
# ---------------------------------------------------------------------------

_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36

_GATED_SEGMENTS = {
    0: "symbol dictionary",
    4: "intermediate text region",
    5: "immediate text region",
    6: "immediate lossless text region",
    7: "immediate text region (type 7)",
    16: "pattern dictionary",
    20: "intermediate halftone region",
    22: "immediate halftone region",
    23: "immediate lossless halftone region",
    40: "intermediate refinement region",
    42: "immediate refinement region",
    43: "immediate lossless refinement region",
}


def parse_jbig2_segments(buf: bytes) -> list[dict]:
    """Walk §7.2 segment headers → [{number, type, refs, page,
    data}]. The embedded (PDF) organization has no file header and no
    random-access layout: each header is immediately followed by its
    data."""
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 11 > n:
            raise ValueError("truncated JBIG2 segment header")
        number, flags = struct.unpack_from(">IB", buf, pos)
        pos += 5
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        # referred-to segment count + retain bits (§7.2.4)
        first = buf[pos]
        count = first >> 5
        if count == 7:
            count = struct.unpack_from(">I", buf, pos)[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # retain bits, incl. self
        else:
            pos += 1
        # referred-to segment numbers (§7.2.5): size keyed to OUR number
        if number <= 256:
            rsize = 1
        elif number <= 65536:
            rsize = 2
        else:
            rsize = 4
        refs = []
        for _ in range(count):
            refs.append(
                int.from_bytes(buf[pos : pos + rsize], "big")
            )
            pos += rsize
        if page_assoc_4:
            page = struct.unpack_from(">I", buf, pos)[0]
            pos += 4
        else:
            page = buf[pos]
            pos += 1
        (dlen,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise NotImplementedError(
                "JBIG2 unknown-length segment data (§7.2.7)"
            )
        if pos + dlen > n:
            raise ValueError("JBIG2 segment data overruns the stream")
        out.append(
            {
                "number": number,
                "type": seg_type,
                "refs": refs,
                "page": page,
                "data": buf[pos : pos + dlen],
            }
        )
        pos += dlen
    return out


def _decode_region_segment(data: bytes) -> dict:
    """§7.4.6 generic region segment data part → decoded bitmap +
    placement. Region segment info (§7.4.1) is the common 17-byte
    prefix."""
    w, h, x, y = struct.unpack_from(">IIII", data, 0)
    comb_op = data[16] & 0x07
    flags = data[17]
    mmr = flags & 1
    template = (flags >> 1) & 3
    tpgdon = bool(flags & 8)
    pos = 18
    if not mmr:
        n_at = 4 if template == 0 else 1
        at = []
        for _ in range(n_at):
            dx = struct.unpack_from(">b", data, pos)[0]
            dy = struct.unpack_from(">b", data, pos + 1)[0]
            at.append((dx, dy))
            pos += 2
        bitmap = decode_generic_region(
            data[pos:], w, h, template, tpgdon, tuple(at)
        )
    else:
        from ccgp_data_wrangling_spark.operators.media_codecs import (
            decode_ccitt_g4,
        )

        bitmap = decode_ccitt_g4(data[pos:], w, h)
    return {
        "x": x,
        "y": y,
        "comb_op": comb_op,
        "bitmap": bitmap,
        "mmr": bool(mmr),
        "template": template,
        "tpgdon": tpgdon,
    }


def _compose(page: np.ndarray, reg: dict) -> None:
    """§8.2 external combination operators onto the page bitmap."""
    x, y, bm = reg["x"], reg["y"], reg["bitmap"]
    h, w = bm.shape
    tgt = page[y : y + h, x : x + w]
    if tgt.shape != bm.shape:
        raise ValueError("JBIG2 region exceeds the page bitmap")
    op = reg["comb_op"]
    if op == 0:
        tgt |= bm
    elif op == 1:
        tgt &= bm
    elif op == 2:
        tgt ^= bm
    elif op == 3:
        tgt[...] = ~(tgt ^ bm)
    elif op == 4:
        tgt[...] = bm
    else:
        raise ValueError(f"JBIG2 combination operator {op}")


def decode_jbig2_embedded(
    buf: bytes, globals_buf: bytes = b""
) -> dict:
    """Decode a PDF-embedded JBIG2 stream (PDF 32000-1 §7.4.7) to its
    page-1 bitmap. ``globals_buf`` is the /JBIG2Globals stream; only
    page-0 page-info segments may live there for the generic-region
    subset (symbol dictionaries gate)."""
    segments = parse_jbig2_segments(globals_buf) + parse_jbig2_segments(
        buf
    )
    page_w = page_h = None
    page: np.ndarray | None = None
    default_pixel = 0
    regions: list[dict] = []
    for seg in segments:
        t = seg["type"]
        if t == _SEG_PAGE_INFO:
            page_w, page_h, _xres, _yres = struct.unpack_from(
                ">IIII", seg["data"], 0
            )
            pflags = seg["data"][16]
            default_pixel = (pflags >> 2) & 1
            if page_h == 0xFFFFFFFF:
                page_h = None  # striped page: grow to region extent
        elif t in (
            _SEG_GENERIC_IMMEDIATE,
            _SEG_GENERIC_IMMEDIATE_LOSSLESS,
        ):
            regions.append(_decode_region_segment(seg["data"]))
        elif t == _SEG_GENERIC_INTERMEDIATE:
            raise NotImplementedError(
                "intermediate generic region (auxiliary buffers)"
            )
        elif t in (
            _SEG_END_OF_PAGE,
            _SEG_END_OF_STRIPE,
            _SEG_END_OF_FILE,
            62,  # extension
            52,  # profiles
            53,  # custom tables (only meaningful with gated kinds)
        ):
            continue
        elif t in _GATED_SEGMENTS:
            raise NotImplementedError(
                f"JBIG2 {_GATED_SEGMENTS[t]} segment"
            )
        else:
            raise ValueError(f"JBIG2 segment type {t}")
    if page_w is None:
        raise ValueError("JBIG2 stream has no page information segment")
    if page_h is None:
        page_h = max((r["y"] + r["bitmap"].shape[0] for r in regions),
                     default=0)
    page = np.full((page_h, page_w), bool(default_pixel))
    for reg in regions:
        _compose(page, reg)
    return {
        "width": page_w,
        "height": page_h,
        "black": page,
        "n_regions": len(regions),
    }


# ---------------------------------------------------------------------------
# Embedded-stream builder (fixture side)
# ---------------------------------------------------------------------------


def _segment(number: int, seg_type: int, page: int, data: bytes) -> bytes:
    """§7.2 header with no referred-to segments, 1-byte page assoc."""
    return (
        struct.pack(">IB", number, seg_type & 0x3F)
        + b"\x00"  # referred-to count 0, retain bits 0
        + struct.pack(">B", page)
        + struct.pack(">I", len(data))
        + data
    )


def build_jbig2_embedded(
    regions: list[tuple[np.ndarray, int, int]] | np.ndarray,
    page_wh: tuple[int, int] | None = None,
    template: int = 0,
    tpgdon: bool = False,
    mmr: bool = False,
    at: tuple[tuple[int, int], ...] | None = None,
    comb_op: int = 0,
    default_pixel: int = 0,
) -> bytes:
    """Build the PDF-embedded segment stream: page info (48) + one
    immediate lossless generic region (39) per bitmap + end of page
    (49). ``regions`` is a black-mask or a list of (mask, x, y)."""
    if isinstance(regions, np.ndarray):
        regions = [(regions, 0, 0)]
    if page_wh is None:
        page_wh = (
            max(x + bm.shape[1] for bm, x, y in regions),
            max(y + bm.shape[0] for bm, x, y in regions),
        )
    pw, ph = page_wh
    page_data = struct.pack(">IIII", pw, ph, 0, 0)
    page_data += bytes([(default_pixel & 1) << 2])
    page_data += struct.pack(">H", 0)  # not striped
    out = _segment(0, _SEG_PAGE_INFO, 1, page_data)
    at = tuple(at) if at is not None else _NOMINAL_AT[template]
    for i, (bm, x, y) in enumerate(regions):
        h, w = bm.shape
        body = struct.pack(">IIII", w, h, x, y)
        body += bytes([comb_op & 7])
        flags = (1 if mmr else 0) | ((template & 3) << 1) | (
            8 if tpgdon else 0
        )
        body += bytes([flags])
        if mmr:
            from ccgp_data_wrangling_spark.operators.media_codecs import (
                encode_ccitt_g4,
            )

            body += encode_ccitt_g4(bm)
        else:
            for dx, dy in at:
                body += struct.pack(">bb", dx, dy)
            body += encode_generic_region(bm, template, tpgdon, at)
        out += _segment(
            1 + i, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, body
        )
    out += _segment(1 + len(regions), _SEG_END_OF_PAGE, 1, b"")
    return out
