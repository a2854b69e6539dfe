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
* **symbol dictionaries + text regions** (§6.5/§6.4) — the coding
  real scanned-PDF encoders emit for text areas: Annex A arithmetic
  integer procedures (IADH/IADW/IAEX/IADT/IAFS/IADS and the IAID
  symbol-code trees), height-class symbol decode over shared GB
  contexts, §6.5.10 export runs, and strip-based instance placement
  with all four REFCORNER codings;
* **pattern dictionaries + halftone regions** (§6.7/§6.6) — the
  grayscale-stamping path for dithered photo areas: the collective
  pattern bitmap with its A1 = (−HDPW, 0) adaptive pixel, Annex C.5
  Gray-coded bitplane decoding, and 8.8 fixed-point grid stamping;
* **generic refinement regions** (§6.3) — re-coding a bitmap against
  the page content under the region box (templates 0/1, TPGRON
  typical prediction, displaced references);
* the **embedded segment stream** organization PDF carries (§7.2
  segment headers; PDF 32000-1 §7.4.7 /JBIG2Decode): page information
  (type 48), immediate (lossless) generic regions (38/39), end of
  page / stripe / file (49/50/51), with the §8.2 page composition
  operators (OR / AND / XOR / XNOR / REPLACE);
* **encoders for every implemented region kind** (the exact context
  models run forward through the MQ encoder) and embedded-stream
  builders, so fixtures are real JBIG2 bitstreams, not replayed
  buffers.

Every region family of the spec decodes, including all eight text
placement codings (4 REFCORNERs × TRANSPOSED), BOTH symbol
dictionary coding alternatives — arithmetic and SDHUFF=1 (Annex B
standard tables B.1–B.5, Kraft-asserted at import, plus CUSTOM
type-53 table segments parsed per B.2 and consumed by selector
order, with §6.5.9 MMR/uncompressed collective bitmaps) — and
refinement INSIDE text regions (SBREFINE, §6.4.11: per-instance
IARI-gated RDW/RDH/RDX/RDY headers re-coding the instance against
its symbol with shared GR stats), and SBHUFF=1 text regions (the
§7.4.4.1.1.1 runcode symbol-ID table, Huffman FS/DS/DT strip reads
through referred custom tables, raw CURT bits, byte-aligned
per-instance MQ refinement blocks). SDREFAGG dictionaries decode in
both forms: single-instance (§6.5.8.2: IAAI=1 → IAID/IARDX/IARDY +
refinement of an earlier symbol) and REFAGGNINST > 1 (§6.5.8.2.1: a
full §6.4 text region nested inside the dictionary — SBSTRIPS=1, TL
corner, OR, REFINE=1 — over the dictionary's persistent integer
contexts, instances optionally IARI-refined). The remaining honest
``NotImplementedError`` gates are coding-variant tails: the
UNTRANSCRIBED standard tables B.6–B.15 (SBHUFF selectors 0–2 —
custom type-53 tables decode), SDHUFF+SDREFAGG,
unknown-length MMR regions (0x00 0x00 can occur mid-stream), and
intermediate regions (auxiliary-buffer composition). HENABLESKIP halftones decode (USESKIP pixels carry no
coded bits), and §7.2.7 unknown-length arithmetic generic regions
resolve through the stuffing-guaranteed 0xFF 0xAC terminator plus
trailing row count.

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

# Qe column alone: the decode/encode fast paths (MPS, no renorm —
# the bulk of all decisions) need only Qe, so they index this flat
# tuple and defer the full 4-way unpack to the exchange/renorm path.
_QE_Q = tuple(q[0] for q in _QE)


class ArithStats:
    """One bank of adaptive contexts (Table E.1 index + MPS sense).

    A JBIG2 segment runs SEVERAL independent banks over ONE MQ coder
    stream — the GB generic contexts plus an IAx bank per Annex A
    integer procedure — so the banks live outside the coder."""

    __slots__ = ("icx", "mps")

    def __init__(self, n: int) -> None:
        # bytearrays, not numpy: these are read/written one scalar at
        # a time from the per-bit coder loops, where ndarray scalar
        # indexing costs ~5x a bytearray access
        self.icx = bytearray(n)
        self.mps = bytearray(n)


class MQDecoder:
    """T.88 E.3.2/E.3.4 software-convention decoder.

    ``decode(cx)`` uses the default bank sized at construction;
    ``decode(cx, stats)`` uses a caller-owned :class:`ArithStats`
    bank (how one segment stream serves generic + integer contexts).
    Bytes past the end of the buffer read as 0xFF (marker-terminated
    streams decode to completion, Figure E.19's B1 > 0x8F branch).
    """

    __slots__ = ("_d", "_default", "_bp", "_c", "_a", "_ct")

    def __init__(self, data: bytes, n_contexts: int = 1) -> None:
        self._d = data
        self._default = ArithStats(n_contexts)
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

    def decode(self, cx: int, stats: ArithStats | None = None) -> int:
        st = stats if stats is not None else self._default
        icx = st.icx
        k = icx[cx]
        qe = _QE_Q[k]
        a = self._a - qe
        c = self._c
        if (c >> 16) >= qe:
            c -= qe << 16
            if a & 0x8000:
                # MPS, no renorm — the dominant path: one flat Qe
                # lookup, no table unpack, no mps[] write
                self._a = a
                self._c = c
                return st.mps[cx]
            # MPS exchange (Figure E.18)
            mps = st.mps
            nmps, nlps, switch = _QE[k][1:]
            if a < qe:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] ^= 1
                icx[cx] = nlps
            else:
                d = mps[cx]
                icx[cx] = nmps
        else:
            # LPS exchange (Figure E.17)
            mps = st.mps
            nmps, nlps, switch = _QE[k][1:]
            if a < qe:
                d = mps[cx]
                icx[cx] = nmps
            else:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] ^= 1
                icx[cx] = nlps
            a = qe
        # RENORMD (Figure E.18 tail)
        ct = self._ct
        while True:
            if ct == 0:
                self._c = c
                self._bytein()
                c = self._c
                ct = self._ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self._a = a
        self._c = c
        self._ct = ct
        return d


class MQEncoder:
    """T.88 E.3.1/E.3.3 software-convention encoder (fixture side).

    ``encode(cx, d)`` uses the default bank; ``encode(cx, d, stats)``
    a caller-owned bank, mirroring :class:`MQDecoder`."""

    __slots__ = ("_default", "_a", "_c", "_ct", "_out")

    def __init__(self, n_contexts: int = 1) -> None:
        self._default = ArithStats(n_contexts)
        self._a = 0x8000
        self._c = 0
        self._ct = 12
        # out[0] is the notional byte before BPST (INITENC sets
        # BP = BPST - 1); it absorbs a first-byteout carry and is
        # dropped by flush().
        self._out = bytearray([0])

    def encode(
        self, cx: int, d: int, stats: ArithStats | None = None
    ) -> None:
        st = stats if stats is not None else self._default
        icx = st.icx
        k = icx[cx]
        qe = _QE_Q[k]
        a = self._a - qe
        if d == st.mps[cx]:
            # CODEMPS (Figure E.7)
            if a & 0x8000:
                # MPS, no renorm — dominant path, Qe lookup only
                self._a = a
                self._c += qe
                return
            nmps = _QE[k][1]
            if a < qe:
                a = qe
            else:
                self._c += qe
            icx[cx] = nmps
        else:
            # CODELPS (Figure E.6)
            nlps, switch = _QE[k][2:]
            if a < qe:
                self._c += qe
            else:
                a = qe
            if switch:
                st.mps[cx] ^= 1
            icx[cx] = nlps
        # RENORME (Figure E.8)
        c = self._c
        ct = self._ct
        while True:
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if ct == 0:
                self._c = c
                self._ct = ct
                self._byteout()
                c = self._c
                ct = self._ct
            if a & 0x8000:
                break
        self._a = a
        self._c = c
        self._ct = ct

    def _byteout(self) -> None:
        # Figure E.9 with the 0xFF bit-stuffing branches.
        out = self._out
        if out[-1] == 0xFF:
            # the stuffed byte is C bits 27..20 UNMASKED: bit 27 is a
            # pending carry that must ride the stuffed byte's MSB
            # (value ≤ 0x8F by the register bound — exactly why the
            # decoder's marker test is "B1 > 0x8F"); masking to 0x7F
            # here silently dropped rare carries on skewed streams
            out.append((self._c >> 20) & 0xFF)
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

    def tell(self) -> int:
        """Bytes emitted so far, excluding the notional pre-BPST byte
        (pending carry / partial bits not yet byte-out are excluded).
        JPEG 2000's Tier-2 layer assembly uses this to pick per-layer
        codeword split points at coding-pass boundaries."""
        return len(self._out) - 1

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


def _taps_pad(taps: list[tuple[int, int]]) -> int:
    """Zero-border width covering every tap (the pattern dictionary's
    A1 = (−HDPW, 0) reaches arbitrarily far left, §6.7.5)."""
    return 1 + max(max(abs(dx), abs(dy)) for dx, dy in taps)


def _check_at(at: tuple[tuple[int, int], ...]) -> None:
    for dx, dy in at:
        if dy > 0 or (dy == 0 and dx >= 0):
            # T.88 permits these (they read as 0); our encoder would
            # read true future pixels and diverge, so gate.
            raise NotImplementedError(
                f"AT pixel ({dx},{dy}) references undecoded pixels"
            )


def _decode_generic_bitmap(
    dec: MQDecoder,
    gb: ArithStats,
    width: int,
    height: int,
    template: int,
    tpgdon: bool,
    at: tuple[tuple[int, int], ...],
    skip: "np.ndarray | None" = None,
) -> np.ndarray:
    """§6.2.5.7 row loop over an ALREADY-RUNNING coder and GB context
    bank (symbol dictionaries decode many bitmaps through one).
    ``skip`` pixels (USESKIP, §6.2.5.7 step 3(c)(ii)) are 0 and not
    coded — the halftone HENABLESKIP path."""
    taps = _template_taps(template, at)
    sltp_cx = _SLTP_CX[template]
    pad = _taps_pad(taps)
    # rows as Python bytearrays: the decode loop reads/writes single
    # pixels, where ndarray scalar access costs ~5x a bytearray's.
    # Taps on COMPLETED rows (dy < 0) are summed per row into a
    # "static" context vector with vectorized numpy shifts; only the
    # current-row taps (dy == 0, always dx < 0 — _check_at gates the
    # rest) are read pixel-by-pixel. Context values and decoded bits
    # are identical to the per-tap loop this replaces.
    w2 = width + 2 * pad
    rows = [bytearray(w2) for _ in range(height + 2 * pad)]
    above = [(dx, dy, shift) for shift, (dx, dy) in enumerate(taps)
             if dy < 0]
    cur = [(dx, shift) for shift, (dx, dy) in enumerate(taps)
           if dy == 0]
    decode = dec.decode
    ltp = 0
    if width < 32:
        # narrow bitmaps (halftone patterns, small glyphs): the
        # per-row numpy setup below costs more than the row itself —
        # read every tap scalar-wise from the padded bytearrays
        # instead. Same taps, same contexts, same decoded bits.
        by_dy: dict[int, list[tuple[int, int]]] = {}
        for shift, (dx, dy) in enumerate(taps):
            by_dy.setdefault(dy, []).append((dx, shift))
        groups = sorted(by_dy.items())
        for y in range(height):
            if tpgdon:
                ltp ^= decode(sltp_cx, gb)
                if ltp:
                    rows[pad + y][:] = rows[pad + y - 1]
                    continue
            row = rows[pad + y]
            gr = [(rows[pad + y + dy], dxs) for dy, dxs in groups]
            srow = None if skip is None else skip[y].tolist()
            for x in range(width):
                if srow is not None and srow[x]:
                    continue  # stays 0, no bit coded
                xx = pad + x
                cx = 0
                for r, dxs in gr:
                    for dx, shift in dxs:
                        cx |= r[xx + dx] << shift
                row[xx] = decode(cx, gb)
        out = np.frombuffer(
            b"".join(rows[pad : pad + height]), np.uint8
        ).reshape(height, w2)
        return out[:, pad : pad + width].astype(bool)
    static = np.zeros(width, np.int64)
    for y in range(height):
        if tpgdon:
            ltp ^= decode(sltp_cx, gb)
            if ltp:
                rows[pad + y][:] = rows[pad + y - 1]
                continue
        static[:] = 0
        for dx, dy, shift in above:
            src = np.frombuffer(
                rows[pad + y + dy], np.uint8
            )[pad + dx : pad + dx + width].astype(np.int64)
            static += src << shift
        stat = static.tolist()
        row = rows[pad + y]
        if skip is None:
            for x in range(width):
                cx = stat[x]
                xx = pad + x
                for dx, shift in cur:
                    cx |= row[xx + dx] << shift
                row[xx] = decode(cx, gb)
        else:
            srow = skip[y].tolist()
            for x in range(width):
                if srow[x]:
                    continue  # stays 0, no bit coded
                cx = stat[x]
                xx = pad + x
                for dx, shift in cur:
                    cx |= row[xx + dx] << shift
                row[xx] = decode(cx, gb)
    out = np.frombuffer(
        b"".join(rows[pad : pad + height]), np.uint8
    ).reshape(height, w2)
    return out[:, pad : pad + width].astype(bool)


def _encode_generic_bitmap(
    enc: MQEncoder,
    gb: ArithStats,
    black: np.ndarray,
    template: int,
    tpgdon: bool,
    at: tuple[tuple[int, int], ...],
    skip: "np.ndarray | None" = None,
) -> None:
    """Forward context model over a shared encoder + GB bank."""
    taps = _template_taps(template, at)
    sltp_cx = _SLTP_CX[template]
    pad = _taps_pad(taps)
    height, width = black.shape
    encode = enc.encode
    if width < 32:
        # narrow bitmaps (halftone patterns, small glyphs): the
        # whole-bitmap vectorization below has fixed numpy cost per
        # tap that exceeds the scalar work — mirror the decoder's
        # narrow path instead. Same contexts, same coded decisions.
        w2 = width + 2 * pad
        rows = [bytearray(w2) for _ in range(height + 2 * pad)]
        bb = black.astype(np.uint8)
        for y in range(height):
            rows[pad + y][pad : pad + width] = bb[y].tobytes()
        by_dy: dict[int, list[tuple[int, int]]] = {}
        for shift, (dx, dy) in enumerate(taps):
            by_dy.setdefault(dy, []).append((dx, shift))
        groups = sorted(by_dy.items())
        ltp = 0
        for y in range(height):
            row = rows[pad + y]
            if tpgdon:
                typical = y > 0 and row == rows[pad + y - 1]
                want = 1 if typical else 0
                encode(sltp_cx, ltp ^ want, gb)
                ltp = want
                if ltp:
                    continue
            gr = [(rows[pad + y + dy], dxs) for dy, dxs in groups]
            srow = None if skip is None else skip[y].tolist()
            for x in range(width):
                xx = pad + x
                if srow is not None and srow[x]:
                    if row[xx]:
                        raise ValueError("skip pixel must be 0")
                    continue
                cx = 0
                for r, dxs in gr:
                    for dx, shift in dxs:
                        cx |= r[xx + dx] << shift
                encode(cx, row[xx], gb)
        return
    img = np.zeros((height + 2 * pad, width + 2 * pad), np.uint8)
    img[pad : pad + height, pad : pad + width] = black
    # the whole bitmap is known up front, so the per-pixel context
    # values can be computed for EVERY pixel at once with vectorized
    # shifted adds (one per tap), leaving only the sequential MQ
    # encode calls in the Python loop. Identical context values and
    # coded decisions to the per-tap scalar loop this replaces.
    cximg = np.zeros((height, width), np.int64)
    for shift, (dx, dy) in enumerate(taps):
        cximg += (
            img[
                pad + dy : pad + dy + height,
                pad + dx : pad + dx + width,
            ].astype(np.int64)
            << shift
        )
    cxrows = cximg.tolist()
    bitrows = black.astype(np.uint8).tolist()
    encode = enc.encode
    ltp = 0
    for y in range(height):
        if tpgdon:
            typical = y > 0 and bool(
                np.array_equal(img[pad + y], img[pad + y - 1])
            )
            want = 1 if typical else 0
            encode(sltp_cx, ltp ^ want, gb)
            ltp = want
            if ltp:
                continue
        cxrow = cxrows[y]
        bitrow = bitrows[y]
        if skip is None:
            for x in range(width):
                encode(cxrow[x], bitrow[x], gb)
        else:
            srow = skip[y].tolist()
            for x in range(width):
                if srow[x]:
                    if bitrow[x]:
                        raise ValueError("skip pixel must be 0")
                    continue
                encode(cxrow[x], bitrow[x], gb)


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
    dec = MQDecoder(data)
    gb = ArithStats(1 << _CX_BITS[template])
    return _decode_generic_bitmap(
        dec, gb, width, height, template, tpgdon, at
    )


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
    enc = MQEncoder()
    gb = ArithStats(1 << _CX_BITS[template])
    _encode_generic_bitmap(enc, gb, black, template, tpgdon, at)
    return enc.flush()


# ---------------------------------------------------------------------------
# Annex A — arithmetic integer + symbol-ID decoding (IAx / IAID)
# ---------------------------------------------------------------------------

# (prefix-length, value-bits, offset) ladder of A.2 step 2
_IA_RANGES = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436))

OOB = object()  # A.2's out-of-band marker (ends IADW/IADS runs)


class _IntDecoder:
    """One Annex A integer decoding procedure: a 512-context bank
    whose context label is the PREV bit-history register (A.2)."""

    def __init__(self) -> None:
        self.stats = ArithStats(512)

    def _bit(self, dec: MQDecoder, prev: int) -> tuple[int, int]:
        bit = dec.decode(prev, self.stats)
        if prev < 256:
            prev = (prev << 1) | bit
        else:
            prev = ((((prev << 1) | bit) & 511) | 256)
        return bit, prev

    def decode(self, dec: MQDecoder):
        # _bit inlined (the A.2 PREV register update): two Python
        # calls per bit showed up in the symbol/text-region profiles
        d = dec.decode
        st = self.stats
        prev = 1
        s = d(prev, st)
        prev = (prev << 1) | s
        for i, (nbits, offset) in enumerate(_IA_RANGES):
            if i < len(_IA_RANGES) - 1:
                more = d(prev, st)
                prev = (
                    ((prev << 1) | more)
                    if prev < 256
                    else ((((prev << 1) | more) & 511) | 256)
                )
                if more:
                    continue
            v = 0
            for _ in range(nbits):
                bit = d(prev, st)
                prev = (
                    ((prev << 1) | bit)
                    if prev < 256
                    else ((((prev << 1) | bit) & 511) | 256)
                )
                v = (v << 1) | bit
            v += offset
            if s and v == 0:
                return OOB  # A.2 step 4
            return -v if s else v
        raise AssertionError("unreachable")


class _IntEncoder:
    """Inverse of :class:`_IntDecoder` (fixture side)."""

    def __init__(self) -> None:
        self.stats = ArithStats(512)

    def _bit(self, enc: MQEncoder, prev: int, bit: int) -> int:
        enc.encode(prev, bit, self.stats)
        if prev < 256:
            return (prev << 1) | bit
        return (((prev << 1) | bit) & 511) | 256

    def encode(self, enc: MQEncoder, value) -> None:
        prev = 1
        if value is OOB:
            s, v = 1, 0
        else:
            s = 1 if value < 0 else 0
            v = -value if value < 0 else value
            if s and v == 0:
                raise ValueError("-0 is not encodable (means OOB)")
        prev = self._bit(enc, prev, s)
        for i, (nbits, offset) in enumerate(_IA_RANGES):
            last = i == len(_IA_RANGES) - 1
            hi = (offset + (1 << nbits)) if not last else None
            if not last and v >= hi:
                prev = self._bit(enc, prev, 1)
                continue
            if not last:
                prev = self._bit(enc, prev, 0)
            rem = v - offset
            for k in range(nbits - 1, -1, -1):
                prev = self._bit(enc, prev, (rem >> k) & 1)
            return


def _decode_iaid(
    dec: MQDecoder, stats: ArithStats, symcodelen: int
) -> int:
    """A.3 — symbol ID: SYMCODELEN bits through a tree of contexts."""
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | dec.decode(prev, stats)
    return prev - (1 << symcodelen)


def _encode_iaid(
    enc: MQEncoder, stats: ArithStats, symcodelen: int, value: int
) -> None:
    prev = 1
    for k in range(symcodelen - 1, -1, -1):
        bit = (value >> k) & 1
        enc.encode(prev, bit, stats)
        prev = (prev << 1) | bit


# ---------------------------------------------------------------------------
# Annex B — standard Huffman tables (the SDHUFF=1 coding legacy
# scanner encoders emit for symbol dictionaries). A table is a list
# of lines (preflen, rangelen, rangelow, kind); codes are assigned
# canonically by prefix length in table order (B.3's procedure), and
# each table asserts Kraft completeness at import so a transcription
# slip in any prefix length fails loudly.
# ---------------------------------------------------------------------------


class HuffTable:
    """One Annex B table: MSB-first prefix decode + range offset."""

    def __init__(self, lines: list[tuple]) -> None:
        self.lines = lines
        counts: dict[int, int] = {}
        for ln in lines:
            counts[ln[0]] = counts.get(ln[0], 0) + 1
        kraft = sum(n / (1 << plen) for plen, n in counts.items())
        if abs(kraft - 1.0) > 1e-12:
            raise AssertionError(
                f"Huffman table is not Kraft-complete ({kraft})"
            )
        # canonical assignment (B.3): increasing preflen, table order
        self.codes: list[int] = [0] * len(lines)
        code = 0
        prev_len = 0
        order = sorted(
            range(len(lines)), key=lambda i: (lines[i][0], i)
        )
        for i in order:
            plen = lines[i][0]
            code <<= plen - prev_len
            self.codes[i] = code
            code += 1
            prev_len = plen
        # (preflen, code) -> line, for O(1) decode instead of an
        # O(lines) scan per candidate prefix length; canonical
        # assignment makes every (preflen, code) pair unique
        self._by_code: dict[tuple[int, int], tuple] = {
            (lines[i][0], self.codes[i]): lines[i]
            for i in range(len(lines))
        }

    def decode(self, reader: "_HuffReader"):
        by_code = self._by_code
        bit = reader.bit
        code = 0
        plen = 0
        while plen <= 32:
            code = (code << 1) | bit()
            plen += 1
            ln = by_code.get((plen, code))
            if ln is not None:
                kind = ln[3] if len(ln) > 3 else "norm"
                if kind == "oob":
                    return OOB
                off = reader.bits(ln[1])
                if kind == "lower":
                    return ln[2] - off
                return ln[2] + off
        raise ValueError("invalid Huffman code")

    def encode(self, writer: "_HuffWriter", value) -> None:
        if value is OOB:
            for i, ln in enumerate(self.lines):
                if len(ln) > 3 and ln[3] == "oob":
                    writer.bits(self.codes[i], ln[0])
                    return
            raise ValueError("table has no OOB line")
        best = None
        for i, ln in enumerate(self.lines):
            kind = ln[3] if len(ln) > 3 else "norm"
            if kind == "oob":
                continue
            if kind == "lower":
                if value <= ln[2]:
                    best = (i, ln[2] - value)
                    break
                continue
            lo = ln[2]
            if kind == "upper":
                if value >= lo:
                    best = (i, value - lo)
                    break
                continue
            if lo <= value < lo + (1 << ln[1]):
                best = (i, value - lo)
                break
        if best is None:
            raise ValueError(f"value {value} not coverable")
        i, off = best
        writer.bits(self.codes[i], self.lines[i][0])
        writer.bits(off, self.lines[i][1])


class _HuffReader:
    """MSB-first bit reader with byte alignment (§6.5.9 collective
    bitmaps start on a byte boundary)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._d = data
        self._byte = pos
        self._bit = 0

    def bit(self) -> int:
        if self._byte >= len(self._d):
            raise ValueError("Huffman stream exhausted")
        b = (self._d[self._byte] >> (7 - self._bit)) & 1
        self._bit += 1
        if self._bit == 8:
            self._bit = 0
            self._byte += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def take(self, n: int) -> bytes:
        if self._bit:
            raise ValueError("byte read on unaligned stream")
        out = self._d[self._byte : self._byte + n]
        if len(out) != n:
            raise ValueError("Huffman stream exhausted")
        self._byte += n
        return out


class _HuffWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def bits(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> k) & 1)
            self._n += 1
            if self._n == 8:
                self._out.append(self._acc)
                self._acc = 0
                self._n = 0

    def align(self) -> None:
        while self._n:
            self.bits(0, 1)

    def raw(self, data: bytes) -> None:
        self.align()
        self._out += data

    def getvalue(self) -> bytes:
        self.align()
        return bytes(self._out)


# Standard tables (Annex B, Tables B.1–B.5): kind "upper"/"lower"
# lines carry a 32-bit offset extending the range outward; "oob" is
# the out-of-band marker ending DW runs.
HUFF_B1 = HuffTable(
    [(1, 4, 0), (2, 8, 16), (3, 16, 272), (3, 32, 65808, "upper")]
)
HUFF_B2 = HuffTable(
    [
        (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11),
        (6, 32, 75, "upper"), (6, 0, 0, "oob"),
    ]
)
HUFF_B3 = HuffTable(
    [
        (8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
        (5, 6, 11), (8, 32, -257, "lower"), (7, 32, 75, "upper"),
        (6, 0, 0, "oob"),
    ]
)
HUFF_B4 = HuffTable(
    [
        (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 7, 12),
        (5, 32, 76, "upper"),
    ]
)
HUFF_B5 = HuffTable(
    [
        (7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
        (5, 7, 12), (7, 32, -256, "lower"), (6, 32, 76, "upper"),
    ]
)

_SDHUFF_DH = {0: HUFF_B4, 1: HUFF_B5}
_SDHUFF_DW = {0: HUFF_B2, 1: HUFF_B3}

# SBHUFF standard-table selector map (§7.4.4.1.1); these tables are
# untranscribed (B.6-B.15) and resolve through codec_tables'
# SPARK_GRAFT_CODEC_TABLES verified-constants hook
_SBHUFF_STD = {
    "FS": {0: "B.6", 1: "B.7"},
    "DS": {0: "B.8", 1: "B.9", 2: "B.10"},
    "DT": {0: "B.11", 1: "B.12", 2: "B.13"},
    "RDW": {0: "B.14", 1: "B.15"},
    "RDH": {0: "B.14", 1: "B.15"},
    "RDX": {0: "B.14", 1: "B.15"},
    "RDY": {0: "B.14", 1: "B.15"},
}


def parse_table_segment(data: bytes) -> HuffTable:
    """Custom-table segment (type 53) data part → HuffTable, per the
    Annex B.2 assembly: flags byte (HTOOB; HTPS−1; HTRS−1), signed
    HTLOW/HTHIGH, then HTPS/HTRS-bit (preflen, rangelen) pairs for
    consecutive inner ranges from HTLOW up to HTHIGH, a 32-bit lower
    line at HTLOW−1, a 32-bit upper line at HTHIGH, and an OOB
    prefix when HTOOB. Zero prefix lengths mark unused lines and are
    dropped before canonical code assignment (B.3)."""
    tflags = data[0]
    htoob = bool(tflags & 1)
    htps = ((tflags >> 1) & 7) + 1
    htrs = ((tflags >> 4) & 7) + 1
    htlow, hthigh = struct.unpack_from(">ii", data, 1)
    if hthigh <= htlow:
        raise ValueError("custom table with empty value range")
    reader = _HuffReader(data, 9)
    lines: list[tuple] = []
    cur = htlow
    while cur < hthigh:
        pref = reader.bits(htps)
        rangelen = reader.bits(htrs)
        if rangelen > 32:
            raise ValueError("custom table range length over 32")
        if pref:
            lines.append((pref, rangelen, cur))
        cur += 1 << rangelen
    lower_pref = reader.bits(htps)
    if lower_pref:
        lines.append((lower_pref, 32, htlow - 1, "lower"))
    upper_pref = reader.bits(htps)
    if upper_pref:
        lines.append((upper_pref, 32, hthigh, "upper"))
    if htoob:
        oob_pref = reader.bits(htps)
        if oob_pref:
            lines.append((oob_pref, 0, 0, "oob"))
    return HuffTable(lines)


def _build_table_segment(spec: dict) -> bytes:
    """Fixture writer for a type-53 custom table: ``spec`` holds
    ``htlow``/``hthigh``, ``lines`` as consecutive (preflen,
    rangelen) pairs covering [htlow, hthigh), ``lower_pref``,
    ``upper_pref`` and optional ``oob_pref``. The equivalent
    HuffTable for ENCODING comes from running the writer's bytes
    back through :func:`parse_table_segment`, so the two stay in
    lock-step by construction."""
    prefs = [p for p, _ in spec["lines"]]
    prefs += [spec["lower_pref"], spec["upper_pref"]]
    if spec.get("oob_pref"):
        prefs.append(spec["oob_pref"])
    htps = max(1, max(p.bit_length() for p in prefs))
    htrs = max(
        1, max(r.bit_length() for _, r in spec["lines"])
    )
    if htps > 8 or htrs > 8:
        raise ValueError("custom table field widths exceed B.2 limits")
    tflags = (
        (1 if spec.get("oob_pref") else 0)
        | ((htps - 1) << 1)
        | ((htrs - 1) << 4)
    )
    out = bytearray([tflags])
    out += struct.pack(">ii", spec["htlow"], spec["hthigh"])
    w = _HuffWriter()
    cur = spec["htlow"]
    for pref, rangelen in spec["lines"]:
        w.bits(pref, htps)
        w.bits(rangelen, htrs)
        cur += 1 << rangelen
    if cur != spec["hthigh"]:
        raise ValueError(
            "custom table inner ranges do not tile [htlow, hthigh)"
        )
    w.bits(spec["lower_pref"], htps)
    w.bits(spec["upper_pref"], htps)
    if spec.get("oob_pref"):
        w.bits(spec["oob_pref"], htps)
    return bytes(out) + w.getvalue()


# ---------------------------------------------------------------------------
# Symbol dictionary (§6.5) and text region (§6.4) — the coding real
# scanned-PDF encoders emit for text areas (generic regions carry the
# halftone/graphics remainder). Both coding alternatives decode for
# the dictionary: the arithmetic path AND the SDHUFF=1 Huffman path
# with §6.5.9 collective bitmaps (MMR or uncompressed). SBHUFF text
# regions and refinement/aggregation gate honestly.
# ---------------------------------------------------------------------------


def decode_symbol_dict_segment(
    data: bytes,
    input_syms: list[np.ndarray] | None = None,
    tables: list[HuffTable] | None = None,
) -> list[np.ndarray]:
    """§7.4.3 header + §6.5.5 height-class decode → exported symbol
    bitmaps in export order. One MQ coder stream serves the IADH /
    IADW / IAEX integer banks and the shared GB generic contexts.
    ``tables`` are the referred custom-table segments in reference
    order, consumed left-to-right by SDHUFF custom selectors."""
    input_syms = input_syms or []
    (flags,) = struct.unpack_from(">H", data, 0)
    pos = 2
    refagg = bool(flags & 2)
    if flags & 1:
        return _decode_symbol_dict_huffman(
            data, flags, input_syms, tables or []
        )
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if (flags >> 8) & 1 or (flags >> 9) & 1:
        raise NotImplementedError(
            "retained/shared bitmap coding contexts across segments"
        )
    n_at = 4 if template == 0 else 1
    at = []
    for _ in range(n_at):
        at.append(
            (
                struct.unpack_from(">b", data, pos)[0],
                struct.unpack_from(">b", data, pos + 1)[0],
            )
        )
        pos += 2
    at = tuple(at)
    _check_at(at)
    rat: tuple[tuple[int, int], ...] = _GR_NOMINAL_AT
    if refagg and rtemplate == 0:
        rat = (
            (struct.unpack_from(">b", data, pos)[0],
             struct.unpack_from(">b", data, pos + 1)[0]),
            (struct.unpack_from(">b", data, pos + 2)[0],
             struct.unpack_from(">b", data, pos + 3)[0]),
        )
        pos += 4
    num_ex, num_new = struct.unpack_from(">II", data, pos)
    pos += 8
    dec = MQDecoder(data[pos:])
    gb = ArithStats(1 << _CX_BITS[template])
    iadh, iadw, iaex = _IntDecoder(), _IntDecoder(), _IntDecoder()
    # SDREFAGG (§6.5.8.2): every new symbol is coded as a refinement
    # (or, gated, a text-region aggregate) of already-decoded symbols
    # — IAAI instance count, IAID over ⌈log2(inputs + new)⌉ bits,
    # IARDX/IARDY reference offsets, GR stats shared per dictionary
    iaai, iardx, iardy = _IntDecoder(), _IntDecoder(), _IntDecoder()
    # REFAGGNINST > 1 nests a §6.4 text region inside the dictionary
    # (§6.5.8.2.1, SBSTRIPS=1/TL/OR/REFINE=1); its integer contexts
    # are the dictionary's own, persistent across aggregates
    iadt, iafs, iads = _IntDecoder(), _IntDecoder(), _IntDecoder()
    iari, iardw, iardh = _IntDecoder(), _IntDecoder(), _IntDecoder()
    agg_codelen = max(1, (len(input_syms) + num_new - 1).bit_length())
    agg_id_stats = ArithStats(1 << (agg_codelen + 1))
    gr_stats = ArithStats(1 << 13)

    def read_agg_instance(pool, curs):
        """One §6.4.5 3(c) instance: (bitmap, new CURS)."""
        sid = _decode_iaid(dec, agg_id_stats, agg_codelen)
        if sid >= len(pool):
            raise ValueError(
                "aggregate references an undecoded symbol"
            )
        bm = pool[sid]
        ri = iari.decode(dec)
        if ri is OOB:
            raise ValueError("OOB refinement flag")
        if ri:
            rdw = iardw.decode(dec)
            rdh = iardh.decode(dec)
            rdx = iardx.decode(dec)
            rdy = iardy.decode(dec)
            if OOB in (rdw, rdh, rdx, rdy):
                raise ValueError("OOB refinement delta")
            wo = bm.shape[1] + rdw
            ho = bm.shape[0] + rdh
            if wo <= 0 or ho <= 0:
                raise ValueError("refined instance has no pixels")
            bm = _refine_loop(
                dec, gr_stats, wo, ho, bm.astype(np.uint8),
                rdw // 2 + rdx, rdh // 2 + rdy, rtemplate, False,
                rat, None,
            )
        return bm, curs

    def decode_aggregate(nagg, symwidth, hcheight, pool):
        """§6.5.8.2.1 aggregate symbol: a text region of exactly
        (symwidth × hcheight) with REFAGGNINST instances."""
        region = np.zeros((hcheight, symwidth), bool)
        dt0 = iadt.decode(dec)
        if dt0 is OOB:
            raise ValueError("OOB STRIPT")
        stript = -dt0
        firsts = 0
        ninst = 0
        while ninst < nagg:
            dt = iadt.decode(dec)
            if dt is OOB:
                raise ValueError("OOB strip delta")
            stript += dt
            first_sym = True
            curs = 0
            while True:
                if first_sym:
                    dfs = iafs.decode(dec)
                    if dfs is OOB:
                        raise ValueError("OOB first-symbol S")
                    firsts += dfs
                    curs = firsts
                    first_sym = False
                else:
                    ids = iads.decode(dec)
                    if ids is OOB:
                        break  # strip ends
                    curs += ids
                bm, curs = read_agg_instance(pool, curs)
                bm = bm.astype(bool)
                hi, wi = bm.shape
                tgt = region[
                    stript : stript + hi, curs : curs + wi
                ]
                if tgt.shape != bm.shape or curs < 0 or stript < 0:
                    raise ValueError(
                        "aggregate instance exceeds the symbol extent"
                    )
                tgt |= bm
                curs += wi - 1
                ninst += 1
                if ninst > nagg:
                    raise ValueError("REFAGGNINST overrun")
        return region
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < num_new:
        dh = iadh.decode(dec)
        if dh is OOB:
            raise ValueError("OOB height-class delta")
        hcheight += dh
        if hcheight <= 0:
            raise ValueError("non-positive symbol height class")
        symwidth = 0
        while True:
            dw = iadw.decode(dec)
            if dw is OOB:
                break  # height class ends (§6.5.5 step 4(c))
            symwidth += dw
            if symwidth <= 0 or len(new_syms) >= num_new:
                raise ValueError("symbol dictionary overrun")
            if not refagg:
                new_syms.append(
                    _decode_generic_bitmap(
                        dec, gb, symwidth, hcheight, template, False,
                        at,
                    )
                )
                continue
            nagg = iaai.decode(dec)
            if nagg is OOB or nagg < 1:
                raise ValueError("bad REFAGGNINST")
            pool = input_syms + new_syms
            if nagg != 1:
                new_syms.append(
                    decode_aggregate(nagg, symwidth, hcheight, pool)
                )
                continue
            sid = _decode_iaid(dec, agg_id_stats, agg_codelen)
            if sid >= len(pool):
                raise ValueError(
                    "refinement references an undecoded symbol"
                )
            rdx = iardx.decode(dec)
            rdy = iardy.decode(dec)
            if OOB in (rdx, rdy):
                raise ValueError("OOB refinement offset")
            new_syms.append(
                _refine_loop(
                    dec, gr_stats, symwidth, hcheight,
                    pool[sid].astype(np.uint8), rdx, rdy,
                    rtemplate, False, rat, None,
                )
            )
    # export flags (§6.5.10): alternating runs over input + new
    all_syms = input_syms + new_syms
    exported: list[np.ndarray] = []
    curex, idx = 0, 0
    while idx < len(all_syms):
        run = iaex.decode(dec)
        if run is OOB or run < 0 or idx + run > len(all_syms):
            raise ValueError("bad symbol export run")
        if curex:
            exported.extend(all_syms[idx : idx + run])
        idx += run
        curex ^= 1
    if len(exported) != num_ex:
        raise ValueError("SDNUMEXSYMS disagrees with export runs")
    return exported


def _sdhuff_agg_tables() -> dict:
    """The spec-fixed standard tables a SDHUFF aggregate text region
    reads through (§6.5.8.2.1 table assignments) — all untranscribed,
    all resolvable through the codec_tables hook."""
    from ccgp_data_wrangling_spark.codec_tables import (
        jbig2_standard_table,
    )

    out = {}
    for key, name in (("dt", "B.11"), ("fs", "B.6"), ("ds", "B.8"),
                      ("rdw", "B.14"), ("rdh", "B.14"),
                      ("rdx", "B.15"), ("rdy", "B.15")):
        t = jbig2_standard_table(name)
        if t is None:
            raise NotImplementedError(
                f"SDHUFF aggregate text region needs standard table "
                f"{name} (untranscribed); supply it via "
                "SPARK_GRAFT_CODEC_TABLES"
            )
        out[key] = t
    return out


def _sdhuff_aggregate(
    reader: "_HuffReader",
    nagg: int,
    symwidth: int,
    hcheight: int,
    pool: list[np.ndarray],
    codelen: int,
    rtemplate: int,
    rat: tuple[tuple[int, int], ...],
    b15: HuffTable,
) -> np.ndarray:
    """§6.5.8.2.1 with SDHUFF=1: decode one aggregate symbol as a
    nested Huffman-coded text region of exactly (symwidth ×
    hcheight) — SBSTRIPS=1, TL refcorner, OR composition, raw-bit
    symbol IDs over ``codelen`` bits, single-bit RI flags, refined
    instances through B.14/B.15 deltas and the byte-aligned
    RSIZE-block MQ mechanism."""
    tabs = _sdhuff_agg_tables()
    region = np.zeros((hcheight, symwidth), bool)
    dt0 = tabs["dt"].decode(reader)
    if dt0 is OOB:
        raise ValueError("OOB STRIPT")
    stript = -dt0
    firsts = 0
    ninst = 0
    while ninst < nagg:
        dt = tabs["dt"].decode(reader)
        if dt is OOB:
            raise ValueError("OOB strip delta")
        stript += dt
        first_sym = True
        curs = 0
        while True:
            if first_sym:
                dfs = tabs["fs"].decode(reader)
                if dfs is OOB:
                    raise ValueError("OOB first-symbol S")
                firsts += dfs
                curs = firsts
                first_sym = False
            else:
                ids = tabs["ds"].decode(reader)
                if ids is OOB:
                    break  # strip ends
                curs += ids
            sid = reader.bits(codelen)
            if sid >= len(pool):
                raise ValueError(
                    "aggregate references an undecoded symbol"
                )
            bm = pool[sid]
            if reader.bit():  # RI: refined instance
                rdw = tabs["rdw"].decode(reader)
                rdh = tabs["rdh"].decode(reader)
                rdx = tabs["rdx"].decode(reader)
                rdy = tabs["rdy"].decode(reader)
                if OOB in (rdw, rdh, rdx, rdy):
                    raise ValueError("OOB refinement delta")
                rsize = HUFF_B1.decode(reader)
                if rsize is OOB or rsize <= 0:
                    raise ValueError("bad refinement RSIZE")
                reader.align()
                block = reader.take(rsize)
                wo = bm.shape[1] + rdw
                ho = bm.shape[0] + rdh
                if wo <= 0 or ho <= 0:
                    raise ValueError("refined instance has no pixels")
                bm = _refine_loop(
                    MQDecoder(bytes(block)), ArithStats(1 << 13),
                    wo, ho, bm.astype(np.uint8),
                    rdw // 2 + rdx, rdh // 2 + rdy,
                    rtemplate, False, rat, None,
                )
            bm = bm.astype(bool)
            hi, wi = bm.shape
            tgt = region[stript:stript + hi, curs:curs + wi]
            if tgt.shape != bm.shape or curs < 0 or stript < 0:
                raise ValueError(
                    "aggregate instance exceeds the symbol extent"
                )
            tgt |= bm
            curs += wi - 1
            ninst += 1
            if ninst > nagg:
                raise ValueError("REFAGGNINST overrun")
    return region


def _decode_symbol_dict_huffman(
    data: bytes,
    flags: int,
    input_syms: list[np.ndarray],
    tables: list[HuffTable],
) -> list[np.ndarray]:
    """§6.5.5 with SDHUFF=1 (the legacy-scanner coding): height and
    width deltas through Annex B tables — standard B.2–B.5 by
    selector, or CUSTOM type-53 tables consumed from the referred
    segments in order (§7.4.3.1.1: each selector value 3 takes the
    next one) — then per-height-class COLLECTIVE bitmaps (§6.5.9),
    MMR-coded when BMSIZE > 0, raw byte-padded rows when BMSIZE == 0,
    split by the decoded widths."""
    sel_dh = (flags >> 2) & 3
    sel_dw = (flags >> 4) & 3
    table_idx = 0

    def take_table(sel: int, std: dict, what: str) -> HuffTable:
        nonlocal table_idx
        if sel in std:
            return std[sel]
        if sel != 3:
            raise ValueError(f"reserved {what} table selector {sel}")
        if table_idx >= len(tables):
            raise ValueError(
                f"custom {what} table selected but no unconsumed "
                "referred table segment remains"
            )
        t = tables[table_idx]
        table_idx += 1
        return t

    dh_tab = take_table(sel_dh, _SDHUFF_DH, "DH")
    dw_tab = take_table(sel_dw, _SDHUFF_DW, "DW")
    if (flags >> 6) & 1 or (flags >> 7) & 1:
        raise NotImplementedError(
            "custom BMSIZE/AGG symbol-dictionary tables"
        )
    refagg = bool(flags & 2)
    rtemplate = (flags >> 12) & 1
    pos = 2
    rat: tuple[tuple[int, int], ...] = _GR_NOMINAL_AT
    if refagg and rtemplate == 0:
        rat = (
            (struct.unpack_from(">b", data, pos)[0],
             struct.unpack_from(">b", data, pos + 1)[0]),
            (struct.unpack_from(">b", data, pos + 2)[0],
             struct.unpack_from(">b", data, pos + 3)[0]),
        )
        pos += 4
    num_ex, num_new = struct.unpack_from(">II", data, pos)
    reader = _HuffReader(data, pos + 8)
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_ccitt_g4,
    )

    b15 = None
    if refagg:
        # §6.5.8.2.2 (SDHUFF=1): RDX/RDY always read through the
        # standard Table B.15 — untranscribed, loadable through the
        # codec_tables verified-constants hook
        from ccgp_data_wrangling_spark.codec_tables import (
            jbig2_standard_table,
        )

        b15 = jbig2_standard_table("B.15")
        if b15 is None:
            raise NotImplementedError(
                "SDHUFF + SDREFAGG needs standard table B.15 for "
                "RDX/RDY (untranscribed); supply it via "
                "SPARK_GRAFT_CODEC_TABLES"
            )
    agg_codelen = max(
        1, (len(input_syms) + num_new - 1).bit_length()
    )

    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < num_new:
        dh = dh_tab.decode(reader)
        if dh is OOB:
            raise ValueError("OOB height-class delta")
        hcheight += dh
        if hcheight <= 0:
            raise ValueError("non-positive symbol height class")
        symwidth = 0
        widths: list[int] = []
        while True:
            dw = dw_tab.decode(reader)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth <= 0 or (
                len(new_syms) + len(widths) >= num_new
            ):
                raise ValueError("symbol dictionary overrun")
            if refagg:
                # §6.5.8.2.2: per-symbol refinement — AGGINST via
                # Table B.1, raw-bit symbol ID, B.15 RDX/RDY, B.1
                # BMSIZE, then a byte-aligned MQ refinement block
                # with fresh GR stats (the SBHUFF text-region RSIZE
                # mechanism)
                nagg = HUFF_B1.decode(reader)
                if nagg is OOB or nagg < 1:
                    raise ValueError("bad REFAGGNINST")
                pool = input_syms + new_syms
                if nagg != 1:
                    # §6.5.8.2.1 with SDHUFF=1: the aggregate is a
                    # nested HUFFMAN-coded text region with the
                    # spec-fixed standard tables (DT=B.11, FS=B.6,
                    # DS=B.8, RDW/RDH=B.14, RDX/RDY=B.15, RSIZE=B.1)
                    new_syms.append(_sdhuff_aggregate(
                        reader, nagg, symwidth, hcheight, pool,
                        agg_codelen, rtemplate, rat, b15,
                    ))
                    continue
                sid = reader.bits(agg_codelen)
                if sid >= len(pool):
                    raise ValueError(
                        "refinement references an undecoded symbol"
                    )
                rdx = b15.decode(reader)
                rdy = b15.decode(reader)
                if OOB in (rdx, rdy):
                    raise ValueError("OOB refinement offset")
                bmsize = HUFF_B1.decode(reader)
                if bmsize is OOB or bmsize <= 0:
                    raise ValueError("bad refinement BMSIZE")
                reader.align()
                block = reader.take(bmsize)
                rdec = MQDecoder(bytes(block))
                new_syms.append(
                    _refine_loop(
                        rdec, ArithStats(1 << 13), symwidth,
                        hcheight, pool[sid].astype(np.uint8),
                        rdx, rdy, rtemplate, False, rat, None,
                    )
                )
                continue
            widths.append(symwidth)
        if refagg:
            continue
        total = sum(widths)
        bmsize = HUFF_B1.decode(reader)
        reader.align()
        if bmsize == 0:
            rowbytes = (total + 7) // 8
            raw = reader.take(rowbytes * hcheight)
            rows = np.frombuffer(raw, np.uint8).reshape(
                hcheight, rowbytes
            )
            collective = np.unpackbits(rows, axis=1)[
                :, :total
            ].astype(bool)
        else:
            collective = decode_ccitt_g4(
                bytes(reader.take(bmsize)), total, hcheight
            )
        x = 0
        for w in widths:
            new_syms.append(collective[:, x : x + w])
            x += w
    # export flags: runlengths through Table B.1 (§6.5.10)
    all_syms = input_syms + new_syms
    exported: list[np.ndarray] = []
    curex, idx = 0, 0
    while idx < len(all_syms):
        run = HUFF_B1.decode(reader)
        if run < 0 or idx + run > len(all_syms):
            raise ValueError("bad symbol export run")
        if curex:
            exported.extend(all_syms[idx : idx + run])
        idx += run
        curex ^= 1
    if len(exported) != num_ex:
        raise ValueError("SDNUMEXSYMS disagrees with export runs")
    return exported


def _build_symbol_dict_data(
    symbols: list[np.ndarray],
    template: int = 0,
    huffman: bool = False,
    custom_dw: HuffTable | None = None,
) -> tuple[bytes, list[int]]:
    """Encode a symbol dictionary (export-all) and return (segment
    data, mapping original-index → export-order index). Symbols are
    grouped into non-decreasing height classes the way §6.5.5's
    delta coding expects natural encoders to. With ``huffman`` the
    SDHUFF=1 standard-table coding is used (widths sorted ascending
    within a class so B.2's non-negative deltas suffice), each class
    carried as one MMR collective bitmap (§6.5.9)."""
    order = sorted(
        range(len(symbols)),
        key=lambda i: (symbols[i].shape[0], symbols[i].shape[1], i),
    )
    remap = [0] * len(symbols)
    for new_idx, orig in enumerate(order):
        remap[orig] = new_idx
    if huffman:
        return (
            _build_symbol_dict_huffman(symbols, order, custom_dw),
            remap,
        )
    at = _NOMINAL_AT[template]
    enc = MQEncoder()
    gb = ArithStats(1 << _CX_BITS[template])
    iadh, iadw, iaex = _IntEncoder(), _IntEncoder(), _IntEncoder()
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        iadh.encode(enc, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and symbols[order[i]].shape[0] == h:
            w = symbols[order[i]].shape[1]
            iadw.encode(enc, w - symwidth)
            symwidth = w
            _encode_generic_bitmap(
                enc, gb, symbols[order[i]].astype(bool), template,
                False, at,
            )
            i += 1
        iadw.encode(enc, OOB)
    iaex.encode(enc, 0)  # run of not-exported
    iaex.encode(enc, len(symbols))  # export everything
    flags = (template & 3) << 10
    head = struct.pack(">H", flags)
    for dx, dy in at:
        head += struct.pack(">bb", dx, dy)
    head += struct.pack(">II", len(symbols), len(symbols))
    return head + enc.flush(), remap


def _build_symbol_dict_huffman(
    symbols: list[np.ndarray],
    order: list[int],
    custom_dw: HuffTable | None = None,
) -> bytes:
    """SDHUFF=1 segment data: B.4 height deltas, B.2 width deltas
    (or a referred CUSTOM width table when ``custom_dw`` is given —
    selector 3, §7.4.3.1.1), B.1 BMSIZE + export runs, byte-aligned
    MMR collective bitmaps."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_ccitt_g4,
    )

    dw_tab = custom_dw if custom_dw is not None else HUFF_B2
    w = _HuffWriter()
    hcheight = 0
    i = 0
    while i < len(order):
        h = symbols[order[i]].shape[0]
        HUFF_B4.encode(w, h - hcheight)
        hcheight = h
        symwidth = 0
        cls: list[np.ndarray] = []
        while i < len(order) and symbols[order[i]].shape[0] == h:
            bm = symbols[order[i]].astype(bool)
            dw_tab.encode(w, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            cls.append(bm)
            i += 1
        dw_tab.encode(w, OOB)
        collective = np.concatenate(cls, axis=1)
        mmr = encode_ccitt_g4(collective)
        HUFF_B1.encode(w, len(mmr))
        w.raw(mmr)
    HUFF_B1.encode(w, 0)  # run of not-exported
    HUFF_B1.encode(w, len(symbols))  # export everything
    flags = 1 | ((3 << 4) if custom_dw is not None else 0)
    head = struct.pack(">H", flags)
    head += struct.pack(">II", len(symbols), len(symbols))
    return head + w.getvalue()


def _compose_agg_symbol(
    spec: dict, pool: list[np.ndarray]
) -> np.ndarray:
    """Composite bitmap an aggregate spec decodes to: instances OR'd
    at their TL (s, t) placements inside the declared shape."""
    h, w = spec["shape"]
    region = np.zeros((h, w), bool)
    for inst in spec["agg"]:
        ref, s, t = inst[:3]
        if len(inst) > 3 and inst[3]:
            bm = inst[3]["bitmap"].astype(bool)
        else:
            bm = pool[ref].astype(bool)
        hi, wi = bm.shape
        if t < 0 or s < 0 or t + hi > h or s + wi > w:
            raise ValueError(
                "aggregate instance exceeds the symbol extent"
            )
        region[t : t + hi, s : s + wi] |= bm
    return region


def _ent_shape(ent: dict) -> tuple[int, int]:
    if "aggregate" in ent:
        return ent["h"], ent["w"]
    return ent["bitmap"].shape


def _emit_sdhuff_aggregate(
    w: "_HuffWriter",
    ent: dict,
    pool: list[np.ndarray],
    codelen: int,
    rtemplate: int,
    rat: tuple[tuple[int, int], ...],
    symwidth: int,
) -> np.ndarray:
    """Emit one REFAGGNINST>1 aggregate as a nested Huffman text
    region (§6.5.8.2.1, SDHUFF=1) and return the composed symbol
    bitmap. Instances are (sid, x, y[, refinement-dict]) TOP-LEFT
    placements."""
    tabs = _sdhuff_agg_tables()
    h, wd = ent["h"], ent["w"]
    insts = ent["aggregate"]
    HUFF_B2.encode(w, wd - symwidth)
    HUFF_B1.encode(w, len(insts))  # REFAGGNINST
    region = np.zeros((h, wd), bool)
    coded = sorted(
        ((inst[1], inst[2], inst) for inst in insts),
        key=lambda r: (r[1], r[0]),
    )
    tabs["dt"].encode(w, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    i = 0
    while i < len(coded):
        t = coded[i][1]
        tabs["dt"].encode(w, t - stript)
        stript = t
        first = True
        curs = 0
        while i < len(coded) and coded[i][1] == t:
            s_, _, inst = coded[i]
            if first:
                tabs["fs"].encode(w, s_ - firsts)
                firsts = s_
                first = False
            else:
                tabs["ds"].encode(w, s_ - curs)
            sid = inst[0]
            w.bits(sid, codelen)
            ref = inst[3] if len(inst) > 3 else None
            if ref:
                w.bits(1, 1)
                out_bm = ref["bitmap"].astype(bool)
                base = pool[sid]
                rdw = out_bm.shape[1] - base.shape[1]
                rdh = out_bm.shape[0] - base.shape[0]
                rdx_, rdy_ = ref.get("rdx", 0), ref.get("rdy", 0)
                tabs["rdw"].encode(w, rdw)
                tabs["rdh"].encode(w, rdh)
                tabs["rdx"].encode(w, rdx_)
                tabs["rdy"].encode(w, rdy_)
                enc = MQEncoder()
                _refine_loop(
                    enc, ArithStats(1 << 13),
                    out_bm.shape[1], out_bm.shape[0],
                    base.astype(np.uint8),
                    rdw // 2 + rdx_, rdh // 2 + rdy_,
                    rtemplate, False, rat, out_bm,
                )
                block = enc.flush()
                HUFF_B1.encode(w, len(block))
                w.align()
                w.raw(block)
                bm = out_bm
            else:
                w.bits(0, 1)
                bm = pool[sid].astype(bool)
            hi, wi = bm.shape
            region[t:t + hi, s_:s_ + wi] |= bm
            curs = s_ + wi - 1
            i += 1
        tabs["ds"].encode(w, OOB)
    return region


def _build_symbol_dict_huffman_refagg(
    entries: list[dict],
    input_syms: list[np.ndarray],
    rtemplate: int = 0,
    rat: tuple[tuple[int, int], ...] | None = None,
) -> bytes:
    """SDHUFF=1 + SDREFAGG=1 segment data (§6.5.8.2.2, single
    instance): B.4 height deltas / B.2 width deltas, per-symbol
    AGGINST=1 via B.1, raw-bit symbol ID, RDX/RDY through the
    hook-loaded standard Table B.15, B.1 BMSIZE, then a byte-aligned
    MQ refinement block with fresh GR stats. ``entries`` are dicts
    {"bitmap": target bool array, "ref": pool index, "rdx", "rdy"}
    — or, for a REFAGGNINST>1 aggregate, {"h", "w", "aggregate":
    [(sid, x, y) or (sid, x, y, {"bitmap", "rdx", "rdy"})]} coded as
    a nested Huffman text region over the spec-fixed standard
    tables — in NON-DECREASING height order; everything exports."""
    from ccgp_data_wrangling_spark.codec_tables import (
        jbig2_standard_table,
    )

    b15 = jbig2_standard_table("B.15")
    if b15 is None:
        raise NotImplementedError(
            "SDHUFF+SDREFAGG fixtures need standard table B.15 via "
            "SPARK_GRAFT_CODEC_TABLES"
        )
    if rat is None:
        rat = _GR_NOMINAL_AT
    num_new = len(entries)
    codelen = max(1, (len(input_syms) + num_new - 1).bit_length())
    w = _HuffWriter()
    hcheight = 0
    i = 0
    pool = list(input_syms)
    while i < num_new:
        h = _ent_shape(entries[i])[0]
        HUFF_B4.encode(w, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < num_new and _ent_shape(entries[i])[0] == h:
            ent = entries[i]
            if "aggregate" in ent:
                region = _emit_sdhuff_aggregate(
                    w, ent, pool, codelen, rtemplate, rat, symwidth
                )
                symwidth = ent["w"]
                pool.append(region)
                i += 1
                continue
            bm = ent["bitmap"].astype(bool)
            HUFF_B2.encode(w, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            HUFF_B1.encode(w, 1)  # REFAGGNINST
            w.bits(ent["ref"], codelen)
            b15.encode(w, ent["rdx"])
            b15.encode(w, ent["rdy"])
            enc = MQEncoder()
            _refine_loop(
                enc, ArithStats(1 << 13), bm.shape[1], bm.shape[0],
                pool[ent["ref"]].astype(np.uint8), ent["rdx"],
                ent["rdy"], rtemplate, False, rat, bm,
            )
            block = enc.flush()
            HUFF_B1.encode(w, len(block))
            w.align()
            w.raw(block)
            pool.append(bm)
            i += 1
        HUFF_B2.encode(w, OOB)
    # export runs (B.1): inputs not exported, every new symbol is
    HUFF_B1.encode(w, len(input_syms))
    HUFF_B1.encode(w, num_new)
    flags = 1 | 2 | ((rtemplate & 1) << 12)
    head = struct.pack(">H", flags)
    if rtemplate == 0:
        for dx, dy in rat:
            head += struct.pack(">bb", dx, dy)
    head += struct.pack(">II", num_new, num_new)
    return head + w.getvalue()


def _build_symbol_dict_refagg(
    refined: list,
    input_syms: list[np.ndarray],
    rtemplate: int = 0,
) -> tuple[bytes, list[int]]:
    """Encode an SDREFAGG=1 dictionary (export-all). Each entry is
    either (referenced-global-id, bitmap, rdx, rdy) — IAAI=1 with a
    direct §6.3 refinement — or, for REFAGGNINST > 1, a dict
    {"shape": (h, w), "agg": [(ref, s, t) | (ref, s, t,
    {"bitmap", "rdx", "rdy"}), ...]}: a §6.5.8.2.1 nested text
    region (SBSTRIPS=1, TL, OR, REFINE=1) whose instances place —
    and optionally refine — already-decoded symbols. Integer
    contexts are the dictionary's own, persistent across aggregates;
    GR stats shared per dictionary, TPGRON=0. References may point
    at input symbols or earlier-decoded new symbols. Height classes
    sort like the generic builder; returns (data, remap)."""

    def shape_of(i: int) -> tuple[int, int]:
        e = refined[i]
        return (
            tuple(e["shape"]) if isinstance(e, dict)
            else e[1].shape[:2]
        )

    order = sorted(
        range(len(refined)),
        key=lambda i: (*shape_of(i), i),
    )
    remap = [0] * len(refined)
    for new_idx, orig in enumerate(order):
        remap[orig] = new_idx
    n_input = len(input_syms)
    num_new = len(refined)
    agg_codelen = max(1, (n_input + num_new - 1).bit_length())
    enc = MQEncoder()
    iadh, iadw, iaex = _IntEncoder(), _IntEncoder(), _IntEncoder()
    iaai, iardx, iardy = _IntEncoder(), _IntEncoder(), _IntEncoder()
    iadt, iafs, iads = _IntEncoder(), _IntEncoder(), _IntEncoder()
    iari, iardw, iardh = _IntEncoder(), _IntEncoder(), _IntEncoder()
    agg_id_stats = ArithStats(1 << (agg_codelen + 1))
    gr_stats = ArithStats(1 << 13)
    pool = [s.astype(np.uint8) for s in input_syms]

    def check_ref(ref_id: int) -> None:
        if not 0 <= ref_id < len(pool):
            raise ValueError(
                "refagg reference must be an input symbol or an "
                "earlier-coded new symbol (decode order)"
            )

    def encode_aggregate(spec: dict) -> np.ndarray:
        insts = list(spec["agg"])
        if len(insts) < 2:
            raise ValueError("aggregate specs carry ≥2 instances")
        iaai.encode(enc, len(insts))
        iadt.encode(enc, 0)  # initial STRIPT = 0
        # strips: ascending T, instances within a strip by S —
        # exactly the decoder's §6.4.5 walk with SBSTRIPS = 1
        strips: dict[int, list] = {}
        for inst in insts:
            strips.setdefault(inst[2], []).append(inst)
        stript = 0
        firsts = 0
        for t in sorted(strips):
            iadt.encode(enc, t - stript)
            stript = t
            curs = 0
            for j, inst in enumerate(
                sorted(strips[t], key=lambda x: x[1])
            ):
                ref_id, s = inst[0], inst[1]
                check_ref(ref_id)
                if j == 0:
                    iafs.encode(enc, s - firsts)
                    firsts = s
                else:
                    iads.encode(enc, s - curs)
                curs = s
                _encode_iaid(enc, agg_id_stats, agg_codelen, ref_id)
                if len(inst) > 3 and inst[3]:
                    rspec = inst[3]
                    out = rspec["bitmap"].astype(bool)
                    rdx, rdy = rspec["rdx"], rspec["rdy"]
                    rdw = out.shape[1] - pool[ref_id].shape[1]
                    rdh = out.shape[0] - pool[ref_id].shape[0]
                    iari.encode(enc, 1)
                    iardw.encode(enc, rdw)
                    iardh.encode(enc, rdh)
                    iardx.encode(enc, rdx)
                    iardy.encode(enc, rdy)
                    _refine_loop(
                        enc, gr_stats, out.shape[1], out.shape[0],
                        pool[ref_id], rdw // 2 + rdx,
                        rdh // 2 + rdy, rtemplate, False,
                        _GR_NOMINAL_AT, out,
                    )
                    wi = out.shape[1]
                else:
                    iari.encode(enc, 0)
                    wi = pool[ref_id].shape[1]
                curs += wi - 1
            iads.encode(enc, OOB)
        return _compose_agg_symbol(spec, pool)

    hcheight = 0
    i = 0
    while i < len(order):
        h = shape_of(order[i])[0]
        iadh.encode(enc, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and shape_of(order[i])[0] == h:
            entry = refined[order[i]]
            if isinstance(entry, dict):
                iadw.encode(enc, entry["shape"][1] - symwidth)
                symwidth = entry["shape"][1]
                bm = encode_aggregate(entry)
                pool.append(bm.astype(np.uint8))
                i += 1
                continue
            ref_id, bm, rdx, rdy = entry
            bm = bm.astype(bool)
            check_ref(ref_id)
            iadw.encode(enc, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            iaai.encode(enc, 1)
            _encode_iaid(enc, agg_id_stats, agg_codelen, ref_id)
            iardx.encode(enc, rdx)
            iardy.encode(enc, rdy)
            _refine_loop(
                enc, gr_stats, bm.shape[1], bm.shape[0],
                pool[ref_id], rdx, rdy, rtemplate, False,
                _GR_NOMINAL_AT, bm,
            )
            pool.append(bm.astype(np.uint8))
            i += 1
        iadw.encode(enc, OOB)
    total = n_input + num_new
    iaex.encode(enc, 0)
    iaex.encode(enc, total)  # export inputs AND new symbols
    flags = 2 | ((rtemplate & 1) << 12)
    head = struct.pack(">H", flags)
    for dx, dy in _NOMINAL_AT[0]:
        head += struct.pack(">bb", dx, dy)
    if rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            head += struct.pack(">bb", dx, dy)
    head += struct.pack(">II", total, num_new)
    return head + enc.flush(), remap


def build_jbig2_refagg_text_embedded(
    bases: list[np.ndarray],
    refined: list[tuple[int, np.ndarray, int, int]],
    instances: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
    rtemplate: int = 0,
    refcorner: str = "tl",
) -> bytes:
    """Embedded stream for the SDREFAGG path: page info + a GENERIC
    symbol dictionary carrying ``bases`` + an SDREFAGG dictionary
    whose new symbols each refine a base (``refined`` entries are
    (base-index, bitmap, rdx, rdy)) + a text region referring to the
    refagg dictionary (its exports = bases then refined symbols).
    ``instances`` index that combined alphabet: 0..len(bases)-1 are
    bases, len(bases)+j is refined[j]. Entries of ``refined`` may
    also be REFAGGNINST>1 aggregate dicts (see
    :func:`_build_symbol_dict_refagg`) whose instance refs index
    ``bases``."""
    pw, ph = page_wh
    page_data = struct.pack(">IIII", pw, ph, 0, 0)
    page_data += b"\x00" + struct.pack(">H", 0)
    out = _segment(0, _SEG_PAGE_INFO, 1, page_data)
    dict1, remap1 = _build_symbol_dict_data(bases)
    out += _segment(1, _SEG_SYMBOL_DICT, 1, dict1)
    order1 = sorted(range(len(bases)), key=lambda i: remap1[i])
    dict1_exports = [bases[i].astype(bool) for i in order1]
    specs = []
    for entry in refined:
        if isinstance(entry, dict):
            specs.append(
                {
                    "shape": entry["shape"],
                    "agg": [
                        (remap1[inst[0]], *inst[1:])
                        for inst in entry["agg"]
                    ],
                }
            )
        else:
            b, bm, rdx, rdy = entry
            specs.append((remap1[b], bm, rdx, rdy))
    dict2, remap2 = _build_symbol_dict_refagg(
        specs, dict1_exports, rtemplate
    )
    out += _segment(2, _SEG_SYMBOL_DICT, 1, dict2, refs=(1,))
    order2 = sorted(range(len(refined)), key=lambda j: remap2[j])
    text_syms = dict1_exports + [
        _compose_agg_symbol(specs[j], dict1_exports)
        if isinstance(refined[j], dict)
        else refined[j][1].astype(bool)
        for j in order2
    ]
    nb = len(bases)
    coded = [
        (
            remap1[inst[0]] if inst[0] < nb
            else nb + remap2[inst[0] - nb],
            *inst[1:],
        )
        for inst in instances
    ]
    text_data = _build_text_region_data(
        coded, text_syms, page_wh, (0, 0), refcorner
    )
    out += _segment(
        3, _SEG_TEXT_IMMEDIATE_LOSSLESS, 1, text_data, refs=(2,)
    )
    out += _segment(4, _SEG_END_OF_PAGE, 1, b"")
    return out


_REFCORNERS = ("bl", "tl", "br", "tr")  # §7.4.4.1.1 values 0-3


def _read_symbol_id_code_lengths(
    reader: "_HuffReader", nsyms: int
) -> list[int]:
    """§7.4.4.1.1.1 symbol-ID code table prelude: 35 4-bit runcode
    lengths → runcode Huffman table → ``nsyms`` symbol code lengths.
    Runcodes 32/33/34 are repeat escapes; per T.88, runcode 32 repeats
    the PREVIOUS symbol's length, which is 0 immediately after a
    zero-run (33/34) — third-party encoders do emit that sequence
    (r11 ADVICE fix, regression-pinned in test_jbig2)."""
    run_lens = [reader.bits(4) for _ in range(35)]
    runtab = HuffTable(
        [(ln, 0, i) for i, ln in enumerate(run_lens) if ln]
    )
    sym_lens: list[int] = []
    prev_len = 0
    while len(sym_lens) < nsyms:
        c = runtab.decode(reader)
        if c < 32:
            sym_lens.append(c)
            prev_len = c
        elif c == 32:
            sym_lens.extend([prev_len] * (reader.bits(2) + 3))
        elif c == 33:
            sym_lens.extend([0] * (reader.bits(3) + 3))
            prev_len = 0
        else:
            sym_lens.extend([0] * (reader.bits(7) + 11))
            prev_len = 0
    if len(sym_lens) != nsyms:
        raise ValueError("symbol-ID length run overshoots")
    return sym_lens


def decode_text_region_segment(
    data: bytes,
    syms: list[np.ndarray],
    tables: list[HuffTable] | None = None,
) -> dict:
    """§7.4.4 header + §6.4.5 strip decode → placed-symbol bitmap
    with region placement, shaped like ``_decode_region_segment``.

    BOTH coding alternatives decode: arithmetic (Annex A integer
    procedures over one MQ stream) and SBHUFF=1 — the §7.4.4.1.1.1
    runcode-coded symbol-ID table, Huffman FS/DS/DT reads through
    referred CUSTOM type-53 tables (selector 3, consumed in the
    §7.4.4.1.6 order FS, DS, DT, RDW, RDH, RDX, RDY, RSIZE), raw
    CURT bits, and per-instance byte-aligned MQ refinement blocks of
    RSIZE bytes. The UNTRANSCRIBED standard tables B.6–B.15
    (selectors 0–2) gate honestly."""
    w, h, x, y = struct.unpack_from(">IIII", data, 0)
    comb_op = data[16] & 0x07
    (flags,) = struct.unpack_from(">H", data, 17)
    pos = 19
    huff = bool(flags & 1)
    tables = tables or []
    table_idx = 0

    def take_custom(sel: int, what: str) -> HuffTable:
        nonlocal table_idx
        if sel != 3:
            # selectors 0-2 name the Annex B standard tables
            # (§7.4.4.1.1): untranscribed here, but loadable through
            # the verified-constants hook (codec_tables)
            name = _SBHUFF_STD.get(what, {}).get(sel)
            if name is None:
                raise ValueError(
                    f"invalid SBHUFF selector {sel} for {what}"
                )
            from ccgp_data_wrangling_spark.codec_tables import (
                jbig2_standard_table,
            )

            std = jbig2_standard_table(name)
            if std is None:
                raise NotImplementedError(
                    f"SBHUFF standard table {name} for {what} "
                    "(Annex B.6-B.15 untranscribed; supply it via "
                    "SPARK_GRAFT_CODEC_TABLES or use custom type-53 "
                    "tables)"
                )
            return std
        if table_idx >= len(tables):
            raise ValueError(
                f"custom {what} table selected but no unconsumed "
                "referred table segment remains"
            )
        t = tables[table_idx]
        table_idx += 1
        return t

    hflags = 0
    if huff:
        (hflags,) = struct.unpack_from(">H", data, pos)
        pos += 2
    refine = bool(flags & 2)
    rtemplate = (flags >> 15) & 1
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = bool((flags >> 6) & 1)
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    rat: tuple[tuple[int, int], ...] = _GR_NOMINAL_AT
    if refine and rtemplate == 0:
        rat = (
            (struct.unpack_from(">b", data, pos)[0],
             struct.unpack_from(">b", data, pos + 1)[0]),
            (struct.unpack_from(">b", data, pos + 2)[0],
             struct.unpack_from(">b", data, pos + 3)[0]),
        )
        pos += 4
    (num_inst,) = struct.unpack_from(">I", data, pos)
    pos += 4
    strips = 1 << log_strips
    if not syms:
        raise ValueError("text region with no referred symbols")
    symcodelen = max(1, (len(syms) - 1).bit_length())
    if huff:
        fs_tab = take_custom(hflags & 3, "FS")
        ds_tab = take_custom((hflags >> 2) & 3, "DS")
        dt_tab = take_custom((hflags >> 4) & 3, "DT")
        if refine:
            rdw_tab = take_custom((hflags >> 6) & 3, "RDW")
            rdh_tab = take_custom((hflags >> 8) & 3, "RDH")
            rdx_tab = take_custom((hflags >> 10) & 3, "RDX")
            rdy_tab = take_custom((hflags >> 12) & 3, "RDY")
            rsize_tab = (
                take_custom(3, "RSIZE")
                if (hflags >> 14) & 1
                else HUFF_B1
            )
        reader = _HuffReader(data, pos)
        sym_lens = _read_symbol_id_code_lengths(reader, len(syms))
        symtab = HuffTable(
            [(ln, 0, i) for i, ln in enumerate(sym_lens) if ln]
        )
        reader.align()
    else:
        dec = MQDecoder(data[pos:])
    iadt, iafs, iads, iait = (
        _IntDecoder(), _IntDecoder(), _IntDecoder(), _IntDecoder(),
    )
    # §6.4.11 refinement-in-text: one IARI per instance gates an
    # (RDW, RDH, RDX, RDY) header plus a §6.3 refinement pass whose
    # reference is the symbol's own bitmap; GR stats are shared
    # across the region like the GB stats of a generic region
    iari, iardw, iardh, iardx, iardy = (
        _IntDecoder(), _IntDecoder(), _IntDecoder(), _IntDecoder(),
        _IntDecoder(),
    )
    gr_stats = ArithStats(1 << 13)
    iaid_stats = ArithStats(1 << (symcodelen + 1))

    def read_dt():
        return dt_tab.decode(reader) if huff else iadt.decode(dec)

    def read_fs():
        return fs_tab.decode(reader) if huff else iafs.decode(dec)

    def read_ds():
        return ds_tab.decode(reader) if huff else iads.decode(dec)

    def read_t():
        if strips == 1:
            return 0
        # SBHUFF CURT is log2(SBSTRIPS) RAW bits (§6.4.5 3(c)(iv))
        return reader.bits(log_strips) if huff else iait.decode(dec)

    def read_sid() -> int:
        if huff:
            return symtab.decode(reader)
        return _decode_iaid(dec, iaid_stats, symcodelen)

    region = np.full((h, w), bool(defpixel))
    dt0 = read_dt()
    if dt0 is OOB:
        raise ValueError("OOB STRIPT")
    stript = -dt0 * strips
    firsts = 0
    ninst = 0
    while ninst < num_inst:
        dt = read_dt()
        if dt is OOB:
            raise ValueError("OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = read_fs()
                if dfs is OOB:
                    raise ValueError("OOB first-symbol S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = read_ds()
                if ids is OOB:
                    break  # strip ends (§6.4.5 3(c)(ii))
                curs += ids + dsoffset
            curt = read_t()
            t = stript + curt
            sid = read_sid()
            if sid >= len(syms):
                raise ValueError("symbol ID out of range")
            bm = syms[sid]
            if refine:
                ri = reader.bit() if huff else iari.decode(dec)
                if ri is OOB:
                    raise ValueError("OOB refinement flag")
                if ri:
                    if huff:
                        rdw = rdw_tab.decode(reader)
                        rdh = rdh_tab.decode(reader)
                        rdx_ = rdx_tab.decode(reader)
                        rdy_ = rdy_tab.decode(reader)
                        rsize = rsize_tab.decode(reader)
                        reader.align()
                    else:
                        rdw = iardw.decode(dec)
                        rdh = iardh.decode(dec)
                        rdx_ = iardx.decode(dec)
                        rdy_ = iardy.decode(dec)
                    if OOB in (rdw, rdh, rdx_, rdy_):
                        raise ValueError("OOB refinement delta")
                    wo = bm.shape[1] + rdw
                    ho = bm.shape[0] + rdh
                    if wo <= 0 or ho <= 0:
                        raise ValueError(
                            "refined symbol instance has no pixels"
                        )
                    # GRREFERENCEDX/DY = ⌊RDW/2⌋+RDX, ⌊RDH/2⌋+RDY;
                    # TPGRON is 0 inside text regions (§6.4.11 step 6)
                    if huff:
                        # an independent byte-aligned MQ block of
                        # RSIZE bytes per instance (§6.4.11 for
                        # SBHUFF), fresh GR stats per block
                        rdec = MQDecoder(reader.take(rsize))
                        bm = _refine_loop(
                            rdec, ArithStats(1 << 13), wo, ho,
                            bm.astype(np.uint8),
                            rdw // 2 + rdx_, rdh // 2 + rdy_,
                            rtemplate, False, rat, None,
                        )
                    else:
                        bm = _refine_loop(
                            dec, gr_stats, wo, ho,
                            bm.astype(np.uint8),
                            rdw // 2 + rdx_, rdh // 2 + rdy_,
                            rtemplate, False, rat, None,
                        )
            hi, wi = bm.shape
            if transposed:
                # §6.4.5 3(c) TRANSPOSED=1: S runs down the page,
                # T across; bottom corners pre-advance S
                if refcorner in (0, 2):  # BL / BR
                    curs += hi - 1
                    y0 = curs - hi + 1
                else:
                    y0 = curs
                x0 = t if refcorner in (0, 1) else t - wi + 1
            else:
                if refcorner in (2, 3):  # BR / TR: S advances first
                    curs += wi - 1
                    x0 = curs - wi + 1
                else:
                    x0 = curs
                y0 = t if refcorner in (1, 3) else t - hi + 1
            tgt = region[y0 : y0 + hi, x0 : x0 + wi]
            if tgt.shape != bm.shape or x0 < 0 or y0 < 0:
                raise ValueError("symbol instance exceeds the region")
            if sbcombop == 0:
                tgt |= bm
            elif sbcombop == 1:
                tgt &= bm
            elif sbcombop == 2:
                tgt ^= bm
            else:
                tgt[...] = ~(tgt ^ bm)
            if transposed and refcorner in (1, 3):  # TL / TR
                curs += hi - 1
            elif not transposed and refcorner in (0, 1):  # BL / TL
                curs += wi - 1
            ninst += 1
            if ninst > num_inst:
                raise ValueError("SBNUMINSTANCES overrun")
    return {
        "x": x,
        "y": y,
        "comb_op": comb_op,
        "bitmap": region,
        "kind": "text",
        "n_instances": ninst,
    }


def _build_text_region_data(
    instances: list[tuple],
    syms: list[np.ndarray],
    region_wh: tuple[int, int],
    region_xy: tuple[int, int] = (0, 0),
    refcorner: str = "tl",
    comb_op: int = 0,
    transposed: bool = False,
    rtemplate: int = 0,
    huffman_tabs: dict | None = None,
    huffman_sel: tuple[int, int, int] = (3, 3, 3),
) -> bytes:
    """Encode a text region (arith, SBSTRIPS=1). ``instances`` hold
    (symbol-index, x, y) TOP-LEFT placements — optionally a fourth
    element ``{"bitmap": refined-output, "rdx": int, "rdy": int}``
    switching the region to SBREFINE=1 (§6.4.11): the instance is
    re-coded as a refinement of its symbol, RDW/RDH derived from the
    output shape. Refcorner and TRANSPOSED only change the coded
    (S, T) representation. ``huffman_tabs`` ({"fs","ds","dt"}:
    HuffTable) switches the region to SBHUFF=1 with custom-table
    selectors — the symbol-ID code table is emitted through the
    §7.4.4.1.1.1 runcode mechanism (balanced canonical lengths over
    ≥2 symbols); refinement inside SBHUFF is decode-only."""
    rc = _REFCORNERS.index(refcorner)
    w, h = region_wh
    symcodelen = max(1, (len(syms) - 1).bit_length())
    refine = any(len(inst) > 3 and inst[3] for inst in instances)
    if huffman_tabs is not None:
        if refine:
            raise NotImplementedError(
                "fixture encoder does not combine SBHUFF with SBREFINE"
            )
        return _build_text_region_huffman(
            instances, syms, region_wh, region_xy, refcorner,
            comb_op, transposed, huffman_tabs, huffman_sel,
        )
    enc = MQEncoder()
    iadt, iafs, iads = _IntEncoder(), _IntEncoder(), _IntEncoder()
    iari, iardw, iardh, iardx, iardy = (
        _IntEncoder(), _IntEncoder(), _IntEncoder(), _IntEncoder(),
        _IntEncoder(),
    )
    gr_stats = ArithStats(1 << 13)
    iaid_stats = ArithStats(1 << (symcodelen + 1))

    def eff_shape(inst) -> tuple[int, int]:
        if len(inst) > 3 and inst[3]:
            return inst[3]["bitmap"].shape
        return syms[inst[0]].shape

    def s_t(inst) -> tuple[int, int]:
        _sid, x0, y0 = inst[0], inst[1], inst[2]
        hi, wi = eff_shape(inst)
        if transposed:
            # S runs down the page (top edge), T across
            t = x0 if rc in (0, 1) else x0 + wi - 1
            return y0, t
        t = y0 if rc in (1, 3) else y0 + hi - 1
        return x0, t  # S is the left edge for every refcorner

    coded = sorted(
        ((*s_t(inst), inst) for inst in instances),
        key=lambda r: (r[1], r[0]),
    )
    iadt.encode(enc, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    i = 0
    while i < len(coded):
        t = coded[i][1]
        iadt.encode(enc, t - stript)
        stript = t
        first = True
        curs = 0
        while i < len(coded) and coded[i][1] == t:
            s, _, inst = coded[i]
            sid = inst[0]
            hi, wi = eff_shape(inst)
            if first:
                iafs.encode(enc, s - firsts)
                firsts = s
                first = False
            else:
                iads.encode(enc, s - curs)
            # far edge along the S axis, every refcorner
            curs = s + (hi if transposed else wi) - 1
            _encode_iaid(enc, iaid_stats, symcodelen, sid)
            if refine:
                ref = inst[3] if len(inst) > 3 else None
                if not ref:
                    iari.encode(enc, 0)
                else:
                    out_bm = ref["bitmap"].astype(bool)
                    base = syms[sid].astype(np.uint8)
                    rdw = out_bm.shape[1] - base.shape[1]
                    rdh = out_bm.shape[0] - base.shape[0]
                    rdx_ = ref.get("rdx", 0)
                    rdy_ = ref.get("rdy", 0)
                    iari.encode(enc, 1)
                    iardw.encode(enc, rdw)
                    iardh.encode(enc, rdh)
                    iardx.encode(enc, rdx_)
                    iardy.encode(enc, rdy_)
                    _refine_loop(
                        enc, gr_stats,
                        out_bm.shape[1], out_bm.shape[0], base,
                        rdw // 2 + rdx_, rdh // 2 + rdy_,
                        rtemplate, False, _GR_NOMINAL_AT, out_bm,
                    )
            i += 1
        iads.encode(enc, OOB)
    flags = (
        (2 if refine else 0)
        | (rc << 4)
        | ((1 if transposed else 0) << 6)
        | ((rtemplate & 1) << 15)
    )
    body = struct.pack(">IIII", w, h, *region_xy)
    body += bytes([comb_op & 7])
    body += struct.pack(">H", flags)
    if refine and rtemplate == 0:
        for dx, dy in _GR_NOMINAL_AT:
            body += struct.pack(">bb", dx, dy)
    body += struct.pack(">I", len(instances))
    return body + enc.flush()


def _build_text_region_huffman(
    instances: list[tuple],
    syms: list[np.ndarray],
    region_wh: tuple[int, int],
    region_xy: tuple[int, int],
    refcorner: str,
    comb_op: int,
    transposed: bool,
    tabs: dict,
    hsel: tuple[int, int, int] = (3, 3, 3),
) -> bytes:
    """SBHUFF=1 text region data (SBSTRIPS=1): huffman flags select
    the FS/DS/DT tables per ``hsel`` — 3 = CUSTOM (the referred
    type-53 segments are consumed in that order), 0-2 = the Annex B
    standard selectors, in which case ``tabs`` must hold the SAME
    tables the decoder will resolve through the codec_tables
    verified-constants hook. The symbol-ID code table rides the
    runcode mechanism with balanced canonical lengths, and the strip
    stream is one byte-aligned Huffman bitstream."""
    rc = _REFCORNERS.index(refcorner)
    w, h = region_wh
    n = len(syms)
    if n < 2:
        raise ValueError(
            "SBHUFF fixture needs >= 2 symbols (a 1-symbol canonical "
            "code cannot be Kraft-complete)"
        )
    k = (n - 1).bit_length()
    m = (1 << k) - n  # this many symbols take the shorter length
    sym_lens = [k - 1 if i < m else k for i in range(n)]
    symtab = HuffTable(
        [(ln, 0, i) for i, ln in enumerate(sym_lens) if ln]
    )
    used = sorted(set(sym_lens))
    if len(used) == 1:
        # a second 1-bit runcode completes the runcode table; the
        # stream never emits it
        used.append(used[0] + 1 if used[0] + 1 <= 34 else used[0] - 1)
    run_lens = [1 if i in used else 0 for i in range(35)]
    runtab = HuffTable(
        [(ln, 0, i) for i, ln in enumerate(run_lens) if ln]
    )
    wtr = _HuffWriter()
    for ln in run_lens:
        wtr.bits(ln, 4)
    for ln in sym_lens:
        runtab.encode(wtr, ln)
    wtr.align()

    def s_t(inst) -> tuple[int, int]:
        _sid, x0, y0 = inst[0], inst[1], inst[2]
        hi, wi = syms[inst[0]].shape
        if transposed:
            t = x0 if rc in (0, 1) else x0 + wi - 1
            return y0, t
        t = y0 if rc in (1, 3) else y0 + hi - 1
        return x0, t

    coded = sorted(
        ((*s_t(inst), inst) for inst in instances),
        key=lambda r: (r[1], r[0]),
    )
    tabs["dt"].encode(wtr, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    i = 0
    while i < len(coded):
        t = coded[i][1]
        tabs["dt"].encode(wtr, t - stript)
        stript = t
        first = True
        curs = 0
        while i < len(coded) and coded[i][1] == t:
            s, _, inst = coded[i]
            sid = inst[0]
            hi, wi = syms[sid].shape
            if first:
                tabs["fs"].encode(wtr, s - firsts)
                firsts = s
                first = False
            else:
                tabs["ds"].encode(wtr, s - curs)
            curs = s + (hi if transposed else wi) - 1
            symtab.encode(wtr, sid)
            i += 1
        tabs["ds"].encode(wtr, OOB)
    flags = 1 | (rc << 4) | ((1 if transposed else 0) << 6)
    hflags = hsel[0] | (hsel[1] << 2) | (hsel[2] << 4)
    body = struct.pack(">IIII", w, h, *region_xy)
    body += bytes([comb_op & 7])
    body += struct.pack(">HH", flags, hflags)
    body += struct.pack(">I", len(instances))
    return body + wtr.getvalue()


# ---------------------------------------------------------------------------
# Generic refinement region (§6.3) — re-code a bitmap against a
# reference (here: the page content under the region box, §7.4.7.2's
# no-referred-segment case). Lossy encoders refine coarse passes this
# way; the context mixes CURRENT-bitmap neighbours with a 3×3
# REFERENCE window displaced by (GRREFERENCEDX, GRREFERENCEDY).
# ---------------------------------------------------------------------------

# (layer, dx, dy) taps in shift order; layer 0 = current, 1 = reference
_GR_SLTP_CX = {0: 0x0100, 1: 0x0080}


def _refinement_taps(
    template: int,
    at: tuple[tuple[int, int], ...],
) -> list[tuple[int, int, int]]:
    if template == 0:
        a1, a2 = at
        return [
            (0, -1, 0), (0, 1, -1), (0, 0, -1), (0, a1[0], a1[1]),
            (1, 1, 1), (1, 0, 1), (1, -1, 1),
            (1, 1, 0), (1, 0, 0), (1, -1, 0),
            (1, 1, -1), (1, 0, -1),
            (1, a2[0], a2[1]),
        ]
    if template == 1:
        return [
            (0, -1, 0), (0, 1, -1), (0, 0, -1), (0, -1, -1),
            (1, 1, 1), (1, 0, 1),
            (1, 1, 0), (1, 0, 0), (1, -1, 0),
            (1, 0, -1),
        ]
    raise ValueError(f"GRTEMPLATE {template}")


_GR_NOMINAL_AT = ((-1, -1), (-1, -1))


def _refine_loop(
    coder,
    gr: ArithStats,
    width: int,
    height: int,
    ref: np.ndarray,
    rdx: int,
    rdy: int,
    template: int,
    tpgron: bool,
    at: tuple[tuple[int, int], ...],
    target: np.ndarray | None,
) -> np.ndarray:
    """Shared §6.3.5.6 row loop: decodes when ``target`` is None,
    encodes ``target`` otherwise (the context model is identical, so
    one transcription serves both directions)."""
    taps = _refinement_taps(template, at)
    pad = 1 + max(
        max(abs(dx), abs(dy)) for _, dx, dy in taps
    ) + max(abs(rdx), abs(rdy))
    w2 = width + 2 * pad
    rimg = np.zeros((height + 2 * pad, w2), np.uint8)
    rh, rw = ref.shape
    rimg[pad : pad + rh, pad : pad + rw] = ref
    # the reference layer and (when encoding) the 3×3 typical-window
    # sums are fully known up front, so their per-pixel contributions
    # are vectorized as shifted-slice adds over the whole region; the
    # Python loop keeps only the few CURRENT-layer taps (read from
    # bytearray rows as they are produced) and the sequential coder
    # calls. Context values and decisions are identical to the
    # all-scalar loop this replaces.
    rstatic = np.zeros((height, width), np.int64)
    cur_taps = []
    for shift, (layer, dx, dy) in enumerate(taps):
        if layer == 0:
            cur_taps.append((dx, dy, shift))
        else:
            oy, ox = dy - rdy, dx - rdx
            rstatic += (
                rimg[
                    pad + oy : pad + oy + height,
                    pad + ox : pad + ox + width,
                ].astype(np.int64)
                << shift
            )
    rstat_rows = rstatic.tolist()
    typ_rows = None
    if tpgron:
        bsum = np.zeros((height, width), np.int16)
        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                bsum += rimg[
                    pad + oy - rdy : pad + oy - rdy + height,
                    pad + ox - rdx : pad + ox - rdx + width,
                ]
        # -1 = not typical, else the copied pixel value
        typ = np.full((height, width), -1, np.int8)
        typ[bsum == 0] = 0
        typ[bsum == 9] = 1
        typ_rows = typ.tolist()
    rows = [bytearray(w2) for _ in range(height + 2 * pad)]
    if target is not None:
        tgt_rows = np.asarray(target, np.uint8).tolist()
    sltp_cx = _GR_SLTP_CX[template]
    decode = coder.decode if target is None else None
    encode = coder.encode if target is not None else None
    ltp = 0
    for y in range(height):
        if tpgron:
            if target is None:
                ltp ^= decode(sltp_cx, gr)
            else:
                # a row may ride typical prediction only if every
                # uniform-reference-window pixel equals that value
                want = 1
                trow = typ_rows[y]
                grow = tgt_rows[y]
                for x in range(width):
                    t = trow[x]
                    if t >= 0 and t != grow[x]:
                        want = 0
                        break
                encode(sltp_cx, ltp ^ want, gr)
                ltp = want
        row = rows[pad + y]
        rst_row = rstat_rows[y]
        trow = typ_rows[y] if tpgron else None
        grow = tgt_rows[y] if target is not None else None
        for x in range(width):
            if tpgron and ltp:
                # typical pixel: uniform 3×3 reference window
                # (§6.3.5.6) is copied, not coded
                t = trow[x]
                if t >= 0:
                    row[pad + x] = t
                    continue
            cx = rst_row[x]
            for dx, dy, shift in cur_taps:
                cx |= rows[pad + y + dy][pad + x + dx] << shift
            if target is None:
                row[pad + x] = decode(cx, gr)
            else:
                bit = grow[x]
                encode(cx, bit, gr)
                row[pad + x] = bit
    out = np.frombuffer(
        b"".join(rows[pad : pad + height]), np.uint8
    ).reshape(height, w2)
    return out[:, pad : pad + width].astype(bool)


def decode_refinement_bitmap(
    dec: MQDecoder,
    width: int,
    height: int,
    ref: np.ndarray,
    rdx: int = 0,
    rdy: int = 0,
    template: int = 0,
    tpgron: bool = False,
    at: tuple[tuple[int, int], ...] = _GR_NOMINAL_AT,
) -> np.ndarray:
    gr = ArithStats(1 << 13)
    return _refine_loop(
        dec, gr, width, height, ref, rdx, rdy, template, tpgron, at,
        None,
    )


def encode_refinement_bitmap(
    enc: MQEncoder,
    target: np.ndarray,
    ref: np.ndarray,
    rdx: int = 0,
    rdy: int = 0,
    template: int = 0,
    tpgron: bool = False,
    at: tuple[tuple[int, int], ...] = _GR_NOMINAL_AT,
) -> None:
    gr = ArithStats(1 << 13)
    h, w = target.shape
    _refine_loop(
        enc, gr, w, h, ref, rdx, rdy, template, tpgron, at, target
    )


def _parse_refinement_region(data: bytes) -> dict:
    """§7.4.7 header — decoding is deferred until composition time
    because the reference is the PAGE content under the region box."""
    w, h, x, y = struct.unpack_from(">IIII", data, 0)
    comb_op = data[16] & 0x07
    flags = data[17]
    template = flags & 1
    tpgron = bool(flags & 2)
    pos = 18
    at: tuple[tuple[int, int], ...] = _GR_NOMINAL_AT
    if template == 0:
        pairs = []
        for _ in range(2):
            pairs.append(
                (
                    struct.unpack_from(">b", data, pos)[0],
                    struct.unpack_from(">b", data, pos + 1)[0],
                )
            )
            pos += 2
        at = tuple(pairs)
    return {
        "x": x,
        "y": y,
        "comb_op": comb_op,
        "kind": "refine_pending",
        "w": w,
        "h": h,
        "template": template,
        "tpgron": tpgron,
        "at": at,
        "payload": data[pos:],
    }


# ---------------------------------------------------------------------------
# Pattern dictionary (§6.7) and halftone region (§6.6) — the
# grayscale-stamping path scanners use for dithered photo areas. The
# pattern dictionary is ONE wide generic bitmap (all patterns side by
# side, A1 = (−HDPW, 0) so each pattern predicts from its left
# neighbour); the halftone region decodes a gray-scale index image as
# Gray-coded bitplanes (Annex C.5) and stamps patterns on a grid.
# ---------------------------------------------------------------------------


def _pattern_at(hdpw: int, template: int) -> tuple[tuple[int, int], ...]:
    """§6.7.5 nominal AT pixels for the collective pattern bitmap."""
    if template == 0:
        return ((-hdpw, 0), (-3, -1), (2, -2), (-2, -2))
    return ((-hdpw, 0),)


def decode_pattern_dict_segment(data: bytes) -> list[np.ndarray]:
    """§7.4.4-style header + §6.7.5 collective-bitmap decode → the
    GRAYMAX+1 pattern bitmaps."""
    flags = data[0]
    mmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = data[1], data[2]
    if hdpw == 0 or hdph == 0:
        raise ValueError("zero-sized halftone pattern")
    (graymax,) = struct.unpack_from(">I", data, 3)
    payload = data[7:]
    width = (graymax + 1) * hdpw
    if mmr:
        from ccgp_data_wrangling_spark.operators.media_codecs import (
            decode_ccitt_g4,
        )

        collective = decode_ccitt_g4(bytes(payload), width, hdph)
    else:
        dec = MQDecoder(payload)
        gb = ArithStats(1 << _CX_BITS[template])
        collective = _decode_generic_bitmap(
            dec, gb, width, hdph, template, False,
            _pattern_at(hdpw, template),
        )
    return [
        collective[:, i * hdpw : (i + 1) * hdpw]
        for i in range(graymax + 1)
    ]


def _build_pattern_dict_data(
    patterns: list[np.ndarray], template: int = 0, mmr: bool = False
) -> bytes:
    """Encode patterns (all HDPH×HDPW) as the collective bitmap —
    arithmetic with the §6.7.5 AT layout, or one T.6 block (HDMMR)."""
    hdph, hdpw = patterns[0].shape
    if hdpw > 255 or hdph > 255:
        raise ValueError("halftone pattern exceeds 255×255")
    for p in patterns:
        if p.shape != (hdph, hdpw):
            raise ValueError("halftone patterns must share one shape")
    collective = np.concatenate(
        [p.astype(bool) for p in patterns], axis=1
    )
    if mmr:
        from ccgp_data_wrangling_spark.operators.media_codecs import (
            encode_ccitt_g4,
        )

        payload = encode_ccitt_g4(collective)
    else:
        enc = MQEncoder()
        gb = ArithStats(1 << _CX_BITS[template])
        _encode_generic_bitmap(
            enc, gb, collective, template, False,
            _pattern_at(hdpw, template),
        )
        payload = enc.flush()
    head = bytes(
        [(1 if mmr else 0) | ((template & 3) << 1), hdpw, hdph]
    )
    head += struct.pack(">I", len(patterns) - 1)
    return head + payload


def _mmr_decode_planes(
    data: bytes, width: int, height: int, nplanes: int
) -> list[np.ndarray]:
    """Annex C.5 with HMMR=1: all bitplanes live in ONE MMR-coded
    block, each followed by an EOFB; decoding of the next plane
    resumes at the exact bit position after it (no byte alignment)."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _t4_decode_2d_row,
        _t4_paint_row,
    )

    bits = "".join(f"{byte:08b}" for byte in data)
    pos = 0
    planes: list[np.ndarray] = []
    for p in range(nplanes):
        rows = np.zeros((height, width), bool)
        ref: list[int] = []
        for y in range(height):
            cur, pos = _t4_decode_2d_row(bits, pos, ref, width)
            _t4_paint_row(rows, y, cur)
            ref = cur
        if bits.startswith("000000000001" * 2, pos):
            pos += 24
        elif p < nplanes - 1:
            raise ValueError(
                "missing EOFB between MMR gray-scale bitplanes"
            )
        planes.append(rows)
    return planes


def _mmr_encode_planes(planes: list[np.ndarray]) -> bytes:
    """Inverse of :func:`_mmr_decode_planes`: bit-level concatenation
    of EOFB-terminated T.6 planes (no per-plane byte padding)."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _MsbBitWriter,
        _row_changes,
        _t4_encode_2d_row,
    )

    bw = _MsbBitWriter()
    for plane in planes:
        ref: list[int] = []
        for y in range(plane.shape[0]):
            cur = _row_changes(plane[y])
            _t4_encode_2d_row(bw, cur, ref, plane.shape[1])
            ref = cur
        bw.write("000000000001" * 2)
    return bw.done()


def _gray_unfold(planes: list[np.ndarray], bpp: int) -> np.ndarray:
    """Gray-coded bitplanes (MSB first) → plain binary values."""
    prev = planes[0].astype(np.uint8)
    acc = prev.astype(np.int64) << (bpp - 1)
    for j in range(bpp - 2, -1, -1):
        prev = planes[bpp - 1 - j].astype(np.uint8) ^ prev
        acc |= prev.astype(np.int64) << j
    return acc


def _gray_fold(values: np.ndarray, bpp: int) -> list[np.ndarray]:
    """Plain binary values → Gray-coded bitplanes, MSB first."""
    planes: list[np.ndarray] = [
        ((values >> (bpp - 1)) & 1).astype(bool)
    ]
    prev = ((values >> (bpp - 1)) & 1).astype(np.uint8)
    for j in range(bpp - 2, -1, -1):
        bit = ((values >> j) & 1).astype(np.uint8)
        planes.append((bit ^ prev).astype(bool))
        prev = bit
    return planes


def _decode_grayscale(
    dec: MQDecoder,
    gb: ArithStats,
    width: int,
    height: int,
    bpp: int,
    template: int,
    skip: "np.ndarray | None" = None,
) -> np.ndarray:
    """Annex C.5 — Gray-coded bitplanes, most significant first, all
    through one coder + GB bank; XOR-unfold to plain binary."""
    at = _NOMINAL_AT[template]
    prev = _decode_generic_bitmap(
        dec, gb, width, height, template, False, at, skip
    ).astype(np.uint8)
    acc = prev.astype(np.int64) << (bpp - 1)
    for j in range(bpp - 2, -1, -1):
        plane = _decode_generic_bitmap(
            dec, gb, width, height, template, False, at, skip
        ).astype(np.uint8)
        prev = plane ^ prev
        acc |= prev.astype(np.int64) << j
    return acc


def _encode_grayscale(
    enc: MQEncoder,
    gb: ArithStats,
    values: np.ndarray,
    bpp: int,
    template: int,
    skip: "np.ndarray | None" = None,
) -> None:
    at = _NOMINAL_AT[template]
    prev = ((values >> (bpp - 1)) & 1).astype(np.uint8)
    _encode_generic_bitmap(
        enc, gb, prev.astype(bool), template, False, at, skip
    )
    for j in range(bpp - 2, -1, -1):
        bit = ((values >> j) & 1).astype(np.uint8)
        _encode_generic_bitmap(
            enc, gb, (bit ^ prev).astype(bool), template, False, at,
            skip,
        )
        prev = bit


def decode_halftone_region_segment(
    data: bytes, patterns: list[np.ndarray]
) -> dict:
    """§6.6.5 — gray-scale image over the referred pattern dictionary,
    stamped on the (possibly skewed) 8.8 fixed-point grid."""
    w, h, x, y = struct.unpack_from(">IIII", data, 0)
    comb_op = data[16] & 0x07
    flags = data[17]
    mmr = bool(flags & 1)
    template = (flags >> 1) & 3
    enable_skip = bool((flags >> 3) & 1)
    hcombop = (flags >> 4) & 7
    hdefpixel = (flags >> 7) & 1
    hgw, hgh, hgx, hgy = struct.unpack_from(">IIii", data, 18)
    hrx, hry = struct.unpack_from(">HH", data, 34)
    if not patterns:
        raise ValueError("halftone region with no referred patterns")
    bpp = max(1, (len(patterns) - 1).bit_length())
    hph, hpw = patterns[0].shape
    if mmr and enable_skip:
        # §6.6.5.1: HSKIP applies to the arithmetic coder's context
        # model only — MMR rows carry every pixel
        raise ValueError("HENABLESKIP requires HMMR = 0")
    skip = (
        _halftone_skip(hgw, hgh, hgx, hgy, hrx, hry, hpw, hph, w, h)
        if enable_skip
        else None
    )
    if mmr:
        gray = _gray_unfold(
            _mmr_decode_planes(data[38:], hgw, hgh, bpp), bpp
        )
    else:
        dec = MQDecoder(data[38:])
        gb = ArithStats(1 << _CX_BITS[template])
        gray = _decode_grayscale(
            dec, gb, hgw, hgh, bpp, template, skip
        )
    region = np.full((h, w), bool(hdefpixel))
    for m in range(hgh):
        for n in range(hgw):
            if skip is not None and skip[m, n]:
                continue  # cell lies outside the region (§6.6.5.1)
            xx = (hgx + m * hry + n * hrx) >> 8
            yy = (hgy + m * hrx - n * hry) >> 8
            val = int(gray[m, n])
            if val >= len(patterns):
                raise ValueError("gray value exceeds the dictionary")
            bm = patterns[val]
            tgt = region[yy : yy + hph, xx : xx + hpw]
            if yy < 0 or xx < 0 or tgt.shape != bm.shape:
                raise ValueError("halftone cell exceeds the region")
            if hcombop == 0:
                tgt |= bm
            elif hcombop == 1:
                tgt &= bm
            elif hcombop == 2:
                tgt ^= bm
            elif hcombop == 3:
                tgt[...] = ~(tgt ^ bm)
            else:
                tgt[...] = bm
    return {
        "x": x,
        "y": y,
        "comb_op": comb_op,
        "bitmap": region,
        "kind": "halftone",
        "gray": gray,
    }


def _halftone_skip(
    hgw: int,
    hgh: int,
    hgx: int,
    hgy: int,
    hrx: int,
    hry: int,
    hpw: int,
    hph: int,
    w: int,
    h: int,
) -> np.ndarray:
    """§6.6.5.1 HSKIP: a grid cell whose pattern stamp lies entirely
    outside the region bitmap is skipped (not even gray-coded)."""
    skip = np.zeros((hgh, hgw), bool)
    for m in range(hgh):
        for n in range(hgw):
            x = (hgx + m * hry + n * hrx) >> 8
            y = (hgy + m * hrx - n * hry) >> 8
            if x + hpw <= 0 or x >= w or y + hph <= 0 or y >= h:
                skip[m, n] = True
    return skip


def _build_halftone_region_data(
    gray: np.ndarray,
    patterns: list[np.ndarray],
    region_wh: tuple[int, int],
    region_xy: tuple[int, int] = (0, 0),
    template: int = 0,
    grid_origin: tuple[int, int] = (0, 0),
    enable_skip: bool = False,
    mmr: bool = False,
) -> bytes:
    """Encode an axis-aligned halftone region: grid cell (m, n) takes
    pattern ``gray[m, n]``, stamped at grid_origin + (n·HDPW,
    m·HDPH). With ``enable_skip``, cells outside the region are not
    gray-coded (their gray values must be 0). With ``mmr``
    (HMMR=1), the Gray-coded bitplanes are one bit-concatenated
    EOFB-separated T.6 block instead of arithmetic."""
    hgh, hgw = gray.shape
    hph, hpw = patterns[0].shape
    bpp = max(1, (len(patterns) - 1).bit_length())
    if int(gray.max(initial=0)) >= len(patterns):
        raise ValueError("gray value exceeds the dictionary")
    if mmr and enable_skip:
        raise ValueError("HENABLESKIP requires HMMR = 0")
    w, h = region_wh
    gx, gy = grid_origin
    skip = None
    if enable_skip:
        skip = _halftone_skip(
            hgw, hgh, gx << 8, gy << 8, hpw << 8, 0, hpw, hph, w, h
        )
        if gray[skip].any():
            raise ValueError("skipped cells must carry gray value 0")
    if mmr:
        payload = _mmr_encode_planes(
            _gray_fold(gray.astype(np.int64), bpp)
        )
    else:
        enc = MQEncoder()
        gb = ArithStats(1 << _CX_BITS[template])
        _encode_grayscale(
            enc, gb, gray.astype(np.int64), bpp, template, skip
        )
        payload = enc.flush()
    body = struct.pack(">IIII", w, h, *region_xy)
    body += bytes([0])  # OR onto the page
    body += bytes(
        [(1 if mmr else 0) | ((template & 3) << 1)
         | (8 if enable_skip else 0)]
    )  # HCOMBOP OR
    # axis-aligned 8.8 grid: X vector (HDPW, 0); the mg step
    # (HRY, HRX) = (0, HDPW<<8) — HRX drives BOTH the ng x-step and
    # the mg y-step, so square stamping needs HPW == HPH
    if hpw != hph:
        raise ValueError("axis-aligned grid needs square patterns")
    body += struct.pack(">IIii", hgw, hgh, gx << 8, gy << 8)
    body += struct.pack(">HH", hpw << 8, 0)
    return body + payload

_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36

_SEG_SYMBOL_DICT = 0
_SEG_TEXT_INTERMEDIATE = 4
_SEG_TEXT_IMMEDIATE = 5
_SEG_TEXT_IMMEDIATE_LOSSLESS = 6

_SEG_PATTERN_DICT = 16
_SEG_HALFTONE_INTERMEDIATE = 20
_SEG_HALFTONE_IMMEDIATE = 22
_SEG_HALFTONE_IMMEDIATE_LOSSLESS = 23

_SEG_REFINE_INTERMEDIATE = 40
_SEG_REFINE_IMMEDIATE = 42
_SEG_REFINE_IMMEDIATE_LOSSLESS = 43

_GATED_SEGMENTS: dict[int, str] = {}


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
            # §7.2.7: unknown data length — only immediate generic
            # regions; the MQ stream ends with 0xFF 0xAC (which bit
            # stuffing guarantees never appears mid-stream), followed
            # by the 4-byte true row count
            if seg_type not in (
                _SEG_GENERIC_INTERMEDIATE,
                _SEG_GENERIC_IMMEDIATE,
                _SEG_GENERIC_IMMEDIATE_LOSSLESS,
            ):
                raise ValueError(
                    "unknown length on a non-generic-region segment"
                )
            rflags = buf[pos + 17]
            if rflags & 1:
                raise NotImplementedError(
                    "unknown-length MMR generic region (0x00 0x00 "
                    "can occur mid-stream)"
                )
            template_ul = (rflags >> 1) & 3
            search_from = pos + 18 + (8 if template_ul == 0 else 2)
            idx = buf.find(b"\xff\xac", search_from)
            if idx < 0:
                raise ValueError(
                    "unknown-length region without a terminator"
                )
            dlen = idx + 2 + 4 - pos
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
    if h == 0xFFFFFFFF:
        # §7.2.7 unknown-length carriage: the true row count trails
        # the 0xFF 0xAC terminator
        if not data[-6:-4] == b"\xff\xac":
            raise ValueError(
                "unknown-height region without a terminator"
            )
        (h,) = struct.unpack_from(">I", data, len(data) - 4)
        data = data[:-4]
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
    exports: dict[int, list[np.ndarray]] = {}
    huff_tables: dict[int, HuffTable] = {}
    for seg in segments:
        t = seg["type"]
        if t == _SEG_SYMBOL_DICT:
            input_syms: list[np.ndarray] = []
            for ref in seg["refs"]:
                input_syms.extend(exports.get(ref, []))
            exports[seg["number"]] = decode_symbol_dict_segment(
                seg["data"],
                input_syms,
                [huff_tables[r] for r in seg["refs"]
                 if r in huff_tables],
            )
        elif t in (
            _SEG_TEXT_IMMEDIATE,
            _SEG_TEXT_IMMEDIATE_LOSSLESS,
        ):
            syms: list[np.ndarray] = []
            for ref in seg["refs"]:
                syms.extend(exports.get(ref, []))
            regions.append(
                decode_text_region_segment(
                    seg["data"],
                    syms,
                    [huff_tables[r] for r in seg["refs"]
                     if r in huff_tables],
                )
            )
        elif t == _SEG_TEXT_INTERMEDIATE:
            raise NotImplementedError(
                "intermediate text region (auxiliary buffers)"
            )
        elif t == _SEG_PATTERN_DICT:
            exports[seg["number"]] = decode_pattern_dict_segment(
                seg["data"]
            )
        elif t in (
            _SEG_HALFTONE_IMMEDIATE,
            _SEG_HALFTONE_IMMEDIATE_LOSSLESS,
        ):
            pats: list[np.ndarray] = []
            for ref in seg["refs"]:
                pats.extend(exports.get(ref, []))
            regions.append(
                decode_halftone_region_segment(seg["data"], pats)
            )
        elif t == _SEG_HALFTONE_INTERMEDIATE:
            raise NotImplementedError(
                "intermediate halftone region (auxiliary buffers)"
            )
        elif t in (
            _SEG_REFINE_IMMEDIATE,
            _SEG_REFINE_IMMEDIATE_LOSSLESS,
        ):
            regions.append(_parse_refinement_region(seg["data"]))
        elif t == _SEG_REFINE_INTERMEDIATE:
            raise NotImplementedError(
                "intermediate refinement region (auxiliary buffers)"
            )
        elif t == _SEG_PAGE_INFO:
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
        elif t == 53:  # custom Huffman table (Annex B.2)
            huff_tables[seg["number"]] = parse_table_segment(
                seg["data"]
            )
        elif t in (
            _SEG_END_OF_PAGE,
            _SEG_END_OF_STRIPE,
            _SEG_END_OF_FILE,
            62,  # extension
            52,  # profiles
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
        if reg.get("kind") == "refine_pending":
            # §7.4.7.2 no-referred-segment case: the reference is the
            # page content under the region box AT THIS POINT of the
            # segment sequence — decode now, then compose
            x, y, w, h = reg["x"], reg["y"], reg["w"], reg["h"]
            ref = page[y : y + h, x : x + w]
            if ref.shape != (h, w):
                raise ValueError(
                    "refinement region exceeds the page bitmap"
                )
            dec = MQDecoder(reg["payload"])
            reg = dict(reg)
            reg["bitmap"] = decode_refinement_bitmap(
                dec, w, h, ref.astype(np.uint8),
                template=reg["template"], tpgron=reg["tpgron"],
                at=reg["at"],
            )
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


def _segment(
    number: int,
    seg_type: int,
    page: int,
    data: bytes,
    refs: tuple[int, ...] = (),
    unknown_length: bool = False,
) -> bytes:
    """§7.2 header with ≤4 referred-to segments, 1-byte page assoc
    (fixture segment numbers stay ≤ 256 so refs code in 1 byte)."""
    if len(refs) > 4 or number > 256:
        raise ValueError("fixture segment header limits exceeded")
    return (
        struct.pack(">IB", number, seg_type & 0x3F)
        + bytes([len(refs) << 5])  # count in top 3 bits, retain 0
        + bytes(refs)
        + struct.pack(">B", page)
        + struct.pack(
            ">I", 0xFFFFFFFF if unknown_length else len(data)
        )
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
    unknown_length: bool = False,
) -> bytes:
    """Build the PDF-embedded segment stream: page info (48) + one
    immediate lossless generic region (39) per bitmap + end of page
    (49). ``regions`` is a black-mask or a list of (mask, x, y).
    ``unknown_length`` writes §7.2.7 carriage: 0xFFFFFFFF header
    length AND region height, the true row count trailing the
    0xFF 0xAC terminator (arithmetic coding only)."""
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
    if unknown_length and mmr:
        raise NotImplementedError(
            "unknown-length MMR generic region (0x00 0x00 can occur "
            "mid-stream)"
        )
    for i, (bm, x, y) in enumerate(regions):
        h, w = bm.shape
        body = struct.pack(
            ">IIII", w, 0xFFFFFFFF if unknown_length else h, x, y
        )
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
        if unknown_length:
            body += struct.pack(">I", h)  # true row count (§7.2.7)
        out += _segment(
            1 + i, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, body,
            unknown_length=unknown_length,
        )
    out += _segment(1 + len(regions), _SEG_END_OF_PAGE, 1, b"")
    return out


def build_jbig2_text_embedded(
    symbols: list[np.ndarray],
    instances: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
    template: int = 0,
    refcorner: str = "tl",
    extra_generic: tuple[np.ndarray, int, int] | None = None,
    transposed: bool = False,
    huffman_dict: bool = False,
    custom_dw_spec: dict | None = None,
    huffman_text: bool = False,
) -> bytes:
    """Embedded stream for the symbol/text path: page info + symbol
    dictionary (type 0, export-all) + one immediate lossless text
    region (type 6) referring to it + end of page. ``instances`` are
    (symbol-index, x, y) top-left placements on the page — optionally
    a fourth refinement dict per ``_build_text_region_data``
    (SBREFINE, the lossy-plus-residual layout scanner encoders emit);
    ``extra_generic`` optionally appends a generic region (a page mix
    of text + graphics, the real scanned-document layout)."""
    pw, ph = page_wh
    page_data = struct.pack(">IIII", pw, ph, 0, 0)
    page_data += b"\x00" + struct.pack(">H", 0)
    out = _segment(0, _SEG_PAGE_INFO, 1, page_data)
    dict_refs: tuple[int, ...] = ()
    dict_num = 1
    custom_dw = None
    if custom_dw_spec is not None:
        if not huffman_dict:
            raise ValueError("custom tables need the SDHUFF dictionary")
        table_data = _build_table_segment(custom_dw_spec)
        # encode with the PARSED table so writer and decoder share
        # one canonical-code assignment by construction
        custom_dw = parse_table_segment(table_data)
        out += _segment(1, 53, 1, table_data)
        dict_refs = (1,)
        dict_num = 2
    dict_data, remap = _build_symbol_dict_data(
        symbols, template, huffman=huffman_dict, custom_dw=custom_dw
    )
    out += _segment(
        dict_num, _SEG_SYMBOL_DICT, 1, dict_data, refs=dict_refs
    )
    coded = [(remap[inst[0]], *inst[1:]) for inst in instances]
    order = sorted(range(len(symbols)), key=lambda i: remap[i])
    sorted_syms = [symbols[i].astype(bool) for i in order]
    text_refs: tuple[int, ...] = (dict_num,)
    huff_tabs = None
    nseg = dict_num + 1
    if huffman_text:
        # custom FS/DS/DT tables: inner ranges sized for fixture
        # deltas, 32-bit lower/upper escapes make coverage universal
        specs = {
            "fs": {"htlow": -64, "hthigh": 64,
                   "lines": [(2, 6), (2, 5), (2, 5)],
                   "lower_pref": 3, "upper_pref": 3},
            "ds": {"htlow": -16, "hthigh": 48,
                   "lines": [(2, 4), (2, 5), (3, 4)],
                   "lower_pref": 4, "upper_pref": 4, "oob_pref": 2},
            "dt": {"htlow": 0, "hthigh": 16, "lines": [(1, 4)],
                   "lower_pref": 2, "upper_pref": 2},
        }
        huff_tabs = {}
        for key in ("fs", "ds", "dt"):
            tdata = _build_table_segment(specs[key])
            huff_tabs[key] = parse_table_segment(tdata)
            out += _segment(nseg, 53, 1, tdata)
            text_refs = text_refs + (nseg,)
            nseg += 1
    text_data = _build_text_region_data(
        coded, sorted_syms, page_wh, (0, 0), refcorner,
        transposed=transposed, huffman_tabs=huff_tabs,
    )
    out += _segment(
        nseg, _SEG_TEXT_IMMEDIATE_LOSSLESS, 1, text_data,
        refs=text_refs,
    )
    nseg += 1
    if extra_generic is not None:
        bm, gx, gy = extra_generic
        h, w = bm.shape
        body = struct.pack(">IIII", w, h, gx, gy)
        body += bytes([0])  # OR onto the page
        body += bytes([template << 1])
        for dx, dy in _NOMINAL_AT[template]:
            body += struct.pack(">bb", dx, dy)
        body += encode_generic_region(bm.astype(bool), template)
        out += _segment(nseg, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, body)
        nseg += 1
    out += _segment(nseg, _SEG_END_OF_PAGE, 1, b"")
    return out


def build_jbig2_refined_embedded(
    base: np.ndarray,
    target: np.ndarray,
    template: int = 0,
    tpgron: bool = False,
    gen_template: int = 0,
) -> bytes:
    """Embedded stream for the refinement path: page info + a generic
    region carrying ``base`` + an immediate lossless refinement
    region (type 43) re-coding the page box into ``target`` (REPLACE
    composition) + end of page."""
    h, w = base.shape
    if target.shape != base.shape:
        raise ValueError("refinement target must match the base shape")
    page_data = struct.pack(">IIII", w, h, 0, 0)
    page_data += b"\x00" + struct.pack(">H", 0)
    out = _segment(0, _SEG_PAGE_INFO, 1, page_data)
    gbody = struct.pack(">IIII", w, h, 0, 0)
    gbody += bytes([0])  # OR onto the blank page
    gbody += bytes([gen_template << 1])
    for dx, dy in _NOMINAL_AT[gen_template]:
        gbody += struct.pack(">bb", dx, dy)
    gbody += encode_generic_region(base.astype(bool), gen_template)
    out += _segment(1, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, gbody)
    rbody = struct.pack(">IIII", w, h, 0, 0)
    rbody += bytes([4])  # REPLACE: the refined bitmap IS the new page
    rbody += bytes([(template & 1) | (2 if tpgron else 0)])
    if template == 0:
        for dx, dy in _GR_NOMINAL_AT:
            rbody += struct.pack(">bb", dx, dy)
    enc = MQEncoder()
    encode_refinement_bitmap(
        enc, target.astype(bool), base.astype(np.uint8),
        template=template, tpgron=tpgron,
    )
    rbody += enc.flush()
    out += _segment(2, _SEG_REFINE_IMMEDIATE_LOSSLESS, 1, rbody)
    out += _segment(3, _SEG_END_OF_PAGE, 1, b"")
    return out


def build_jbig2_halftone_embedded(
    gray: np.ndarray,
    patterns: list[np.ndarray],
    page_wh: tuple[int, int] | None = None,
    template: int = 0,
    enable_skip: bool = False,
    mmr: bool = False,
) -> bytes:
    """Embedded stream for the halftone path: page info + pattern
    dictionary (type 16) + one immediate lossless halftone region
    (type 23) referring to it + end of page. ``gray`` is the (HGH,
    HGW) pattern-index grid, stamped axis-aligned at (n·HDPW,
    m·HDPH). With ``enable_skip`` (HENABLESKIP), grid cells falling
    outside the region carry no coded bits — they must hold gray 0."""
    hgh, hgw = gray.shape
    hph, hpw = patterns[0].shape
    if page_wh is None:
        page_wh = (hgw * hpw, hgh * hph)
    pw, ph = page_wh
    page_data = struct.pack(">IIII", pw, ph, 0, 0)
    page_data += b"\x00" + struct.pack(">H", 0)
    out = _segment(0, _SEG_PAGE_INFO, 1, page_data)
    out += _segment(
        1, _SEG_PATTERN_DICT, 1,
        _build_pattern_dict_data(patterns, template, mmr=mmr),
    )
    out += _segment(
        2, _SEG_HALFTONE_IMMEDIATE_LOSSLESS, 1,
        _build_halftone_region_data(
            gray, patterns, page_wh, (0, 0), template,
            enable_skip=enable_skip, mmr=mmr,
        ),
        refs=(1,),
    )
    out += _segment(3, _SEG_END_OF_PAGE, 1, b"")
    return out
