"""JPEG 2000 Part 1 (ISO/IEC 15444-1 / ITU-T T.800) — the last
mainstream scanned-PDF image codec (``/JPXDecode``), from scratch on
public spec structure only.

The entropy layer is the SAME MQ arithmetic coder as JBIG2 (T.800
Annex C ≡ T.88 Annex E — identical state table and flowcharts), so
:class:`operators.jbig2.MQDecoder`/``MQEncoder``/``ArithStats`` are
reused verbatim; what this module adds is everything around it:

* codestream parse/build (SOC/SIZ/COD/QCD/SOT/SOD/EOC markers,
  Annex A), single tile, LRCP progression, one quality layer;
* Tier-2 packet headers (Annex B): tag trees (B.10.2), code-block
  inclusion, zero-bitplane signalling, coding-pass counts, Lblock
  length coding, 0xFF bit-stuffing;
* Tier-1 EBCOT coefficient coding (Annex D): three passes per
  bitplane (significance propagation, magnitude refinement, cleanup
  with run-length mode) over 4-row stripes, the D.1/D.2/D.3 context
  tables by subband orientation, JPEG 2000's context initialisation
  (UNIFORM=46, RUN-LENGTH=3, all-zero significance context=4);
* the 5/3 reversible wavelet (Annex F lifting with whole-sample
  symmetric extension) and the reversible colour transform (RCT);
* the 9/7 irreversible wavelet (Annex F float lifting, normalization
  pinned against the published Table F.4 filter taps), the ICT
  (G.3), and Annex E scalar-expounded dequantization with midpoint
  reconstruction — the dominant lossy scanned-PDF form;
* JP2 container walk (Part 1 Annex I boxes) down to the ``jp2c``
  codestream.

Component subsampling (XRsiz/YRsiz up to 4, e.g. 4:2:0 chroma)
decodes on the 9/7 path — per-component band extents, replication
upsampling before the ICT; it stays gated on the 5/3 path, whose
RCT needs co-sited components.

Scope (honest gates, each next to its implemented sibling): scalar
DERIVED quantization (single-pair QCD), truncated coding passes
(quality-layer truncation), precinct subdivision/SOP/EPH, multiple
layers/tiles/tile-parts, non-LRCP progressions, RGN/COC/QCC
overrides, and >38-bit coefficient depths raise
``NotImplementedError``.

The decoder and the fixture-side encoder share the pass loop and the
tag-tree transcription, so round-trip tests pin the internal
consistency of both (the same verification strategy as
operators/jbig2.py's SDHUFF tables).

Reference behavior parity: cademirch/ccgp-data-wrangling has no
image codec layer; this extends the engine's scanned-document corpus
surface the way operators/jbig2.py does for T.88.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

from ccgp_data_wrangling_spark.operators.jbig2 import (
    ArithStats,
    MQDecoder,
    MQEncoder,
)

# Tier-1 context indices (one bank of 19 contexts per code-block)
_CTX_SIG0 = 0          # 0-8: significance by D.1
_CTX_SIGN0 = 9         # 9-13: sign by D.2
_CTX_MAG0 = 14         # 14-16: magnitude refinement by D.3
_CTX_RUN = 17
_CTX_UNI = 18
_N_CTX = 19

# band orientation codes for context formation
_BAND_LL_LH = 0
_BAND_HL = 1
_BAND_HH = 2


def _fresh_stats() -> ArithStats:
    """JPEG 2000 context initialisation (D.2 note / Table D.7): all
    contexts start at state 0 except UNIFORM (46), RUN-LENGTH (3)
    and the all-zero significance context (4)."""
    st = ArithStats(_N_CTX)
    st.icx[_CTX_UNI] = 46
    st.icx[_CTX_RUN] = 3
    st.icx[_CTX_SIG0] = 4
    return st


def _sig_ctx(h: int, v: int, d: int, band: int) -> int:
    """Table D.1 significance contexts; HL swaps H/V, HH keys on D."""
    if band == _BAND_HL:
        h, v = v, h
    if band != _BAND_HH:
        if h == 2:
            return 8
        if h == 1:
            if v >= 1:
                return 7
            return 6 if d >= 1 else 5
        if v == 2:
            return 4
        if v == 1:
            return 3
        if d >= 2:
            return 2
        return 1 if d == 1 else 0
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        if hv >= 2:
            return 5
        return 4 if hv == 1 else 3
    if hv >= 2:
        return 2
    return 1 if hv == 1 else 0


# Table D.2: (H, V) sign contributions → (context, XOR bit)
_SIGN_CTX = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _T1State:
    """Per-code-block coefficient state (padded by 1 on each side so
    neighbour reads never branch; outside-block neighbours are
    insignificant by definition)."""

    def __init__(self, w: int, h: int) -> None:
        self.w, self.h = w, h
        self.sig = np.zeros((h + 2, w + 2), np.uint8)
        self.sgn = np.zeros((h + 2, w + 2), np.int8)  # -1/+1 when sig
        self.pi = np.zeros((h + 2, w + 2), np.uint8)
        self.refined = np.zeros((h + 2, w + 2), np.uint8)
        self.mag = np.zeros((h + 2, w + 2), np.int64)

    def hvd(self, y: int, x: int) -> tuple[int, int, int]:
        s = self.sig
        yy, xx = y + 1, x + 1
        h = int(s[yy, xx - 1]) + int(s[yy, xx + 1])
        v = int(s[yy - 1, xx]) + int(s[yy + 1, xx])
        d = (
            int(s[yy - 1, xx - 1]) + int(s[yy - 1, xx + 1])
            + int(s[yy + 1, xx - 1]) + int(s[yy + 1, xx + 1])
        )
        return h, v, d

    def sign_ctx(self, y: int, x: int) -> tuple[int, int]:
        s, g = self.sig, self.sgn
        yy, xx = y + 1, x + 1
        hc = int(s[yy, xx - 1]) * int(g[yy, xx - 1]) + int(
            s[yy, xx + 1]
        ) * int(g[yy, xx + 1])
        vc = int(s[yy - 1, xx]) * int(g[yy - 1, xx]) + int(
            s[yy + 1, xx]
        ) * int(g[yy + 1, xx])
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        return _SIGN_CTX[(hc, vc)]


def _t1_code_block(
    coder,
    stats: ArithStats,
    band: int,
    w: int,
    h: int,
    planes: int,
    target: np.ndarray | None,
) -> np.ndarray:
    """Shared Annex D pass loop: decodes when ``target`` is None,
    encodes the signed-coefficient array otherwise — one
    transcription of the context model serves both directions, the
    operators/jbig2.py ``_refine_loop`` strategy."""
    st = _T1State(w, h)
    if target is not None:
        tmag = np.abs(target.astype(np.int64))
        tsgn = np.where(target < 0, -1, 1).astype(np.int8)

    def code_bit(cx: int, wanted: int | None) -> int:
        if target is None:
            return coder.decode(cx, stats)
        coder.encode(cx, wanted, stats)
        return wanted  # type: ignore[return-value]

    def code_sign(y: int, x: int) -> None:
        cx, xor = st.sign_ctx(y, x)
        if target is None:
            bit = coder.decode(cx, stats)
            st.sgn[y + 1, x + 1] = -1 if bit ^ xor else 1
        else:
            neg = 1 if tsgn[y, x] < 0 else 0
            coder.encode(cx, neg ^ xor, stats)
            st.sgn[y + 1, x + 1] = tsgn[y, x]

    def mag_bit(y: int, x: int, p: int) -> int | None:
        return int((tmag[y, x] >> p) & 1) if target is not None else None

    def spp(p: int) -> None:
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if st.sig[y + 1, x + 1]:
                        continue
                    hh, vv, dd = st.hvd(y, x)
                    if hh + vv + dd == 0:
                        continue
                    cx = _CTX_SIG0 + _sig_ctx(hh, vv, dd, band)
                    bit = code_bit(cx, mag_bit(y, x, p))
                    st.pi[y + 1, x + 1] = 1
                    if bit:
                        st.sig[y + 1, x + 1] = 1
                        st.mag[y + 1, x + 1] |= 1 << p
                        code_sign(y, x)

    def mrp(p: int) -> None:
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if not st.sig[y + 1, x + 1] or st.pi[y + 1, x + 1]:
                        continue
                    if st.refined[y + 1, x + 1]:
                        cx = _CTX_MAG0 + 2
                    else:
                        hh, vv, dd = st.hvd(y, x)
                        cx = _CTX_MAG0 + (1 if hh + vv + dd else 0)
                    bit = code_bit(cx, mag_bit(y, x, p))
                    if bit:
                        st.mag[y + 1, x + 1] |= 1 << p
                    st.refined[y + 1, x + 1] = 1

    def cup(p: int) -> None:
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                # run-length mode: full 4-row stripe column, all four
                # insignificant, unvisited, with all-zero contexts
                rl = y0 + 4 <= h and all(
                    not st.sig[y0 + 1 + i, x + 1]
                    and not st.pi[y0 + 1 + i, x + 1]
                    and st.hvd(y0 + i, x) == (0, 0, 0)
                    for i in range(4)
                )
                if rl:
                    if target is not None:
                        some = any(
                            (tmag[y0 + i, x] >> p) & 1
                            for i in range(4)
                        )
                        coder.encode(_CTX_RUN, 1 if some else 0, stats)
                        run_hit = some
                    else:
                        run_hit = bool(coder.decode(_CTX_RUN, stats))
                    if not run_hit:
                        continue  # all four stay insignificant
                    if target is not None:
                        r = next(
                            i for i in range(4)
                            if (tmag[y0 + i, x] >> p) & 1
                        )
                        coder.encode(_CTX_UNI, (r >> 1) & 1, stats)
                        coder.encode(_CTX_UNI, r & 1, stats)
                    else:
                        r = (
                            coder.decode(_CTX_UNI, stats) << 1
                        ) | coder.decode(_CTX_UNI, stats)
                    y = y0 + r
                    st.sig[y + 1, x + 1] = 1
                    st.mag[y + 1, x + 1] |= 1 << p
                    code_sign(y, x)
                    y += 1
                for yy in range(y, min(y0 + 4, h)):
                    if st.sig[yy + 1, x + 1] or st.pi[yy + 1, x + 1]:
                        continue
                    hh, vv, dd = st.hvd(yy, x)
                    cx = _CTX_SIG0 + _sig_ctx(hh, vv, dd, band)
                    bit = code_bit(cx, mag_bit(yy, x, p))
                    if bit:
                        st.sig[yy + 1, x + 1] = 1
                        st.mag[yy + 1, x + 1] |= 1 << p
                        code_sign(yy, x)

    for p in range(planes - 1, -1, -1):
        if p != planes - 1:
            spp(p)
            mrp(p)
        cup(p)
        st.pi[...] = 0
    if target is not None:
        return target
    return (
        st.mag[1 : h + 1, 1 : w + 1]
        * np.where(st.sgn[1 : h + 1, 1 : w + 1] < 0, -1, 1)
    )


# ---------------------------------------------------------------------------
# Tag trees (B.10.2) — shared by inclusion and zero-bitplane coding
# ---------------------------------------------------------------------------


class TagTree:
    """Quad-tree over a (w × h) leaf grid. ``set_leaves`` fixes the
    encoder's values (internal nodes = min over their children);
    encode/decode share the threshold-walk state across calls, as the
    standard requires when several leaves share parents."""

    def __init__(self, w: int, h: int) -> None:
        dims = [(w, h)]
        while dims[-1] != (1, 1):
            pw, ph = dims[-1]
            dims.append(((pw + 1) // 2, (ph + 1) // 2))
        self.dims = dims[::-1]  # root first
        self.value = [
            np.zeros((dh, dw), np.int64) for dw, dh in self.dims
        ]
        self.lo = [np.zeros((dh, dw), np.int64) for dw, dh in self.dims]
        self.known = [
            np.zeros((dh, dw), bool) for dw, dh in self.dims
        ]

    def set_leaves(self, leaves: np.ndarray) -> None:
        self.value[-1][...] = leaves
        for lev in range(len(self.dims) - 2, -1, -1):
            child = self.value[lev + 1]
            ch, cw = child.shape
            ph, pw = self.value[lev].shape
            for y in range(ph):
                for x in range(pw):
                    self.value[lev][y, x] = child[
                        2 * y : min(2 * y + 2, ch),
                        2 * x : min(2 * x + 2, cw),
                    ].min()

    def _path(self, x: int, y: int):
        n = len(self.dims)
        return [(lev, x >> (n - 1 - lev), y >> (n - 1 - lev))
                for lev in range(n)]

    def decode(self, reader: "_PkBitReader", x: int, y: int,
               threshold: int) -> bool:
        """→ True iff the leaf value is known and < threshold (the
        leaf value is then ``leaf_value(x, y)``)."""
        cur = 0
        for lev, nx, ny in self._path(x, y):
            if self.lo[lev][ny, nx] < cur:
                self.lo[lev][ny, nx] = cur
            while (
                not self.known[lev][ny, nx]
                and self.lo[lev][ny, nx] < threshold
            ):
                if reader.bit():
                    self.known[lev][ny, nx] = True
                else:
                    self.lo[lev][ny, nx] += 1
            cur = int(self.lo[lev][ny, nx])
        return bool(self.known[-1][y, x]) and cur < threshold

    def leaf_value(self, x: int, y: int) -> int:
        return int(self.lo[-1][y, x])

    def encode(self, writer: "_PkBitWriter", x: int, y: int,
               threshold: int) -> None:
        cur = 0
        for lev, nx, ny in self._path(x, y):
            if self.lo[lev][ny, nx] < cur:
                self.lo[lev][ny, nx] = cur
            while (
                not self.known[lev][ny, nx]
                and self.lo[lev][ny, nx] < threshold
            ):
                if self.lo[lev][ny, nx] == self.value[lev][ny, nx]:
                    writer.bit(1)
                    self.known[lev][ny, nx] = True
                else:
                    writer.bit(0)
                    self.lo[lev][ny, nx] += 1
            cur = int(self.lo[lev][ny, nx])


class _PkBitWriter:
    """Packet-header bit writer with B.10.1 0xFF stuffing: a byte
    following 0xFF carries only 7 payload bits (MSB forced 0)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def _cap(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def bit(self, b: int) -> None:
        self._acc = (self._acc << 1) | (b & 1)
        self._n += 1
        if self._n == self._cap():
            self.out.append(self._acc)
            self._acc, self._n = 0, 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def flush(self) -> bytes:
        while self._n:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)  # stuffed pad so a header never ends 0xFF
        return bytes(self.out)


class _PkBitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._d = data
        self._pos = pos
        self._acc = 0
        self._n = 0
        self._prev = 0

    def bit(self) -> int:
        if self._n == 0:
            if self._pos >= len(self._d):
                raise ValueError("packet header exhausted")
            self._prev_byte_was_ff = self._prev == 0xFF
            self._prev = self._d[self._pos]
            self._acc = self._prev
            self._pos += 1
            self._n = 7 if self._prev_byte_was_ff else 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """Byte-align and return the next byte offset, skipping the
        stuffed pad byte when the final header byte was 0xFF."""
        self._n = 0
        if self._prev == 0xFF:
            if self._pos >= len(self._d):
                raise ValueError("missing stuffed pad byte")
            if self._d[self._pos] & 0x80:
                raise ValueError("invalid stuffing after 0xFF")
            self._pos += 1
        return self._pos


# ---------------------------------------------------------------------------
# 5/3 reversible wavelet (Annex F lifting, whole-sample symmetric
# extension; parity is preserved by the mirror so subband identities
# hold for odd extents too)
# ---------------------------------------------------------------------------


def _mirror(i: int, n: int) -> int:
    if n == 1:
        return 0
    p = 2 * (n - 1)
    i = abs(i) % p
    return i if i < n else p - i


def _fsd_1d(x: np.ndarray) -> np.ndarray:
    n = len(x)
    if n == 1:
        return x.copy()
    y = np.empty(n, np.int64)
    for k in range(1, n, 2):
        y[k] = x[k] - (
            (x[_mirror(k - 1, n)] + x[_mirror(k + 1, n)]) >> 1
        )
    for k in range(0, n, 2):
        y[k] = x[k] + (
            (y[_mirror(k - 1, n)] + y[_mirror(k + 1, n)] + 2) >> 2
        )
    return y


def _isr_1d(y: np.ndarray) -> np.ndarray:
    n = len(y)
    if n == 1:
        return y.copy()
    x = np.empty(n, np.int64)
    for k in range(0, n, 2):
        x[k] = y[k] - (
            (y[_mirror(k - 1, n)] + y[_mirror(k + 1, n)] + 2) >> 2
        )
    for k in range(1, n, 2):
        x[k] = y[k] + (
            (x[_mirror(k - 1, n)] + x[_mirror(k + 1, n)]) >> 1
        )
    return x


# ---------------------------------------------------------------------------
# 9/7 irreversible transform (Annex F) — float64 lifting. The four
# lifting parameters and K are the public T.800 values; the final
# normalization (lowpass × 1/K, highpass × K) is pinned by a unit
# test that matches the lifting impulse response against the Annex F
# Table F.4 analysis filter taps, so a convention slip cannot hide.
# ---------------------------------------------------------------------------

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _fsd97_1d(x: np.ndarray) -> np.ndarray:
    n = len(x)
    if n == 1:
        raise NotImplementedError(
            "9/7 on a 1-sample subsignal (too many decomposition "
            "levels for the image extent)"
        )
    y = x.astype(np.float64).copy()
    for a in (_A97, _G97):
        for k in range(1, n, 2):
            y[k] += a * (y[_mirror(k - 1, n)] + y[_mirror(k + 1, n)])
        a_is_last = a is _G97
        b = _D97 if a_is_last else _B97
        for k in range(0, n, 2):
            y[k] += b * (y[_mirror(k - 1, n)] + y[_mirror(k + 1, n)])
    for k in range(0, n, 2):
        y[k] *= 1.0 / _K97
    for k in range(1, n, 2):
        y[k] *= _K97
    return y


def _isr97_1d(y: np.ndarray) -> np.ndarray:
    n = len(y)
    if n == 1:
        raise NotImplementedError(
            "9/7 on a 1-sample subsignal (too many decomposition "
            "levels for the image extent)"
        )
    x = y.astype(np.float64).copy()
    for k in range(0, n, 2):
        x[k] *= _K97
    for k in range(1, n, 2):
        x[k] *= 1.0 / _K97
    for a in (_D97, _B97):
        for k in range(0, n, 2):
            x[k] -= a * (x[_mirror(k - 1, n)] + x[_mirror(k + 1, n)])
        b = _G97 if a is _D97 else _A97
        for k in range(1, n, 2):
            x[k] -= b * (x[_mirror(k - 1, n)] + x[_mirror(k + 1, n)])
    return x


def _fdwt97(img: np.ndarray, levels: int) -> list[dict[str, np.ndarray]]:
    """Same banding as :func:`_fdwt53`, float64 coefficients."""
    cur = img.astype(np.float64)
    triples: list[dict[str, np.ndarray]] = []
    for _ in range(levels):
        h, w = cur.shape
        t = np.empty_like(cur)
        for r in range(h):
            t[r] = _fsd97_1d(cur[r])
        for c in range(w):
            t[:, c] = _fsd97_1d(t[:, c])
        triples.append(
            {"HL": t[0::2, 1::2], "LH": t[1::2, 0::2],
             "HH": t[1::2, 1::2]}
        )
        cur = t[0::2, 0::2]
    return [{"LL": cur}] + triples[::-1]


def _idwt97(bands: list[dict[str, np.ndarray]]) -> np.ndarray:
    cur = bands[0]["LL"].astype(np.float64)
    for triple in bands[1:]:
        hl, lh, hh = triple["HL"], triple["LH"], triple["HH"]
        h = cur.shape[0] + lh.shape[0]
        w = cur.shape[1] + hl.shape[1]
        y = np.empty((h, w), np.float64)
        y[0::2, 0::2] = cur
        y[0::2, 1::2] = hl
        y[1::2, 0::2] = lh
        y[1::2, 1::2] = hh
        for c in range(w):
            y[:, c] = _isr97_1d(y[:, c])
        for r in range(h):
            y[r] = _isr97_1d(y[r])
        cur = y
    return cur


# Quantization (Annex E): Δ_b = 2^(R_b − ε_b) · (1 + μ_b / 2^11) with
# R_b = component depth + base-2 log of the subband gain (Table E.1).
_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _q97_delta(depth: int, name: str, eps: int, mu: int) -> float:
    rb = depth + _BAND_GAIN[name]
    return (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)


def _q97_select(
    band_max: float, depth: int, name: str, q_planes: int
) -> tuple[int, int]:
    """(ε, μ) so that max |q| stays under ``2**q_planes`` — the
    fixture encoder's rate knob. The exact Δ both sides use is then
    recomputed from the marker-coded (ε, μ), never from the target."""
    rb = depth + _BAND_GAIN[name]
    if band_max <= 0.0:
        return min(rb, 31), 0  # any valid step; band codes no blocks
    target = band_max / (2.0**q_planes - 1.0)
    f = int(np.floor(np.log2(target)))
    eps = rb - f
    mu = int(round((target / (2.0**f) - 1.0) * 2048.0))
    if mu > 2047:
        mu = 0
        eps -= 1
    if eps > 31:
        # near-zero band (e.g. highpass of a constant image): the
        # finest representable step still quantizes everything to 0
        return 31, 0
    if eps < 0:
        raise ValueError(
            f"9/7 quantization exponent {eps} out of the 5-bit "
            f"range for band {name} (depth {depth}, max {band_max})"
        )
    return eps, mu


# ICT (Annex G.3) — the irreversible colour transform paired with the
# 9/7 wavelet; BT.601 luma weights, public constants.
def _ict_fwd(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ict_inv(y, cb, cr):
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return r, g, b


def _fdwt53(img: np.ndarray, levels: int) -> list[dict[str, np.ndarray]]:
    """→ per-resolution subbands: index 0 is the final LL, then one
    {HL, LH, HH} triple per resolution from coarsest to finest."""
    cur = img.astype(np.int64)
    triples: list[dict[str, np.ndarray]] = []
    for _ in range(levels):
        h, w = cur.shape
        t = np.empty_like(cur)
        for r in range(h):
            t[r] = _fsd_1d(cur[r])
        for c in range(w):
            t[:, c] = _fsd_1d(t[:, c])
        triples.append(
            {"HL": t[0::2, 1::2], "LH": t[1::2, 0::2],
             "HH": t[1::2, 1::2]}
        )
        cur = t[0::2, 0::2]
    return [{"LL": cur}] + triples[::-1]


def _idwt53(bands: list[dict[str, np.ndarray]]) -> np.ndarray:
    cur = bands[0]["LL"].astype(np.int64)
    for triple in bands[1:]:
        hl, lh, hh = triple["HL"], triple["LH"], triple["HH"]
        h = cur.shape[0] + lh.shape[0]
        w = cur.shape[1] + hl.shape[1]
        y = np.empty((h, w), np.int64)
        y[0::2, 0::2] = cur
        y[0::2, 1::2] = hl
        y[1::2, 0::2] = lh
        y[1::2, 1::2] = hh
        for c in range(w):
            y[:, c] = _isr_1d(y[:, c])
        for r in range(h):
            y[r] = _isr_1d(y[r])
        cur = y
    return cur


# ---------------------------------------------------------------------------
# Codestream (Annex A) + packets (Annex B)
# ---------------------------------------------------------------------------

_SOC = 0xFF4F
_SIZ = 0xFF51
_COD = 0xFF52
_COC = 0xFF53
_QCD = 0xFF5C
_QCC = 0xFF5D
_RGN = 0xFF5E
_SOT = 0xFF90
_SOD = 0xFF93
_EOC = 0xFFD9
_COM = 0xFF64

_BAND_CODE = {"LL": _BAND_LL_LH, "LH": _BAND_LL_LH,
              "HL": _BAND_HL, "HH": _BAND_HH}

_CB = 64  # fixed 64x64 code-blocks (exponent 6 in COD SPcod)


def _band_dims(w: int, h: int, levels: int) -> list[dict[str, tuple]]:
    """Subband extents by repeated ceil/floor halving, mirroring the
    _fdwt53 slicing."""
    dims = []
    cw, ch = w, h
    triples = []
    for _ in range(levels):
        lw, lh = (cw + 1) // 2, (ch + 1) // 2
        hw, hh = cw // 2, ch // 2
        triples.append(
            {"HL": (hw, lh), "LH": (lw, hh), "HH": (hw, hh)}
        )
        cw, ch = lw, lh
    return [{"LL": (cw, ch)}] + triples[::-1]


def _code_numpasses_w(w: _PkBitWriter, n: int) -> None:
    if n == 1:
        w.bit(0)
    elif n == 2:
        w.bits(0b10, 2)
    elif n <= 5:
        w.bits(0b11, 2)
        w.bits(n - 3, 2)
    elif n <= 36:
        w.bits(0b1111, 4)
        w.bits(n - 6, 5)
    elif n <= 164:
        w.bits(0b111111111, 9)
        w.bits(n - 37, 7)
    else:
        raise ValueError("coding-pass count over 164")


def _code_numpasses_r(r: _PkBitReader) -> int:
    if not r.bit():
        return 1
    if not r.bit():
        return 2
    v = r.bits(2)
    if v < 3:
        return 3 + v
    v = r.bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.bits(7)


def _quantize_97(
    comps: list[np.ndarray], levels: int, bit_depth: int,
    q_planes: int,
) -> tuple[list[list[dict[str, np.ndarray]]], list[int], list[int], int]:
    """Forward 9/7 + Annex E deadzone quantization for every
    component → (int quantizer-index bands, ε list, μ list, guard).
    Shared by the encoder and :func:`jpx97_reference_decode` so the
    codestream round-trip is checked against one quantizer, not two
    (the JPEG all-ones-table oracle strategy adapted to lossy)."""
    bands_f = [_fdwt97(c, levels) for c in comps]
    eps: list[int] = []
    mus: list[int] = []
    deltas: list[float] = []
    for ri, res in enumerate(bands_f[0]):
        for name in ("LL", "HL", "LH", "HH"):
            if name not in res:
                continue
            m = 0.0
            for bf in bands_f:
                band = bf[ri][name]
                if band.size:
                    m = max(m, float(np.abs(band).max()))
            e, mu = _q97_select(m, bit_depth, name, q_planes)
            eps.append(e)
            mus.append(mu)
            deltas.append(_q97_delta(bit_depth, name, e, mu))
    all_bands: list[list[dict[str, np.ndarray]]] = []
    need_bits = [1] * len(eps)
    for bf in bands_f:
        per_comp: list[dict[str, np.ndarray]] = []
        for ri, res in enumerate(bf):
            out_res: dict[str, np.ndarray] = {}
            for name in ("LL", "HL", "LH", "HH"):
                if name not in res:
                    continue
                band = res[name]
                qi = _qcd_index(ri, name)
                q = np.floor(np.abs(band) / deltas[qi]).astype(
                    np.int64
                ) * np.where(band < 0, -1, 1)
                out_res[name] = q
                if q.size:
                    mq = int(np.abs(q).max())
                    need_bits[qi] = max(
                        need_bits[qi], max(1, mq.bit_length())
                    )
            per_comp.append(out_res)
        all_bands.append(per_comp)
    # Mb = guard + ε - 1 must cover the actual quantizer magnitudes
    guard = max(
        [2] + [need_bits[i] - eps[i] + 1 for i in range(len(eps))]
    )
    if guard > 7:
        raise ValueError(
            f"9/7 guard bits {guard} over the 3-bit field "
            f"(q_planes too large for the band exponents)"
        )
    return all_bands, eps, mus, guard


def _block_mean(a: np.ndarray, xr: int, yr: int) -> np.ndarray:
    """Downsample by (yr, xr) block means; partial edge blocks are
    padded by edge replication first, so the result has
    ceil(h/yr) × ceil(w/xr) samples — the SIZ component extent."""
    h, w = a.shape
    ph = (-h) % yr
    pw = (-w) % xr
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    return a.reshape(
        a.shape[0] // yr, yr, a.shape[1] // xr, xr
    ).mean(axis=(1, 3))


def _prep_97_components(
    samples: np.ndarray,
    bit_depth: int,
    subsample: tuple[int, int] | None = None,
) -> tuple[list[np.ndarray], int]:
    """DC level shift + ICT (G.3) → float64 component list, mct flag.
    ``subsample=(xr, yr)`` block-averages the CHROMA components
    (4:2:0-style) after the ICT."""
    shift = float(1 << (bit_depth - 1))
    if samples.ndim == 2:
        if subsample is not None:
            raise ValueError("subsampling applies to RGB input only")
        return [samples.astype(np.float64) - shift], 0
    r = samples[..., 0].astype(np.float64) - shift
    g = samples[..., 1].astype(np.float64) - shift
    b = samples[..., 2].astype(np.float64) - shift
    y, cb, cr = _ict_fwd(r, g, b)
    if subsample is not None:
        xr, yr = subsample
        cb = _block_mean(cb, xr, yr)
        cr = _block_mean(cr, xr, yr)
    return [y, cb, cr], 1


def encode_jpx(
    samples: np.ndarray,
    bit_depth: int = 8,
    levels: int = 2,
    eps_slack: int = 0,
    jp2_container: bool = False,
    irreversible: bool = False,
    q_planes: int = 9,
    subsample: tuple[int, int] | None = None,
) -> bytes:
    """Fixture writer: one tile, one layer, LRCP, 64×64 code-blocks,
    RCT for 3-component input. ``samples`` is (h, w) grayscale or
    (h, w, 3) RGB of unsigned ``bit_depth`` values. ``eps_slack``
    inflates the per-band exponent so the zero-bitplane tag-tree path
    carries real work (reversible path only). ``irreversible=True``
    switches to the 9/7 float transform + ICT + Annex E scalar
    expounded quantization with ``q_planes`` magnitude planes as the
    rate knob."""
    h, w = samples.shape[:2]
    if min(h, w) < 1:
        raise ValueError("empty image")
    if samples.ndim == 3 and samples.shape[2] != 3:
        raise ValueError("samples must be (h, w) or (h, w, 3)")
    if samples.ndim not in (2, 3):
        raise ValueError("samples must be (h, w) or (h, w, 3)")
    if irreversible:
        if eps_slack:
            raise ValueError(
                "eps_slack applies to the reversible path only"
            )
        comps_f, mct = _prep_97_components(
            samples, bit_depth, subsample
        )
        all_bands, eps, mus, guard = _quantize_97(
            comps_f, levels, bit_depth, q_planes
        )
        ncomp = len(comps_f)
    elif subsample is not None:
        raise ValueError(
            "subsampling pairs with the irreversible (ICT) path"
        )
    else:
        if samples.ndim == 2:
            comps = [samples.astype(np.int64)]
            mct = 0
        else:
            r = samples[..., 0].astype(np.int64)
            g = samples[..., 1].astype(np.int64)
            b = samples[..., 2].astype(np.int64)
            comps = [(r + 2 * g + b) >> 2, b - g, r - g]  # RCT (G.2)
            mct = 1
        shift = 1 << (bit_depth - 1)
        comps[0] = comps[0] - shift  # DC level shift (first component
        # only under RCT; chroma differences are already signed)
        # per-component wavelet
        all_bands = [_fdwt53(c, levels) for c in comps]
        ncomp = len(comps)
        # quantization exponents: enough magnitude bits for the
        # actual coefficients (+ slack), G = 2 guard bits →
        # Mb = G + eps - 1
        guard = 2
        # QCD is codestream-global (no QCC emitted): one exponent per
        # subband, sized to the max magnitude across components
        eps = []
        for ri, res in enumerate(all_bands[0]):
            for name in ("LL", "HL", "LH", "HH"):
                if name not in res:
                    continue
                m = 0
                for bands in all_bands:
                    band = bands[ri][name]
                    if band.size:
                        m = max(m, int(np.abs(band).max()))
                need = max(1, m.bit_length())
                e = need - guard + 1 + eps_slack
                if e < 0:
                    e = 0
                if e > 31:
                    raise ValueError("exponent over 31")
                eps.append(e)
    dims = _band_dims(w, h, levels)
    # markers
    out = bytearray()
    out += struct.pack(">H", _SOC)
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, ncomp
    )
    for c in range(ncomp):
        xr, yr = (
            subsample if subsample is not None and c > 0 else (1, 1)
        )
        siz += bytes([bit_depth - 1, xr, yr])
    out += struct.pack(">HH", _SIZ, len(siz) + 2) + siz
    cod = bytes([0])  # Scod: default precincts, no SOP/EPH
    cod += bytes([0]) + struct.pack(">H", 1) + bytes([mct])  # SGcod
    # SPcod: 64x64 code-blocks; transform byte 0 = 9/7, 1 = 5/3
    cod += bytes([levels, 6 - 2, 6 - 2, 0, 0 if irreversible else 1])
    out += struct.pack(">HH", _COD, len(cod) + 2) + cod
    if irreversible:
        # Sqcd style 2: scalar expounded, one 16-bit (ε, μ) per band
        qcd = bytes([(guard << 5) | 2])
        for e, mu in zip(eps, mus):
            qcd += struct.pack(">H", (e << 11) | mu)
    else:
        qcd = bytes([guard << 5])  # Sqcd: no quantization, G guard
        for e in eps:
            qcd += bytes([e << 3])
    out += struct.pack(">HH", _QCD, len(qcd) + 2) + qcd
    # tile: packets LRCP — layer(1) → resolution → component
    body = bytearray()
    for r in range(levels + 1):
        for c in range(ncomp):
            hdr = _PkBitWriter()
            hdr.bit(1)  # packet non-empty
            cb_payloads: list[bytes] = []
            for name in ("LL", "HL", "LH", "HH"):
                if name not in all_bands[c][r]:
                    continue
                coeffs = all_bands[c][r][name]
                bh, bw = coeffs.shape
                if bw == 0 or bh == 0:
                    continue
                # code-block grid over the band (the whole band is
                # one precinct at the default 2^15 size); inclusion
                # and zero-bitplane tag trees span the grid
                gw = (bw + _CB - 1) // _CB
                gh = (bh + _CB - 1) // _CB
                inc = TagTree(gw, gh)
                zbp = TagTree(gw, gh)
                mb = guard + eps[_qcd_index(r, name)] - 1
                inc_leaves = np.zeros((gh, gw), np.int64)
                zbp_leaves = np.full((gh, gw), mb, np.int64)
                blocks: dict[tuple[int, int], tuple] = {}
                for by in range(gh):
                    for bx in range(gw):
                        blk = coeffs[
                            by * _CB : (by + 1) * _CB,
                            bx * _CB : (bx + 1) * _CB,
                        ]
                        m = int(np.abs(blk).max())
                        if m == 0:
                            inc_leaves[by, bx] = 1  # not included
                            continue
                        planes = m.bit_length()
                        p0 = mb - planes
                        if p0 < 0:
                            raise AssertionError("exponent under-sized")
                        zbp_leaves[by, bx] = p0
                        blocks[(by, bx)] = (blk, planes, p0)
                inc.set_leaves(inc_leaves)
                zbp.set_leaves(zbp_leaves)
                for by in range(gh):
                    for bx in range(gw):
                        inc.encode(hdr, bx, by, 1)
                        if (by, bx) not in blocks:
                            continue
                        blk, planes, p0 = blocks[(by, bx)]
                        zbp.encode(hdr, bx, by, p0 + 1)
                        npass = 3 * planes - 2
                        _code_numpasses_w(hdr, npass)
                        enc = MQEncoder()
                        stats = _fresh_stats()
                        _t1_code_block(
                            enc, stats, _BAND_CODE[name],
                            blk.shape[1], blk.shape[0], planes, blk,
                        )
                        payload = enc.flush()
                        if payload.endswith(b"\xff\xac"):
                            payload = payload[:-2]
                        while payload.endswith(b"\xff"):
                            payload = payload[:-1]
                        lblock = 3
                        nbits = lblock + _ilog2(npass)
                        while len(payload) >= (1 << nbits):
                            hdr.bit(1)
                            lblock += 1
                            nbits += 1
                        hdr.bit(0)
                        hdr.bits(len(payload), nbits)
                        cb_payloads.append(payload)
            body += hdr.flush()
            for pl in cb_payloads:
                body += pl
    psot = 12 + 2 + len(body)
    out += struct.pack(">HHHIBB", _SOT, 10, 0, psot, 0, 1)
    out += struct.pack(">H", _SOD)
    out += body
    out += struct.pack(">H", _EOC)
    codestream = bytes(out)
    if not jp2_container:
        return codestream
    return _wrap_jp2(codestream, w, h, ncomp, bit_depth)


def _ilog2(n: int) -> int:
    return n.bit_length() - 1


def _qcd_index(r: int, name: str) -> int:
    """Index into the QCD subband-exponent list for resolution r."""
    if r == 0:
        return 0
    base = 1 + 3 * (r - 1)
    return base + ("HL", "LH", "HH").index(name)


def _wrap_jp2(
    codestream: bytes, w: int, h: int, ncomp: int, depth: int
) -> bytes:
    def box(tbox: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tbox + payload

    sig = box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(
        b"ihdr",
        struct.pack(">IIHBBBB", h, w, ncomp, depth - 1, 7, 0, 0),
    )
    colr = box(
        b"colr",
        bytes([1, 0, 0]) + struct.pack(">I", 16 if ncomp == 3 else 17),
    )
    jp2h = box(b"jp2h", ihdr + colr)
    jp2c = box(b"jp2c", codestream)
    return sig + ftyp + jp2h + jp2c


def decode_jpx(data: bytes) -> dict[str, Any]:
    """Decode a ``/JPXDecode`` payload — a raw JPEG 2000 codestream
    or a JP2 container — to samples. → {width, height, n_channels,
    bit_depth, samples (h, w, c) int64}."""
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
        data = _jp2_codestream(data)
    if struct.unpack_from(">H", data, 0)[0] != _SOC:
        raise ValueError("not a JPEG 2000 codestream (missing SOC)")
    pos = 2
    siz = cod = None
    qcd_eps: list[int] | None = None
    qcd_mus: list[int] | None = None
    guard = 0
    body = None
    while pos < len(data):
        (marker,) = struct.unpack_from(">H", data, pos)
        pos += 2
        if marker == _EOC:
            break
        if marker == _SOD:
            raise ValueError("SOD before SOT")
        (ln,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + ln]
        if marker == _SIZ:
            (
                rsiz, xs, ys, xo, yo, xts, yts, xto, yto, ncomp,
            ) = struct.unpack_from(">HIIIIIIIIH", seg, 0)
            if xo or yo or xto or yto:
                raise NotImplementedError("image/tile grid offsets")
            if xts < xs or yts < ys:
                raise NotImplementedError("multiple JPEG 2000 tiles")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG 2000 image"
                )
            depths = []
            subs = []
            for c in range(ncomp):
                ssiz, xr, yr = struct.unpack_from(
                    ">BBB", seg, 38 - 2 + c * 3
                )
                if ssiz & 0x80:
                    raise NotImplementedError(
                        "signed JPEG 2000 components"
                    )
                if not 1 <= xr <= 4 or not 1 <= yr <= 4:
                    raise NotImplementedError(
                        f"XRsiz/YRsiz {xr}/{yr} outside 1..4"
                    )
                subs.append((xr, yr))
                depths.append((ssiz & 0x7F) + 1)
            if len(set(depths)) != 1:
                raise NotImplementedError("mixed component depths")
            siz = {"w": xs, "h": ys, "ncomp": ncomp,
                   "depth": depths[0], "subs": subs}
        elif marker == _COD:
            scod = seg[0]
            if scod & 1:
                raise NotImplementedError(
                    "user-defined precinct sizes"
                )
            if scod & 6:
                raise NotImplementedError("SOP/EPH markers")
            prog = seg[1]
            if prog != 0:
                raise NotImplementedError(
                    f"progression order {prog} (only LRCP)"
                )
            (layers,) = struct.unpack_from(">H", seg, 2)
            if layers != 1:
                raise NotImplementedError("multiple quality layers")
            mct = seg[4]
            levels = seg[5]
            cbw = seg[6] + 2
            cbh = seg[7] + 2
            if seg[8] != 0:
                raise NotImplementedError(
                    "code-block style modes (bypass/reset/causal/...)"
                )
            transform = seg[9]
            if transform not in (0, 1):
                raise ValueError(
                    f"unknown wavelet transform byte {transform}"
                )
            cod = {"levels": levels, "cbw": cbw, "cbh": cbh,
                   "mct": mct, "transform": transform}
        elif marker == _QCD:
            sqcd = seg[0]
            style = sqcd & 0x1F
            guard = sqcd >> 5
            if style == 0:
                qcd_eps = [b >> 3 for b in seg[1:]]
                qcd_mus = None
            elif style == 2:
                # scalar expounded (E.1): 16-bit (ε, μ) per subband
                pairs = [
                    struct.unpack_from(">H", seg, 1 + 2 * i)[0]
                    for i in range((len(seg) - 1) // 2
                                   )
                ]
                qcd_eps = [p >> 11 for p in pairs]
                qcd_mus = [p & 0x7FF for p in pairs]
            elif style == 1:
                raise NotImplementedError(
                    "scalar derived quantization (single-pair QCD); "
                    "only no-quantization and scalar expounded"
                )
            else:
                raise ValueError(f"invalid Sqcd style {style}")
        elif marker in (_COC, _QCC):
            raise NotImplementedError(
                "per-component COC/QCC overrides"
            )
        elif marker == _RGN:
            raise NotImplementedError("RGN region-of-interest shift")
        elif marker == _SOT:
            isot, psot, tpsot, tnsot = struct.unpack_from(
                ">HIBB", seg, 0
            )
            if isot != 0 or tpsot != 0:
                raise NotImplementedError(
                    "multiple tiles / tile-parts"
                )
            (m2,) = struct.unpack_from(">H", data, pos + ln)
            if m2 != _SOD:
                raise NotImplementedError(
                    "tile-part markers between SOT and SOD"
                )
            end = pos - 2 + psot if psot else len(data) - 2
            body = data[pos + ln + 2 : end]
            pos = end
            continue
        elif marker == _COM:
            pass
        else:
            raise NotImplementedError(
                f"JPEG 2000 marker 0x{marker:04X}"
            )
        pos += ln
    if siz is None or cod is None or qcd_eps is None or body is None:
        raise ValueError("incomplete JPEG 2000 codestream")
    irreversible = cod["transform"] == 0
    if irreversible != (qcd_mus is not None):
        raise ValueError(
            "COD transform / QCD quantization style mismatch "
            "(9/7 requires scalar expounded, 5/3 no-quantization)"
        )
    w, h, ncomp = siz["w"], siz["h"], siz["ncomp"]
    levels = cod["levels"]
    subs = siz["subs"]
    if any(s != (1, 1) for s in subs) and not irreversible:
        raise NotImplementedError(
            "component subsampling on the 5/3 reversible path "
            "(RCT requires co-sited components)"
        )
    # per-component band extents: component c spans
    # ceil(w/XRsiz) x ceil(h/YRsiz) samples (SIZ, §A.5.1)
    dims_pc = [
        _band_dims((w + xr - 1) // xr, (h + yr - 1) // yr, levels)
        for xr, yr in subs
    ]
    if cod["cbw"] > 10 or cod["cbh"] > 10:
        raise ValueError("code-block exponent over 2^10")
    if (1 << cod["cbw"]) != _CB or (1 << cod["cbh"]) != _CB:
        raise NotImplementedError(
            f"code-block size {1 << cod['cbw']}x{1 << cod['cbh']} "
            f"(grid logic is pinned to {_CB}x{_CB})"
        )
    rd = _PkBitReader(body)
    comps_bands: list[list[dict[str, np.ndarray]]] = [
        [dict() for _ in range(levels + 1)] for _ in range(ncomp)
    ]
    bpos = 0
    for r in range(levels + 1):
        for c in range(ncomp):
            dims = dims_pc[c]
            rd = _PkBitReader(body, bpos)
            if not rd.bit():
                # empty packet: every band in it decodes to zeros
                bpos = rd.align()
                for name, (bw, bh) in dims[r].items():
                    comps_bands[c][r][name] = np.zeros(
                        (bh, bw), np.int64
                    )
                continue
            pending: list[tuple[str, int, int, int, int, int]] = []
            for name in ("LL", "HL", "LH", "HH"):
                if name not in dims[r]:
                    continue
                bw, bh = dims[r][name]
                comps_bands[c][r][name] = np.zeros(
                    (bh, bw), np.int64
                )
                if bw == 0 or bh == 0:
                    continue
                gw = (bw + _CB - 1) // _CB
                gh = (bh + _CB - 1) // _CB
                inc = TagTree(gw, gh)
                zbp = TagTree(gw, gh)
                mb = guard + qcd_eps[_qcd_index(r, name)] - 1
                for by in range(gh):
                    for bx in range(gw):
                        if not inc.decode(rd, bx, by, 1):
                            continue
                        t = 1
                        while not zbp.decode(rd, bx, by, t):
                            t += 1
                        p0 = zbp.leaf_value(bx, by)
                        npass = _code_numpasses_r(rd)
                        lblock = 3
                        while rd.bit():
                            lblock += 1
                        nbits = lblock + _ilog2(npass)
                        plen = rd.bits(nbits)
                        planes = mb - p0
                        if planes <= 0 or npass > 3 * planes - 2:
                            raise ValueError(
                                "inconsistent pass count for bitplanes"
                            )
                        if npass < 3 * planes - 2:
                            raise NotImplementedError(
                                "JPX: truncated coding passes "
                                "(quality-layer truncation) not "
                                "supported; only complete "
                                "3*planes-2 pass sets decode"
                            )
                        pending.append(
                            (name, bx, by, planes, plen, 0)
                        )
            hdr_end = rd.align()
            off = hdr_end
            for name, bx, by, planes, plen, _pad in pending:
                payload = body[off : off + plen]
                off += plen
                dec = MQDecoder(payload)
                stats = _fresh_stats()
                band = comps_bands[c][r][name]
                blk = band[
                    by * _CB : (by + 1) * _CB,
                    bx * _CB : (bx + 1) * _CB,
                ]
                out_blk = _t1_code_block(
                    dec, stats, _BAND_CODE[name],
                    blk.shape[1], blk.shape[0], planes, None,
                )
                blk[...] = out_blk
            bpos = off
    depth = siz["depth"]
    if irreversible:
        comps = [
            _reconstruct_97(cb, depth, qcd_mus, qcd_eps)
            for cb in comps_bands
        ]
        # subsampled components upsample by sample replication
        # (nearest) to the reference grid before the ICT
        comps = [
            np.repeat(np.repeat(a, yr, axis=0), xr, axis=1)[:h, :w]
            if (xr, yr) != (1, 1)
            else a
            for a, (xr, yr) in zip(comps, subs)
        ]
        shift_f = float(1 << (depth - 1))
        if ncomp == 3 and cod["mct"]:
            rf, gf, bf = _ict_inv(*comps)
            comps = [rf, gf, bf]
        comps = [
            np.floor(c + shift_f + 0.5).astype(np.int64)
            for c in comps
        ]
    else:
        comps = [_idwt53(cb) for cb in comps_bands]
        shift = 1 << (depth - 1)
        if ncomp == 3:
            if cod["mct"]:
                y, u, v = comps
                y = y + shift
                g = y - ((u + v) >> 2)
                rch = v + g
                bch = u + g
                comps = [rch, g, bch]
            else:
                comps = [c + shift for c in comps]
        else:
            comps = [comps[0] + shift]
    maxv = (1 << depth) - 1
    stack = np.stack(
        [np.clip(c, 0, maxv) for c in comps], axis=-1
    )
    return {
        "width": w,
        "height": h,
        "n_channels": ncomp,
        "bit_depth": depth,
        "transform": "9/7" if irreversible else "5/3",
        "samples": stack,
    }


def _reconstruct_97(
    comp_bands: list[dict[str, np.ndarray]],
    depth: int,
    qcd_mus: list[int],
    qcd_eps: list[int],
) -> np.ndarray:
    """Dequantize one component's integer quantizer indices (E.1.1.2,
    midpoint reconstruction r = 0.5) and run the inverse 9/7 — the
    un-shifted float samples."""
    fbands: list[dict[str, np.ndarray]] = []
    for ri, res in enumerate(comp_bands):
        out_res: dict[str, np.ndarray] = {}
        for name, q in res.items():
            qi = _qcd_index(ri, name)
            delta = _q97_delta(depth, name, qcd_eps[qi], qcd_mus[qi])
            mag = np.abs(q).astype(np.float64)
            val = np.where(q != 0, (mag + 0.5) * delta, 0.0)
            out_res[name] = np.where(q < 0, -val, val)
        fbands.append(out_res)
    return _idwt97(fbands)


def jpx97_reference_decode(
    samples: np.ndarray,
    bit_depth: int = 8,
    levels: int = 2,
    q_planes: int = 9,
    subsample: tuple[int, int] | None = None,
) -> np.ndarray:
    """Straight-line replay of the lossy 9/7 pipeline — forward DWT,
    quantize, dequantize, inverse DWT, inverse ICT, round, clip —
    with NO codestream in between. The driver query compares the full
    marker/Tier-2/Tier-1/MQ decode of ``encode_jpx(irreversible=
    True)`` against this elementwise; what that comparison genuinely
    verifies is the entropy + packet + marker layer round-tripping
    the quantizer indices and (ε, μ) exactly (the float wavelet is
    pinned independently against the published T.800 Table F.4 filter
    taps in test_jpeg2000)."""
    h0, w0 = samples.shape[:2]
    comps_f, mct = _prep_97_components(
        samples, bit_depth, subsample
    )
    all_bands, eps, mus, _guard = _quantize_97(
        comps_f, levels, bit_depth, q_planes
    )
    comps = [
        _reconstruct_97(cb, bit_depth, mus, eps) for cb in all_bands
    ]
    if subsample is not None:
        xr, yr = subsample
        comps = [comps[0]] + [
            np.repeat(np.repeat(a, yr, axis=0), xr, axis=1)[:h0, :w0]
            for a in comps[1:]
        ]
    if mct:
        comps = list(_ict_inv(*comps))
    shift_f = float(1 << (bit_depth - 1))
    comps = [
        np.floor(c + shift_f + 0.5).astype(np.int64) for c in comps
    ]
    maxv = (1 << bit_depth) - 1
    return np.stack([np.clip(c, 0, maxv) for c in comps], axis=-1)


def _jp2_codestream(data: bytes) -> bytes:
    """Walk Part 1 Annex I boxes to the ``jp2c`` codestream."""
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        (lbox,) = struct.unpack_from(">I", data, pos)
        tbox = data[pos + 4 : pos + 8]
        hdr = 8
        if lbox == 1:
            (lbox,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif lbox == 0:
            lbox = n - pos
        if lbox < hdr or pos + lbox > n:
            raise ValueError("malformed JP2 box")
        if tbox == b"jp2c":
            return data[pos + hdr : pos + lbox]
        pos += lbox
    raise ValueError("JP2 container has no jp2c codestream box")
