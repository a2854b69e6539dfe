"""EXIF metadata for JPEG corpora — the screening layer an image
pipeline runs BEFORE pixels: camera make/model (provenance filters),
capture time (dedup/partitioning), and above all ORIENTATION — a
pHash computed on un-rotated pixels misses every rotated re-post, so
orientation handling belongs upstream of the fingerprint stage.

Implemented from the public specs (EXIF 2.32 / TIFF 6.0 / JEITA
CP-3451) with stdlib + numpy only:

* :func:`parse_exif` — locate the APP1 "Exif\\0\\0" segment in the
  JPEG marker stream, walk the TIFF structure (both byte orders,
  "II" and "MM"), read IFD0 (Make 0x010F, Model 0x0110, Orientation
  0x0112) and follow the Exif-IFD pointer (0x8769) for
  DateTimeOriginal 0x9003 and pixel dimensions 0xA002/0xA003.
  Inline (≤4-byte) and offset-stored values both handled; offsets
  escaping the segment raise.
* :func:`build_exif_app1` / :func:`with_exif` — fixture writers: a
  conformant APP1 payload and its insertion after SOI. The existing
  JPEG decoder skips APPn segments, so EXIF-carrying fixtures decode
  unchanged — pinned by tests.
* :func:`apply_exif_orientation` — the 8 orientation transforms
  (identity / mirrors / 90-180-270 rotations) on an ``(h, w[, c])``
  array, mapping every image back to display orientation.

Reference parity: cademirch/ccgp-data-wrangling has no media layer;
this extends the engine's multimodal screening family
(operators/media_codecs.py section comments).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = [
    "parse_exif",
    "build_exif_app1",
    "with_exif",
    "apply_exif_orientation",
]

_ASCII, _SHORT, _LONG = 2, 3, 4
_TYPE_SIZE = {1: 1, _ASCII: 1, _SHORT: 2, _LONG: 4, 5: 8, 7: 1, 10: 8}

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_EXIF_IFD = 0x8769
_TAG_DATETIME_ORIG = 0x9003
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003


def _read_ifd(
    tiff: bytes, off: int, bo: str
) -> dict[int, tuple[int, int, bytes]]:
    """Return {tag: (type, count, value_bytes)} for one IFD."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF IFD offset escapes the segment")
    n = int.from_bytes(tiff[off : off + 2], bo)
    out: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(tiff):
            raise ValueError("EXIF IFD entry escapes the segment")
        tag = int.from_bytes(tiff[e : e + 2], bo)
        typ = int.from_bytes(tiff[e + 2 : e + 4], bo)
        cnt = int.from_bytes(tiff[e + 4 : e + 8], bo)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            val = tiff[e + 8 : e + 8 + size]
        else:
            voff = int.from_bytes(tiff[e + 8 : e + 12], bo)
            if voff + size > len(tiff):
                raise ValueError("EXIF value offset escapes the segment")
            val = tiff[voff : voff + size]
        out[tag] = (typ, cnt, val)
    return out


def _ascii(v: tuple[int, int, bytes]) -> str:
    return v[2].split(b"\x00", 1)[0].decode("ascii", "replace")


def _num(v: tuple[int, int, bytes], bo: str) -> int:
    typ, _, raw = v
    return int.from_bytes(raw[: _TYPE_SIZE.get(typ, 2)], bo)


def parse_exif(payload: bytes) -> dict[str, Any]:
    """Parse the EXIF APP1 segment out of a JPEG byte blob.

    Returns make / model / orientation / datetime_original /
    pixel_x / pixel_y (missing tags → None, orientation defaults to
    1 = upright, per spec). Raises on a non-JPEG payload or a
    structurally broken TIFF block; a JPEG with NO Exif APP1 returns
    all-defaults with ``has_exif=False`` — absence is data, not an
    error, in a crawled corpus."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tiff = seg[6:]
            break
        if marker == 0xDA:
            break  # entropy data — no APP segments past SOS
        pos += 2 + seglen
    out: dict[str, Any] = {
        "has_exif": False,
        "make": None,
        "model": None,
        "orientation": 1,
        "datetime_original": None,
        "pixel_x": None,
        "pixel_y": None,
    }
    if tiff is None:
        return out
    order = tiff[:2]
    if order == b"II":
        bo = "little"
    elif order == b"MM":
        bo = "big"
    else:
        raise ValueError("EXIF TIFF header has unknown byte order")
    if int.from_bytes(tiff[2:4], bo) != 42:
        raise ValueError("EXIF TIFF magic != 42")
    ifd0 = _read_ifd(tiff, int.from_bytes(tiff[4:8], bo), bo)
    out["has_exif"] = True
    if _TAG_MAKE in ifd0:
        out["make"] = _ascii(ifd0[_TAG_MAKE])
    if _TAG_MODEL in ifd0:
        out["model"] = _ascii(ifd0[_TAG_MODEL])
    if _TAG_ORIENTATION in ifd0:
        o = _num(ifd0[_TAG_ORIENTATION], bo)
        if not 1 <= o <= 8:
            raise ValueError(f"EXIF orientation {o} out of range 1-8")
        out["orientation"] = o
    if _TAG_EXIF_IFD in ifd0:
        exif = _read_ifd(tiff, _num(ifd0[_TAG_EXIF_IFD], bo), bo)
        if _TAG_DATETIME_ORIG in exif:
            out["datetime_original"] = _ascii(exif[_TAG_DATETIME_ORIG])
        if _TAG_PIXEL_X in exif:
            out["pixel_x"] = _num(exif[_TAG_PIXEL_X], bo)
        if _TAG_PIXEL_Y in exif:
            out["pixel_y"] = _num(exif[_TAG_PIXEL_Y], bo)
    return out


def build_exif_app1(
    *,
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime_original: str = "",
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """Fixture writer: a conformant APP1 body ("Exif\\0\\0" + TIFF),
    IFD0 with Make/Model/Orientation and an Exif-IFD with
    DateTimeOriginal and pixel dimensions, in either byte order.
    Long ASCII values are stored out-of-line exactly as real writers
    do, so the parser's offset path is exercised by every fixture."""
    bo = "little" if byte_order == "II" else "big"

    ifd0_tags: list[tuple[int, int, bytes]] = []
    exif_tags: list[tuple[int, int, bytes]] = []
    if make:
        ifd0_tags.append((_TAG_MAKE, _ASCII, make.encode() + b"\x00"))
    if model:
        ifd0_tags.append((_TAG_MODEL, _ASCII, model.encode() + b"\x00"))
    ifd0_tags.append(
        (_TAG_ORIENTATION, _SHORT, orientation.to_bytes(2, bo))
    )
    if datetime_original:
        exif_tags.append(
            (_TAG_DATETIME_ORIG, _ASCII,
             datetime_original.encode() + b"\x00")
        )
    if pixel_x is not None:
        exif_tags.append((_TAG_PIXEL_X, _LONG, pixel_x.to_bytes(4, bo)))
    if pixel_y is not None:
        exif_tags.append((_TAG_PIXEL_Y, _LONG, pixel_y.to_bytes(4, bo)))

    # layout: header(8) | IFD0 | ExifIFD | value heap
    n0 = len(ifd0_tags) + (1 if exif_tags else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = (2 + 12 * len(exif_tags) + 4) if exif_tags else 0
    heap_off = exif_off + exif_size
    heap = bytearray()

    def entry(tag: int, typ: int, raw: bytes) -> bytes:
        nonlocal heap
        cnt = len(raw) if typ == _ASCII else (
            1 if typ in (_SHORT, _LONG) else len(raw)
        )
        e = tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + cnt.to_bytes(4, bo)
        if len(raw) <= 4:
            return e + raw.ljust(4, b"\x00")
        off = heap_off + len(heap)
        heap += raw
        return e + off.to_bytes(4, bo)

    def ifd(tags: list[tuple[int, int, bytes]], extra: bytes) -> bytes:
        n = len(tags) + (1 if extra else 0)
        body = n.to_bytes(2, bo)
        for tag, typ, raw in sorted(tags):
            body += entry(tag, typ, raw)
        body += extra
        body += (0).to_bytes(4, bo)  # next-IFD pointer: none
        return body

    exif_ptr = b""
    if exif_tags:
        exif_ptr = (
            _TAG_EXIF_IFD.to_bytes(2, bo)
            + _LONG.to_bytes(2, bo)
            + (1).to_bytes(4, bo)
            + exif_off.to_bytes(4, bo)
        )
    ifd0 = ifd(ifd0_tags, exif_ptr)
    exif_ifd = ifd(exif_tags, b"") if exif_tags else b""
    assert len(ifd0) == ifd0_size and len(exif_ifd) == exif_size
    header = byte_order.encode() + (42).to_bytes(2, bo) + ifd0_off.to_bytes(4, bo)
    return b"Exif\x00\x00" + header + ifd0 + exif_ifd + bytes(heap)


def with_exif(jpeg: bytes, app1_body: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (where real encoders
    put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    seg = b"\xff\xe1" + (2 + len(app1_body)).to_bytes(2, "big") + app1_body
    return jpeg[:2] + seg + jpeg[2:]


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Map pixels to display orientation (EXIF 2.32 table 6):
    1 upright; 2 mirror-H; 3 rotate 180; 4 mirror-V; 5 mirror-H +
    rotate 270 CW; 6 rotate 90 CW; 7 mirror-H + rotate 90 CW;
    8 rotate 270 CW. Orientations 5-8 swap width and height."""
    if orientation == 1:
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:
        return np.rot90(px[:, ::-1], k=1, axes=(0, 1))
    if orientation == 6:
        return np.rot90(px, k=-1, axes=(0, 1))
    if orientation == 7:
        return np.rot90(px[:, ::-1], k=-1, axes=(0, 1))
    if orientation == 8:
        return np.rot90(px, k=1, axes=(0, 1))
    raise ValueError(f"EXIF orientation {orientation} out of range 1-8")
