"""REAL media decode kernels for formats the standard library can
parse — no PIL/librosa/decord required.

The multimodal layer (multimodal.py) keeps deterministic fakes for
container formats whose codecs aren't in this environment (JPEG, MP3,
MP4 …). But two families need nothing beyond the stdlib + numpy, so
their kernels are real:

* **WAV / PCM audio** (``wave`` + numpy): sample rate, channels,
  duration, and real signal features (RMS, peak) from the decoded
  samples.
* **PPM/PGM images** (netpbm P5/P6; ``struct``-free header parse +
  ``np.frombuffer``): true width/height, per-channel means, and a
  real nearest-neighbor resize that re-emits valid netpbm bytes.

These run inside the same Arrow ``mapInPandas`` plumbing as the
fakes — swap the kernel, not the pipeline. Features are plain floats
rounded at the edge so results are engine-reproducible.
"""

from __future__ import annotations

import io
import wave
from typing import Any

import numpy as np

__all__ = [
    "decode_wav",
    "decode_netpbm",
    "resize_netpbm",
    "decode_gif",
    "encode_gif",
    "real_decode",
]


def decode_wav(payload: bytes) -> dict[str, Any]:
    """Decode a PCM WAV payload to real audio features."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_channels = wf.getnchannels()
        rate = wf.getframerate()
        sampwidth = wf.getsampwidth()
        n_frames = wf.getnframes()
        raw = wf.readframes(n_frames)
    if sampwidth == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{8 * sampwidth}-bit PCM not supported")
    duration = n_frames / rate if rate else 0.0
    return {
        "kind": "audio",
        "sample_rate": rate,
        "n_channels": n_channels,
        "n_samples": n_frames,
        "duration_sec": round(duration, 6),
        "rms": round(float(np.sqrt(np.mean(x**2))) if x.size else 0.0, 6),
        "peak": round(float(np.max(np.abs(x))) if x.size else 0.0, 6),
    }


def _parse_netpbm(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """(magic, width, height, maxval, pixels[h, w, c]) for P5/P6."""
    # header tokens: magic, width, height, maxval — whitespace/comment
    # separated; pixel data starts after the single whitespace byte
    # following maxval
    pos, tokens = 0, []
    while len(tokens) < 4:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    magic = tokens[0].decode("ascii")
    if magic not in ("P5", "P6"):
        raise NotImplementedError(f"netpbm magic {magic!r} not supported")
    width, height, maxval = (int(t) for t in tokens[1:4])
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if magic == "P6" else 1
    need = width * height * ch
    data = payload[pos : pos + need]
    if len(data) != need:
        raise ValueError("truncated netpbm pixel data")
    px = np.frombuffer(data, dtype=np.uint8).reshape(height, width, ch)
    return magic, width, height, maxval, px


def decode_netpbm(payload: bytes) -> dict[str, Any]:
    """Decode a P5 (grayscale) / P6 (RGB) image to real features."""
    magic, width, height, _maxval, px = _parse_netpbm(payload)
    means = px.astype(np.float64).mean(axis=(0, 1))
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "n_channels": px.shape[2],
        "channel_means": [round(float(m), 4) for m in means],
        "luma_mean": round(
            float(
                means @ np.array([0.299, 0.587, 0.114])
                if magic == "P6"
                else means[0]
            ),
            4,
        ),
    }


def resize_netpbm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a P5/P6 image; returns valid
    netpbm bytes of the same magic."""
    magic, w0, h0, maxval, px = _parse_netpbm(payload)
    rows = (np.arange(height) * h0) // height
    cols = (np.arange(width) * w0) // width
    out = px[rows][:, cols]
    header = f"{magic}\n{width} {height}\n{maxval}\n".encode("ascii")
    return header + out.tobytes()


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR resets
    the dictionary, widths grow at dictionary size 2^w (cap 12)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = n_bits = 0
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                dictionary = dictionary[: clear + 2]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(dictionary) and code not in (clear, eoi):
                entry = dictionary[code]
            elif code == len(dictionary) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out.extend(entry)
            if prev is not None and len(dictionary) < 4096:
                dictionary.append(prev + entry[:1])
                if len(dictionary) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> dict[str, Any]:
    """REAL GIF87a/89a decode of the first image frame: header +
    color tables + sub-block reassembly + LZW (variable-width,
    CLEAR/EOI, KwKwK, 12-bit cap) + optional deinterlace. Returns the
    same feature shape as decode_netpbm, plus the frame count.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    n_frames = 0
    first_px = None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        n_frames += 1
        if first_px is None:
            if table is None:
                raise ValueError("GIF frame without a color table")
            idx = np.array(_lzw_decode(b"".join(chunks), min_code), np.int64)
            if idx.size != iw * ih:
                raise ValueError(
                    f"LZW yielded {idx.size} pixels for {iw}x{ih}"
                )
            grid = idx.reshape(ih, iw)
            if ipacked & 0x40:  # deinterlace
                de = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for r in rows:
                        de[r] = grid[src]
                        src += 1
                grid = de
            first_px = table[grid]  # (h, w, 3) uint8

    if first_px is None:
        raise ValueError("GIF contains no image frame")
    means = first_px.astype(np.float64).mean(axis=(0, 1))
    return {
        "kind": "image",
        "width": int(first_px.shape[1]),
        "height": int(first_px.shape[0]),
        "n_channels": 3,
        "channel_means": [round(float(m), 4) for m in means],
        "luma_mean": round(
            float(means @ np.array([0.299, 0.587, 0.114])), 4
        ),
        "n_frames": n_frames,
    }


def encode_gif(px: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as a single-frame GIF89a
    (fixture writer for round-trip tests; ≤256 distinct colors).

    The LZW stream uses the literal-codes-plus-periodic-CLEAR form:
    emitting only root codes and resetting before the decoder's
    dictionary would force a width increase keeps the encoder tiny
    while remaining a fully conformant stream for any decoder.
    """
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("fixture encoder supports <= 256 colors")
    table = np.zeros((256, 3), np.uint8)
    table[: len(colors)] = colors
    grid = idx.reshape(h, w)
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        grid = grid[order]
    seq = grid.reshape(-1)

    min_code = 8
    clear, eoi = 256, 257
    width_bits = 9
    codes: list[int] = [clear]
    budget = (1 << width_bits) - (clear + 2) - 2  # literals before widen
    since_clear = 0
    for v in seq:
        if since_clear >= budget:
            codes.append(clear)
            since_clear = 0
        codes.append(int(v))
        since_clear += 1
    codes.append(eoi)

    acc = n_bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << n_bits
        n_bits += width_bits
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        out.append(acc & 0xFF)

    buf = bytearray()
    buf += b"GIF89a"
    buf += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    buf += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    buf += table.tobytes()
    buf += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    buf += bytes([0x40 if interlace else 0x00])
    buf += bytes([min_code])
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        buf += bytes([len(chunk)]) + chunk
    buf += b"\x00\x3b"
    return bytes(buf)


_DISPATCH = {
    "audio/wav": decode_wav,
    "image/ppm": decode_netpbm,
    "image/pgm": decode_netpbm,
    "image/gif": decode_gif,
}


def real_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Dispatch to a real stdlib kernel; raise for codecs this
    environment genuinely cannot decode (JPEG/PNG/MP3/MP4 …)."""
    fn = _DISPATCH.get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no stdlib decoder for {media_type!r}; available: "
            f"{sorted(_DISPATCH)} (PIL/librosa/decord absent here)"
        )
    return fn(payload)
