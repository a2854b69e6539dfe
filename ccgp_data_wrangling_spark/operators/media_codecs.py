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


_DISPATCH = {
    "audio/wav": decode_wav,
    "image/ppm": decode_netpbm,
    "image/pgm": decode_netpbm,
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
