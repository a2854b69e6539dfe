"""FLAC decode to PCM: subframe types, stereo decorrelation, Rice
partitions/escapes, wasted bits, CRC/MD5 integrity, honest gates.
Every decode is a true round trip through a real stream, and FLAC is
lossless, so equality with the original PCM is exact."""

from __future__ import annotations

import numpy as np
import pytest

from ccgp_data_wrangling_spark.operators.flac import (
    decode_flac,
    encode_flac,
)


def _check(samples, **kw):
    m = decode_flac(encode_flac(samples, **kw))
    arr = np.asarray(samples, np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    assert (m["samples"] == arr).all(), kw
    return m


class TestRoundTrip:
    def test_verbatim_and_md5(self):
        rng = np.random.default_rng(5)
        x = rng.integers(-30000, 30000, 700)
        m = _check(x, subframe_kinds=["verbatim"])
        assert m["md5_ok"] is True
        assert m["bits_per_sample"] == 16
        assert m["n_samples"] == 700

    def test_constant(self):
        _check(np.full(512, -1234), subframe_kinds=["constant"])

    def test_fixed_orders(self):
        rng = np.random.default_rng(7)
        x = rng.integers(-20000, 20000, 1024)
        _check(x, subframe_kinds=["fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4"],
               partition_order=2)

    def test_lpc_orders_rice2(self):
        rng = np.random.default_rng(9)
        x = rng.integers(-20000, 20000, 1024)
        _check(x, subframe_kinds=["lpc1", "lpc4", "lpc8", "lpc12"],
               partition_order=3, rice2=True)

    def test_lpc_compresses_smooth_signal(self):
        t = np.arange(2000)
        sm = (1000 * np.sin(t / 30)).astype(np.int64)
        blob = encode_flac(sm, subframe_kinds=["lpc8"],
                           partition_order=2)
        assert (decode_flac(blob)["samples"][:, 0] == sm).all()
        assert len(blob) < 2000 * 2  # beats raw 16-bit PCM

    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_stereo_decorrelation(self, mode):
        t = np.arange(1024)
        left = (1000 * np.sin(t / 30)).astype(np.int64)
        st = np.stack([left, left // 2 + 7], axis=-1)
        _check(st, channel_mode=mode,
               subframe_kinds=["fixed2", "lpc4"], partition_order=1)

    def test_mid_side_odd_sums(self):
        # parity of L+R is carried by the side channel's low bit
        st = np.array([[3, 0], [5, 2], [-7, 4], [1, 1]])
        _check(np.tile(st, (48, 1)), channel_mode="mid_side",
               subframe_kinds=["verbatim"], block_size=192)

    def test_wasted_bits(self):
        rng = np.random.default_rng(11)
        x = rng.integers(-100, 100, 768) << 3
        _check(x, subframe_kinds=["verbatim", "fixed1"], wasted=3)

    def test_escape_partition(self):
        rng = np.random.default_rng(13)
        x = rng.integers(-30000, 30000, 600)
        _check(x, subframe_kinds=["fixed2"], escape_first=True,
               partition_order=1)

    def test_24_bps_and_explicit_rate_codes(self):
        rng = np.random.default_rng(17)
        x = rng.integers(-(2**22), 2**22, 300)
        for sr_code, rate in ((12, 48000), (13, 44100), (14, 44100)):
            m = _check(x, bits_per_sample=24, subframe_kinds=["lpc2"],
                       sr_code=sr_code, sample_rate=rate,
                       block_size=192)
            assert m["sample_rate"] == rate

    def test_multichannel_partial_final_block(self):
        rng = np.random.default_rng(19)
        _check(rng.integers(-100, 100, (500, 4)), bits_per_sample=8,
               subframe_kinds=["fixed3", "verbatim"], block_size=256)


class TestIntegrity:
    def test_not_flac(self):
        with pytest.raises(ValueError, match="fLaC"):
            decode_flac(b"RIFF....WAVE")

    def test_crc16_detects_corruption(self):
        rng = np.random.default_rng(23)
        blob = bytearray(encode_flac(
            rng.integers(-1000, 1000, 256),
            subframe_kinds=["verbatim"],
        ))
        blob[-40] ^= 0x10  # flip a residual bit in the last frame
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(blob))

    def test_md5_detects_wrong_signature(self):
        rng = np.random.default_rng(29)
        blob = bytearray(encode_flac(
            rng.integers(-1000, 1000, 256),
            subframe_kinds=["verbatim"],
        ))
        # STREAMINFO md5 lives at bytes 8+18 .. 8+34
        blob[8 + 18] ^= 0xFF
        with pytest.raises(ValueError, match="MD5"):
            decode_flac(bytes(blob))

    def test_enumerated_rate_codes_gate(self):
        # codes 1-11 are a constants table -> honest gate; patch the
        # frame header's 4-bit rate code (byte 2 of the frame: bits
        # bs|sr). The frame starts right after the metadata block.
        rng = np.random.default_rng(31)
        blob = bytearray(encode_flac(
            rng.integers(-1000, 1000, 192),
            subframe_kinds=["verbatim"], block_size=192,
        ))
        fr = 8 + 34  # fLaC + block header + STREAMINFO
        assert blob[fr] == 0xFF and blob[fr + 1] & 0xFC == 0xF8
        blob[fr + 2] = (blob[fr + 2] & 0xF0) | 0x01  # sr code 1
        with pytest.raises(NotImplementedError, match="1-11"):
            decode_flac(bytes(blob))
