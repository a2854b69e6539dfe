"""EXIF layer: TIFF IFD walk (both byte orders), fixture round trip,
orientation transforms, and coexistence with the real JPEG decoder."""

from __future__ import annotations

import numpy as np
import pytest

from ccgp_data_wrangling_spark.operators.exif import (
    apply_exif_orientation,
    build_exif_app1,
    parse_exif,
    with_exif,
)
from ccgp_data_wrangling_spark.operators.media_codecs import (
    decode_jpeg,
    encode_jpeg,
)


def _jpeg(h=8, w=16):
    px = (np.indices((h, w)).sum(0) % 2 * 200 + 20).astype(np.uint8)
    return encode_jpeg(px)


@pytest.mark.parametrize("order", ["II", "MM"])
def test_exif_roundtrip_both_byte_orders(order):
    app1 = build_exif_app1(
        make="Acme Optics Corporation",  # > 4 bytes → heap-stored
        model="X100",
        orientation=6,
        datetime_original="2024:05:17 09:30:00",
        pixel_x=1600,
        pixel_y=1200,
        byte_order=order,
    )
    blob = with_exif(_jpeg(), app1)
    m = parse_exif(blob)
    assert m["has_exif"] is True
    assert m["make"] == "Acme Optics Corporation"
    assert m["model"] == "X100"
    assert m["orientation"] == 6
    assert m["datetime_original"] == "2024:05:17 09:30:00"
    assert m["pixel_x"] == 1600 and m["pixel_y"] == 1200
    # the pixel decoder must be oblivious to the APP1 segment
    assert decode_jpeg(blob)["width"] == decode_jpeg(_jpeg())["width"]


def test_exif_absent_is_data_not_error():
    m = parse_exif(_jpeg())
    assert m["has_exif"] is False and m["orientation"] == 1
    assert m["make"] is None and m["pixel_x"] is None


def test_exif_malformed_raises():
    app1 = build_exif_app1(make="A", orientation=3)
    blob = with_exif(_jpeg(), app1)
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_exif(b"nope")
    with pytest.raises(ValueError, match="byte order"):
        parse_exif(blob.replace(b"Exif\x00\x00II", b"Exif\x00\x00QQ"))
    with pytest.raises(ValueError, match="orientation 9"):
        bad = build_exif_app1(orientation=9)
        # builder doesn't validate (it must write broken fixtures);
        # the PARSER does
        parse_exif(with_exif(_jpeg(), bad))
    # value offset escaping the segment
    trunc = build_exif_app1(make="Very Long Maker Name Indeed")
    cut = trunc[:-10]
    with pytest.raises(ValueError, match="escapes the segment"):
        parse_exif(with_exif(_jpeg(), cut))


def test_orientation_transforms_are_the_spec_table():
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    #  [[0 1 2]
    #   [3 4 5]]
    assert (apply_exif_orientation(px, 1) == px).all()
    assert apply_exif_orientation(px, 2).tolist() == [[2, 1, 0], [5, 4, 3]]
    assert apply_exif_orientation(px, 3).tolist() == [[5, 4, 3], [2, 1, 0]]
    assert apply_exif_orientation(px, 4).tolist() == [[3, 4, 5], [0, 1, 2]]
    # 6 = rotate 90 CW: first display row is the last source column
    assert apply_exif_orientation(px, 6).tolist() == [[3, 0], [4, 1], [5, 2]]
    assert apply_exif_orientation(px, 8).tolist() == [[2, 5], [1, 4], [0, 3]]
    # 5/7 are the mirrored diagonals
    assert apply_exif_orientation(px, 5).tolist() == [[0, 3], [1, 4], [2, 5]]
    assert apply_exif_orientation(px, 7).tolist() == [[5, 2], [4, 1], [3, 0]]
    for o in range(5, 9):  # dimension swap
        assert apply_exif_orientation(px, o).shape == (3, 2)
    for o in (1, 2, 3, 4):
        assert apply_exif_orientation(px, o).shape == (2, 3)
    with pytest.raises(ValueError, match="out of range"):
        apply_exif_orientation(px, 0)
    # a color array keeps its channel axis
    rgb = np.zeros((2, 3, 3), np.uint8)
    assert apply_exif_orientation(rgb, 6).shape == (3, 2, 3)


def test_orientation_normalized_phash_stability():
    """image_orientation_dedup's oracle needs two invariants: all four
    stored orientations of a class recover the SAME pHash through the
    real JPEG chain (the near-lossless all-ones quantization table is
    load-bearing), and the ten classes stay pairwise distinct. A codec
    or phash change that breaks either must fail HERE before the
    driver gate."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _decode_jpeg_pixels,
        encode_jpeg,
        phash64,
    )

    inv = {1: 1, 3: 3, 6: 8, 8: 6}
    class_hash = {}
    for c in range(10):
        i, j = np.mgrid[0:16, 0:16]
        base = (
            ((i // (1 + c % 4) + j // (1 + c // 4)) % 2) * 200 + 5 * c
        ).astype(np.uint8)
        hs = set()
        for o in (1, 3, 6, 8):
            stored = apply_exif_orientation(base, inv[o])
            blob = with_exif(
                encode_jpeg(stored), build_exif_app1(orientation=o)
            )
            px = apply_exif_orientation(
                _decode_jpeg_pixels(blob), parse_exif(blob)["orientation"]
            )
            hs.add(phash64(px))
        assert len(hs) == 1, f"class {c} not orientation-stable"
        class_hash[c] = hs.pop()
    assert len(set(class_hash.values())) == 10


def test_orientation_roundtrip_inverse_pairs():
    """Orientations form transform/inverse pairs: applying 6 then 8
    (90 CW then 270 CW) is identity, as is 3 twice, 2 twice, 4
    twice."""
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (
        apply_exif_orientation(apply_exif_orientation(px, 6), 8) == px
    ).all()
    for o in (2, 3, 4):
        assert (
            apply_exif_orientation(apply_exif_orientation(px, o), o) == px
        ).all()
