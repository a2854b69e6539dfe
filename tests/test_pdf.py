"""PDF text extraction (sources/pdf.py): fixture writer ↔ extractor
round trips, escape/TJ/hex handling, honest gates, Spark explode."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.sources.pdf import (
    build_pdf,
    extract_pdf_pages,
    pdf_documents,
)


def test_pdf_roundtrip_escapes_tj_hex_multipage():
    pdf = build_pdf(
        [
            ["hello world", "line with (parens) and \\ backslash"],
            [["kerned", -250, "words", -50, "close"], ("hex", "HEXED"), "tail"],
        ]
    )
    pages = extract_pdf_pages(pdf)
    assert pages == [
        "hello world\nline with (parens) and \\ backslash",
        # -250 < -100 kern => space; -50 => glued; Td newlines between
        "kerned wordsclose\nHEXED\ntail",
    ]


def test_pdf_uncompressed_and_octal_escape():
    assert extract_pdf_pages(build_pdf([["plain"]], compress=False)) == [
        "plain"
    ]
    # hand-built content with an octal escape: \101 == 'A'
    pdf = bytearray(build_pdf([["X"]], compress=False))
    assert extract_pdf_pages(bytes(pdf.replace(b"(X)", b"(\\101)"))) == ["A"]


def test_pdf_honest_gates():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_pages(b"NOTAPDF")
    good = build_pdf([["x"]])
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_pages(good.replace(b"/FlateDecode", b"/DCTDecode  "))
    # a stray /Encrypt marker without a resolvable dict is malformed
    with pytest.raises(ValueError, match="no trailer reference"):
        extract_pdf_pages(good + b"/Encrypt")


def test_pdf_xref_offsets_are_correct():
    """The fixture writer's xref table must point at the real object
    offsets — a conformant reader (not just our lexical scanner) can
    navigate the file."""
    pdf = build_pdf([["a"], ["b"]])
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"
    lines = pdf[xref_at:].split(b"\n")
    n = int(lines[1].split()[1])
    for i, line in enumerate(lines[3 : 2 + n], start=1):
        off = int(line.split()[0])
        assert pdf[off:].startswith(b"%d 0 obj" % i)


def test_pdf_documents_spark_explode(spark):
    rows = [
        (1, bytearray(build_pdf([["one"], ["two"]]))),
        (2, bytearray(build_pdf([["solo page"]]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.page): (r.text, r.n_chars)
        for r in pdf_documents(df).collect()
    }
    assert got == {
        (1, 0): ("one", 3),
        (1, 1): ("two", 3),
        (2, 0): ("solo page", 9),
    }


def test_pdf_tj_strings_with_brackets_and_operator_lookalikes():
    """Strings containing ], [, parens, and operator names must never
    confuse the operator walk — the scan parses strings in place."""
    pdf = build_pdf(
        [
            [["a]b", -200, "[c", -50, "(d) Tj BT"], "tail ] text"],
        ]
    )
    assert extract_pdf_pages(pdf) == ["a]b [c(d) Tj BT\ntail ] text"]


def test_pdf_stream_bytes_containing_endobj_magic():
    """Compressed stream data may legally contain 'endobj'/'endstream'
    byte sequences — /Length slicing must keep the object intact
    (stored-deflate makes the magic words literal in the stream)."""
    import zlib

    content = b"BT\n/F1 12 Tf\n72 720 Td\n(endobj endstream inside) Tj\nET"
    data = zlib.compress(content, 0)  # stored blocks: bytes pass through
    assert b"endobj" in data and b"endstream" in data
    buf = bytearray(b"%PDF-1.4\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(data)
        + data
        + b"\nendstream",
    ]
    for i, body in enumerate(objs, start=1):
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(bytes(buf)) == ["endobj endstream inside"]
    # indirect /Length resolves through the referenced integer object
    ind = bytes(buf).replace(
        b"/Length %d" % len(data), b"/Length 6 0 R", 1
    ) + b"6 0 obj\n%d\nendobj\n" % len(data)
    assert extract_pdf_pages(ind) == ["endobj endstream inside"]
    # ... and fails loudly when the target object does not exist
    bad = bytes(buf).replace(
        b"/Length %d" % len(data), b"/Length 6 0 R", 1
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unresolvable integer object"):
        extract_pdf_pages(bad)


def test_pdf15_extraction_matches_pdf14():
    """The 1.5 layout (ObjStm-packed dicts, indirect /Length content
    streams, xref stream trailer) extracts IDENTICAL text to the 1.4
    writer, for every supported predictor."""
    from ccgp_data_wrangling_spark.sources.pdf import build_pdf15

    pages = [
        ["hello (world)", ["kerned", -250, "text"]],
        [("hex", "HXY"), "p2 \\ line"],
    ]
    want = extract_pdf_pages(build_pdf(pages))
    for pred in (1, 2, 10, 12, 14):
        got = extract_pdf_pages(build_pdf15(pages, predictor=pred))
        assert got == want, pred


def test_pdf15_xref_navigation_and_read_object():
    """pdf_xref follows startxref into the xref STREAM, decodes the
    /W rows through the predictor, and read_object resolves both
    type-1 (offset) and type-2 (ObjStm member) entries — conformant
    navigation, not just lexical scanning."""
    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf15,
        pdf_xref,
        read_object,
    )

    blob = build_pdf15([["a"], ["b"]])
    xr = pdf_xref(blob)
    assert xr[0] == ("free",)
    # type-1 entries point at the true object headers
    for num, ent in xr.items():
        if ent[0] == "offset":
            assert blob[ent[1] :].startswith(b"%d 0 obj" % num), num
    # dict objects live in the ObjStm (type 2) and read back correctly
    assert xr[1][0] == "objstm"
    assert read_object(blob, 1) == b"<< /Type /Catalog /Pages 2 0 R >>"
    assert b"/Type /Page" in read_object(blob, 4)
    assert b"/Contents" in read_object(blob, 5)
    # content stream head resolves through its type-1 offset
    assert read_object(blob, 6).startswith(b"<< /Filter /FlateDecode")


def test_pdf14_classic_xref_through_pdf_xref():
    """The classic-table path of pdf_xref: every in-use entry points
    at its object, entry 0 is free."""
    from ccgp_data_wrangling_spark.sources.pdf import pdf_xref

    blob = build_pdf([["x"], ["y"]])
    xr = pdf_xref(blob)
    assert xr[0] == ("free",)
    in_use = [n for n, e in xr.items() if e[0] == "offset"]
    assert len(in_use) == 7  # catalog, pages, font, 2×(page, content)
    for num in in_use:
        assert blob[xr[num][1] :].startswith(b"%d 0 obj" % num)


def test_pdf15_honest_gates_and_corruption():
    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf15,
        extract_pdf_pages as extract,
        pdf_xref,
    )

    blob = build_pdf15([["z"]])
    # unresolvable indirect /Length fails loudly (content obj 5
    # references length obj 6 in the one-page layout)
    broken = blob.replace(b"/Length 6 0 R", b"/Length 99 0 R")
    with pytest.raises(ValueError, match="unresolvable integer object"):
        extract(broken)
    # an unsupported predictor value raises honestly in pdf_xref
    assert b"/Predictor 12" in blob
    with pytest.raises(NotImplementedError, match="predictor 7"):
        pdf_xref(blob.replace(b"/Predictor 12", b"/Predictor 7 "))
    # a stray /Encrypt marker without a resolvable dict is malformed
    with pytest.raises(ValueError, match="no trailer reference"):
        extract(blob + b"/Encrypt")


# ---------------------------------------------------------------------------
# Encryption (ISO 32000 §7.6 standard security handler)
# ---------------------------------------------------------------------------


def test_pdf_crypt_primitives():
    from ccgp_data_wrangling_spark.sources.pdf_crypt import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
        aes128_cbc_decrypt,
        aes128_cbc_encrypt,
        rc4,
    )

    # FIPS-197 appendix C.1 vector
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    w = _expand_key(key)
    ct = _encrypt_block(pt, w)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _decrypt_block(ct, w) == pt
    # RFC 6229 keystream for key 0x0102030405 (first 16 bytes)
    assert (
        rc4(bytes([1, 2, 3, 4, 5]), bytes(16)).hex()
        == "b2396305f03dc027ccc3524a0a1118a8"
    )
    # CBC round-trip incl. 16-aligned input (full pad block)
    for data in (b"", b"x", b"0123456789abcdef", b"many blocks" * 13):
        enc = aes128_cbc_encrypt(key, bytes(range(16)), data)
        assert aes128_cbc_decrypt(key, enc) == data
    with pytest.raises(ValueError, match="padding"):
        aes128_cbc_decrypt(bytes(16), aes128_cbc_encrypt(key, bytes(16), b"x"))


@pytest.mark.parametrize(
    "kw",
    [
        {"v": 1},  # RC4-40, R2
        {"v": 2, "r": 3, "length_bits": 128},  # RC4-128
        {"v": 4, "r": 4, "length_bits": 128},  # /StdCF /V2 (RC4)
        {"v": 4, "r": 4, "length_bits": 128, "aes": True},  # /AESV2
    ],
)
def test_pdf_encrypted_roundtrip(kw):
    from ccgp_data_wrangling_spark.sources.pdf import build_pdf_encrypted

    pages = [["secret line one", "line two"], [["kern", -260, "ed"]]]
    blob = build_pdf_encrypted(pages, user_pw=b"pw", **kw)
    # ciphertext really is opaque: the plaintext is not in the blob
    assert b"secret line one" not in blob
    import zlib as _z

    assert _z.compress(b"secret line one") not in blob
    got = extract_pdf_pages(blob, password=b"pw")
    assert got == extract_pdf_pages(build_pdf(pages))
    with pytest.raises(ValueError, match="invalid PDF password"):
        extract_pdf_pages(blob, password=b"wrong")


def test_pdf_encrypted_empty_password_and_uncompressed():
    from ccgp_data_wrangling_spark.sources.pdf import build_pdf_encrypted

    # the common "encrypted, no user password" web PDF opens with b""
    blob = build_pdf_encrypted([["open sesame"]], compress=False)
    assert extract_pdf_pages(blob) == ["open sesame"]


def test_pdf_encrypted_honest_gates():
    from ccgp_data_wrangling_spark.sources.pdf import build_pdf_encrypted

    blob = build_pdf_encrypted([["x"]], v=4, r=4, aes=True)
    with pytest.raises(NotImplementedError, match="V 6"):
        extract_pdf_pages(
            blob.replace(b"/V 4 /R 4", b"/V 6 /R 6"), password=b""
        )
    with pytest.raises(NotImplementedError, match="V 5 /R 4"):
        extract_pdf_pages(
            blob.replace(b"/V 4 /R 4", b"/V 5 /R 4"), password=b""
        )
    with pytest.raises(NotImplementedError, match="CFM"):
        extract_pdf_pages(blob.replace(b"/AESV2", b"/AESV3"))
    with pytest.raises(NotImplementedError, match="non-standard"):
        extract_pdf_pages(blob.replace(b"/Standard", b"/Custardd"))


def test_pdf_aes256_primitives():
    """FIPS-197 appendix C.3 (AES-256) vector through the T-table
    forward cipher and the straight inverse cipher; the revision-6
    hash is deterministic and salt-sensitive."""
    from ccgp_data_wrangling_spark.sources.pdf_crypt import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
        aes128_cbc_decrypt,
        aes128_cbc_encrypt,
        hash_r6,
    )

    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    w = _expand_key(key)
    ct = _encrypt_block(pt, w)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(ct, w) == pt
    # 32-byte-key CBC shares the AESV2 wire format
    blob = aes128_cbc_encrypt(key, bytes(16), b"aesv3 payload" * 9)
    assert aes128_cbc_decrypt(key, blob) == b"aesv3 payload" * 9
    h1 = hash_r6(b"pw", b"saltsalt")
    assert len(h1) == 32
    assert h1 == hash_r6(b"pw", b"saltsalt")
    assert h1 != hash_r6(b"pw", b"saltsalz")
    assert h1 != hash_r6(b"pw2", b"saltsalt")


def test_pdf_crypt_native_backend_equivalence():
    """The optional pyca/cryptography fast path must be bit-identical
    to the from-scratch FIPS-197 reference on every operation the
    module exposes, and the module must stay correct with the backend
    forced off (the fallback path)."""
    from ccgp_data_wrangling_spark.sources import pdf_crypt as pc

    key16, key32 = bytes(range(16)), bytes(range(32))
    iv = bytes(range(100, 116))
    data = b"native backend equivalence probe" * 4  # 8 blocks
    # self-check already ran at import; re-running must agree with it
    assert pc._native_aes_selfcheck() == pc._AES_NATIVE
    saved = pc._AES_NATIVE
    try:
        outs = []
        for flag in (False, True) if saved else (False,):
            pc._AES_NATIVE = flag
            outs.append(
                (
                    pc._cbc_encrypt_raw(key16, iv, data),
                    pc._cbc_encrypt_raw(key32, iv, data),
                    pc.aes128_cbc_encrypt(key16, iv, b"odd len pt"),
                    pc.aes128_cbc_encrypt(key32, iv, b"odd len pt"),
                    pc.aes_ecb_encrypt_block(key32, iv),
                    pc.aes_ecb_decrypt_block(key32, iv),
                )
            )
            ct = outs[-1][0]
            assert pc._cbc_decrypt_raw(key16, iv, ct) == data
            assert (
                pc.aes128_cbc_decrypt(key16, outs[-1][2]) == b"odd len pt"
            )
        assert len(set(outs)) == 1  # native ≡ pure on every op
    finally:
        pc._AES_NATIVE = saved


@pytest.mark.parametrize("r", [5, 6])
def test_pdf_encrypted_v5_roundtrip(r):
    """AES-256 (ISO 32000-2 §7.6.4): user AND owner password open the
    file, wrong passwords and tampered validation salts are rejected,
    and a tampered /P fails /Perms validation."""
    from ccgp_data_wrangling_spark.sources.pdf import build_pdf_encrypted

    pages = [["v5 secret line", "two"], [["ker", -250, "ned"]]]
    blob = build_pdf_encrypted(pages, user_pw=b"pw", v=5, r=r)
    assert b"v5 secret line" not in blob
    want = extract_pdf_pages(build_pdf(pages))
    assert extract_pdf_pages(blob, password=b"pw") == want
    assert extract_pdf_pages(blob, password=b"owner") == want
    with pytest.raises(ValueError, match="invalid PDF password"):
        extract_pdf_pages(blob, password=b"wrong")
    # corrupt the /U validation salt (bytes 32..40 of the 48-byte
    # entry, hex-encoded in the dict): the user hash can't match,
    # and the owner hash (keyed on the full /U) breaks too
    from ccgp_data_wrangling_spark.sources.pdf import _encryption_params

    u = _encryption_params(blob)["u"]
    bad_u = u[:32] + bytes(b ^ 0xFF for b in u[32:40]) + u[40:]
    tampered = blob.replace(u.hex().encode(), bad_u.hex().encode())
    with pytest.raises(ValueError, match="invalid PDF password"):
        extract_pdf_pages(tampered, password=b"pw")
    # tampered permissions int → Perms mismatch
    flipped = blob.replace(b"/P -44", b"/P -60")
    with pytest.raises(ValueError, match="Perms"):
        extract_pdf_pages(flipped, password=b"pw")


def test_pdf_encrypted_v5_empty_password():
    from ccgp_data_wrangling_spark.sources.pdf import build_pdf_encrypted

    blob = build_pdf_encrypted([["open v5"]], v=5, r=6)
    assert extract_pdf_pages(blob) == ["open v5"]


def test_pdf_documents_encrypted_spark(spark):
    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf_encrypted,
        pdf_documents,
    )

    blobs = [
        (i, build_pdf_encrypted([[f"doc {i} page 0"], [f"doc {i} page 1"]],
                                user_pw=b"corpus", v=4, r=4, aes=True))
        for i in range(3)
    ]
    df = spark.createDataFrame(blobs, "doc_id long, payload binary")
    rows = pdf_documents(df, password=b"corpus").collect()
    assert len(rows) == 6
    assert {(r.doc_id, r.page, r.text) for r in rows} == {
        (i, p, f"doc {i} page {p}") for i in range(3) for p in (0, 1)
    }


def test_pdf_filter_chains_roundtrip():
    """§7.4 stream filters: ASCIIHex, ASCII85, RunLength and LZW (the
    TIFF kernel at default /EarlyChange 1) decode both alone and in
    chains (transport wrapping compression), with byte-level codec
    properties and honest gates for image codecs and /EarlyChange 0."""
    import base64
    import binascii
    import os

    import pytest

    from ccgp_data_wrangling_spark.sources.pdf import (
        _ascii85_decode,
        _ascii_hex_decode,
        _rl_encode,
        _runlength_decode,
        build_pdf,
        extract_pdf_pages,
    )

    rng = os.urandom(257)
    for blob in (b"", b"x", b"\0\0\0\0mid\0\0\0\0", rng, b"r" * 300 + b"end"):
        assert _ascii85_decode(base64.a85encode(blob) + b"~>") == blob
        assert _ascii_hex_decode(binascii.hexlify(blob) + b">") == blob
        assert _runlength_decode(_rl_encode(blob)) == blob
    # whitespace/oddities the spec allows
    assert _ascii_hex_decode(b"4 86\n9>") == b"Hi"  # odd digit pads 0
    assert _ascii85_decode(b"<~z~>") == b"\0\0\0\0"  # adobe prefix + z
    # runs genuinely use the run form (not literal-only)
    assert len(_rl_encode(b"a" * 100)) <= 4

    pages = [["filter page", "two (lines)"], [["T", -50, "J"]]]
    ref = extract_pdf_pages(build_pdf(pages))
    for chain in (
        ("flate",), ("lzw",), ("rl",), ("ahx",), ("a85",),
        ("a85", "flate"), ("ahx", "rl"), ("rl", "lzw"),
    ):
        assert extract_pdf_pages(build_pdf(pages, filter_chain=chain)) == ref

    # honest gates
    blob = bytearray(build_pdf(pages, filter_chain=("lzw",)))
    i = blob.find(b"/LZWDecode") + len(b"/LZWDecode")
    with pytest.raises(NotImplementedError, match="EarlyChange 0"):
        extract_pdf_pages(
            bytes(blob[:i]) + b" /DecodeParms << /EarlyChange 0 >>"
            + bytes(blob[i:])
        )
    dct = bytearray(build_pdf(pages, filter_chain=("rl",)))
    j = dct.find(b"/RunLengthDecode")
    dct[j : j + len(b"/RunLengthDecode")] = b"/DCTDecode\x20\x20\x20\x20\x20\x20"
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        extract_pdf_pages(bytes(dct))
    with pytest.raises(ValueError, match="missing '>' EOD"):
        _ascii_hex_decode(b"48 49")
    with pytest.raises(ValueError, match="missing '~>'"):
        _ascii85_decode(b"87cUR")
    with pytest.raises(ValueError, match="missing EOD"):
        _runlength_decode(b"\x02abc")


def test_pdf_images_extraction():
    """Embedded image XObjects: DCTDecode through the from-scratch
    JPEG decoder (exact on flat tiles), Flate raw samples via
    /ColorSpace, transport wrapping ahead of the image codec,
    text/image coexistence, and honest gates (encryption, JPX,
    dimension mismatch, exotic colorspace, sub-8-bit samples)."""
    import base64

    import numpy as np
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_jpeg,
    )
    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf,
        build_pdf_encrypted,
        extract_pdf_pages,
        pdf_images,
    )

    gray = np.full((16, 24), 77, np.uint8)
    jpg = encode_jpeg(gray)
    rgb = np.zeros((6, 9, 3), np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 50, 100, 150
    blob = build_pdf(
        [["caption one"], ["caption two"]],
        page_images=[[("dct", jpg, 24, 16, 1)], [("flate", rgb)]],
    )
    # text extraction is undisturbed by the image streams
    assert extract_pdf_pages(blob) == ["caption one", "caption two"]
    imgs = pdf_images(blob)
    assert [(r["codec"], r["width"], r["height"], r["n_channels"],
             r["luma_mean"]) for r in imgs] == [
        ("jpeg", 24, 16, 1, 77.0),
        ("raw", 9, 6, 3, round(50 * 0.299 + 100 * 0.587 + 150 * 0.114, 4)),
    ]
    # transport wrapping ahead of the image codec: ASCII85'd JPEG
    a85 = bytearray(build_pdf([["x"]], page_images=[[("dct", jpg, 24, 16, 1)]]))
    i = a85.find(b"/Filter /DCTDecode")
    wrapped = base64.a85encode(jpg) + b"~>"
    a85 = (
        a85[:i]
        + b"/Filter [/ASCII85Decode /DCTDecode]"
        + a85[i + len(b"/Filter /DCTDecode"):]
    )
    j = a85.find(b"stream\n", i) + len(b"stream\n")
    k = a85.find(b"\nendstream", j)
    a85 = a85[:j] + wrapped + a85[k:]
    lm = a85.find(b"/Length %d" % len(jpg))
    a85 = a85[:lm] + b"/Length %d" % len(wrapped) + a85[
        lm + len(b"/Length %d" % len(jpg)):
    ]
    got = pdf_images(bytes(a85))
    assert got[0]["codec"] == "jpeg" and got[0]["luma_mean"] == 77.0
    # encrypted documents need the password (ValueError, not a gate —
    # decrypt-and-extract now composes; see test_pdf_images_encrypted)
    with pytest.raises(ValueError, match="invalid PDF password"):
        pdf_images(build_pdf_encrypted([["s"]], user_pw=b"x"))
    bad = bytearray(blob)
    m = bad.find(b"/Width 24")
    bad[m : m + 9] = b"/Width 23"
    with pytest.raises(ValueError, match="disagree"):
        pdf_images(bytes(bad))
    # /JPXDecode now decodes (operators/jpeg2000) — JPEG bytes behind
    # the JPX filter are a corrupt codestream, not an unimplemented one
    jpx = bytearray(blob)
    m = jpx.find(b"/DCTDecode")
    jpx[m : m + 10] = b"/JPXDecode"
    with pytest.raises(ValueError, match="SOC"):
        pdf_images(bytes(jpx))
    cs = bytearray(blob)
    m = cs.find(b"/DeviceGray")
    cs[m : m + 11] = b"/Separation"
    with pytest.raises(NotImplementedError, match="colorspace"):
        pdf_images(bytes(cs))
    bp = bytearray(blob)
    m = bp.find(b"/BitsPerComponent 8")
    bp[m : m + 19] = b"/BitsPerComponent 4"
    # 4-bit now decodes on the RAW path; a 4-bit DCT payload gates
    with pytest.raises(NotImplementedError, match="non-8-bit"):
        pdf_images(bytes(bp))


def test_pdf_decodeparms_positional():
    """§7.3.8.2: /DecodeParms pairs POSITIONALLY with the /Filter
    array — the predictor undo runs exactly once, at the filter whose
    entry declares it, not after every decompression filter (the
    whole-head-regex failure mode), and LZW /EarlyChange is read from
    the LZW filter's own entry."""
    import base64
    import zlib

    import pytest

    from ccgp_data_wrangling_spark.sources.pdf import (
        _decode_parms,
        _decode_stream_filters,
    )

    raw = bytes(range(256)) + b"tail-data"
    # transport + compression: predictor declared on the FLATE entry,
    # null on the transport entry
    pred = b"\x00" + raw  # one PNG filter-type-0 row, Columns = len(raw)
    wrapped = base64.a85encode(zlib.compress(pred)) + b"~>"
    head = (
        b"<< /Filter [/ASCII85Decode /FlateDecode] /DecodeParms "
        b"[null << /Predictor 12 /Columns %d >>] >>" % len(raw)
    )
    assert _decode_stream_filters(head, wrapped) == raw
    assert _decode_parms(head, 2)[0] == b""

    # double-decompression chain: the predictor belongs to decode step
    # ONE only; un-predicting again after step two (the old behavior)
    # corrupts the output or errors on row shape
    y = zlib.compress(raw)
    stored = zlib.compress(b"\x00" + y)
    head2 = (
        b"<< /Filter [/FlateDecode /FlateDecode] /DecodeParms "
        b"[<< /Predictor 12 /Columns %d >> null] >>" % len(y)
    )
    assert _decode_stream_filters(head2, stored) == raw

    # a single /DecodeParms dict against a /Filter ARRAY is ambiguous
    with pytest.raises(ValueError, match="single /DecodeParms dict"):
        _decode_stream_filters(
            b"<< /Filter [/FlateDecode /FlateDecode] /DecodeParms "
            b"<< /Predictor 12 /Columns 5 >> >>",
            stored,
        )

    # nested dict inside a parms entry scans balanced
    parms = _decode_parms(
        b"/Filter [/FlateDecode] /DecodeParms [<< /A << /B 1 >> /C 2 >>]", 1
    )
    assert parms == [b"<< /A << /B 1 >> /C 2 >>"]

    # single filter + single dict still pairs up
    one = zlib.compress(b"\x00" + raw)
    head3 = (
        b"<< /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns %d >> >>" % len(raw)
    )
    assert _decode_stream_filters(head3, one) == raw


def test_pdf_images_encrypted():
    """Encrypted-image extraction: image XObject streams decrypt with
    the same per-object keys as content streams (§7.6.2) across the
    cipher matrix — RC4-40, RC4-128, AES-128 and AES-256 R6 — and the
    decoded pixels are byte-identical to the unencrypted document's."""
    import numpy as np
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_jpeg,
    )
    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf_encrypted,
        extract_pdf_pages,
        pdf_images,
    )

    gray = np.full((8, 12), 130, np.uint8)
    jpg = encode_jpeg(gray)
    rgb = np.zeros((5, 7, 3), np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 10, 20, 200
    imgs = [[("dct", jpg, 12, 8, 1)], [("flate", rgb)]]
    expect = [
        ("jpeg", 12, 8, 1, 130.0),
        ("raw", 7, 5, 3, round(10 * 0.299 + 20 * 0.587 + 200 * 0.114, 4)),
    ]
    for kw in (
        dict(v=1),                      # RC4-40
        dict(v=2, r=3),                 # RC4-128
        dict(v=4, r=4, aes=True),       # AES-128
        dict(v=5, r=6),                 # AES-256
    ):
        blob = build_pdf_encrypted(
            [["img page A"], ["img page B"]],
            user_pw=b"sekrit", page_images=imgs, **kw,
        )
        got = pdf_images(blob, password=b"sekrit")
        assert [
            (g["codec"], g["width"], g["height"], g["n_channels"],
             g["luma_mean"]) for g in got
        ] == expect, kw
        # text path still opens the same document (shared _CryptState)
        assert extract_pdf_pages(blob, password=b"sekrit") == [
            "img page A", "img page B",
        ]
        with pytest.raises(ValueError, match="invalid PDF password"):
            pdf_images(blob, password=b"wrong")


def test_pdf_bit_depth_images_and_decode_array():
    """§8.9.5: 1/2/4-bit grayscale packs MSB-first with byte-padded
    rows, 16-bit components are big-endian, and a full-range /Decode
    [1 0] inverts the sample scale; channel means normalize to the
    0-255 luma scale at every depth. Partial-range arrays gate."""
    import numpy as np
    import pytest

    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf,
        pdf_images,
    )

    for bpc in (1, 2, 4, 16):
        m = (1 << bpc) - 1
        arr = np.tile(
            (37 + np.arange(24) ** 2) % (m + 1), (16, 1)
        )
        for inv in (False, True):
            blob = build_pdf(
                [["img"]], page_images=[[("packed", arr, bpc, inv)]]
            )
            (r,) = pdf_images(blob)
            vals = (m - arr) if inv else arr
            exp = round(float(vals.mean()) * 255.0 / m, 4)
            assert r["codec"] == "raw"
            assert r["luma_mean"] == pytest.approx(exp, abs=1e-6)
    blob = build_pdf(
        [["img"]],
        page_images=[[("packed", np.zeros((4, 8), int), 4, False)]],
    )
    bad = blob.replace(
        b"/BitsPerComponent 4",
        b"/BitsPerComponent 4 /Decode [0 0.5]",
    )
    with pytest.raises(NotImplementedError, match="partial-range"):
        pdf_images(bad)
    # a truncated low-bpc payload must not mis-reshape
    short = blob.replace(b"/Width 8", b"/Width 9")
    with pytest.raises(ValueError, match="disagree"):
        pdf_images(short)


def test_r6_seeded_key_cache_skips_kdf():
    """Driver-precomputed Algorithm 2.B entries (r6_seed_entries /
    seed_r6_cache) must open an R6 document with the KDF body never
    invoked — the 100 TB cold-executor path — and produce the exact
    pages the unseeded derivation produces."""
    import ccgp_data_wrangling_spark.sources.pdf_crypt as pc
    from ccgp_data_wrangling_spark.sources.pdf import (
        _encryption_params,
        build_pdf_encrypted,
    )

    pages = [["seeded r6 secret", "line two"]]
    blob = build_pdf_encrypted(pages, user_pw=b"pw", v=5, r=6)
    want = extract_pdf_pages(blob, password=b"pw")
    prm = _encryption_params(blob)
    entries = pc.r6_seed_entries(b"pw", prm["u"], prm["o"])
    assert len(entries) == 4 and all(len(e[3]) == 32 for e in entries)

    # fresh-worker simulation: computed memo cleared, seeds installed,
    # compute body booby-trapped
    pc._hash_r6_compute.cache_clear()
    saved = pc._R6_SEEDED.copy()
    orig = pc._hash_r6_compute

    def boom(*a):
        raise AssertionError("KDF ran despite seeded cache")

    try:
        pc._R6_SEEDED.clear()
        pc.seed_r6_cache(entries)
        pc._hash_r6_compute = boom
        assert extract_pdf_pages(blob, password=b"pw") == want
    finally:
        pc._hash_r6_compute = orig
        pc._R6_SEEDED.clear()
        pc._R6_SEEDED.update(saved)
