"""Unicode hygiene kernels: NFC normalization and mojibake repair."""

from __future__ import annotations

import unicodedata

from ccgp_data_wrangling_spark.functions.unicode_norm import (
    fix_mojibake,
    fix_mojibake_str,
    nfc_normalize,
)


def test_fix_mojibake_str_cases():
    # classic single mangle
    assert fix_mojibake_str("cafÃ©") == "café"
    # punctuation in the 0x80-0x9F byte region: em dash and “ mangle
    # via cp1252; ” (UTF-8 ..0x9D, a cp1252 hole) only via latin-1 —
    # the repair's codec fallback recovers both
    assert fix_mojibake_str("— “x".encode("utf-8").decode("cp1252")) \
        == "— “x"
    assert fix_mojibake_str("”".encode("utf-8").decode("latin-1")) == "”"
    # double mangle repaired by the second pass
    double = "café".encode("utf-8").decode("cp1252")
    double = double.encode("utf-8").decode("cp1252")
    assert fix_mojibake_str(double) == "café"
    # healthy text — ASCII and real accents — is untouched
    assert fix_mojibake_str("plain ascii") == "plain ascii"
    assert fix_mojibake_str("café naïve") == "café naïve"
    # text the wrong codec can't even encode is untouched
    assert fix_mojibake_str("日本語") == "日本語"
    # mangles that used latin-1 (bytes in cp1252's five holes) still
    # repair through the latin-1 fallback
    shadda = "\u0651"  # UTF-8 0xd9 0x91; 0x91 is a cp1252 hole
    holey = shadda.encode("utf-8").decode("latin-1")
    assert "\x91" in holey  # C1 control only latin-1 re-encodes
    assert fix_mojibake_str(holey) == shadda


def test_fix_mojibake_str_mixed_cp1252_and_c1_holes():
    # The most common real-world mangle: a best-fit cp1252 decode
    # maps UTF-8 \u201d (E2 80 9D) to '\u00e2' + '\u20ac' + U+009D \u2014 '\u20ac' blocks a
    # whole-string latin-1 encode and U+009D blocks cp1252, so the
    # r6 whole-string fallback left it unrepaired.  The per-character
    # sloppy encode inverts the mix.
    def bestfit_cp1252(b: bytes) -> str:
        # decode like lenient real-world readers: cp1252 where
        # defined, raw C1 control for the five holes
        out = []
        for byte in b:
            try:
                out.append(bytes([byte]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(byte))
        return "".join(out)

    for clean in ["\u201d", "he said \u201chi\u201d \u2014 na\u00efve", "\u2018x\u2019 \u2022 \u017e \u0152", "caf\u00e9 \u201dx"]:
        mangled = bestfit_cp1252(clean.encode("utf-8"))
        assert fix_mojibake_str(mangled) == clean, clean
    # pure C1 control text has no valid UTF-8 reading \u2192 untouched
    assert fix_mojibake_str("\x9d\x8f") == "\x9d\x8f"


def test_nfc_and_mojibake_columns(spark):
    decomposed = "éÀ"  # e+acute, A+grave
    df = spark.createDataFrame(
        [(1, decomposed, "cafÃ©"), (2, "ok", "plain"),
         (3, None, None)],
        "id long, t string, m string",
    )
    got = {
        r.id: r
        for r in df.select(
            "id",
            nfc_normalize("t").alias("n"),
            fix_mojibake("m").alias("f"),
        ).collect()
    }
    assert got[1].n == unicodedata.normalize("NFC", decomposed)
    assert got[1].n == "éÀ"
    assert got[1].f == "café"
    assert got[2].n == "ok" and got[2].f == "plain"
    assert got[3].n is None and got[3].f is None


def test_nfc_matches_duckdb_icu(spark):
    """Cross-implementation pin: Python UCD vs DuckDB ICU on a sweep
    of decomposable sequences — NFC is stability-guaranteed, the two
    must agree byte-for-byte."""
    import duckdb

    samples = [
        "é",  # é composed from pair
        "À",  # À
        "ñ",  # ñ
        "ȫ",  # stacked diacritics
        "Å",  # ANGSTROM SIGN → Å under NFC
        "ḍ̇",  # reordering: dot-below before dot-above
        "ascii only",
        "",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, s string"
    )
    got = {
        r.id: r.n
        for r in df.select("id", nfc_normalize("s").alias("n")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        want = con.execute("select nfc_normalize(?)", [s]).fetchone()[0]
        assert got[i] == want, (i, s)


def test_fix_mojibake_property_idempotent_and_roundtrip():
    """Property: repair is idempotent on arbitrary text, and exactly
    inverts a best-fit cp1252 mangle of UTF-8 for any text whose
    characters survive the mangle representation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def idempotent(s):
        once = fix_mojibake_str(s)
        assert fix_mojibake_str(once) == once

    idempotent()

    def bestfit(b: bytes) -> str:
        out = []
        for byte in b:
            try:
                out.append(bytes([byte]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(byte))
        return "".join(out)

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2122),
            min_size=1,
            max_size=40,
        )
    )
    def roundtrip(s):
        mangled = bestfit(s.encode("utf-8"))
        if mangled == s:  # pure ASCII never mangles
            return
        if fix_mojibake_str(s) != s:
            # s itself is mojibake-shaped (e.g. 'Â\x80'): the 2-pass
            # repair — which exists to fix double mangles — will
            # rightly peel one more layer. Mojibake repair is only
            # well-defined up to "clean" fixpoints.
            return
        assert fix_mojibake_str(mangled) == s

    roundtrip()
