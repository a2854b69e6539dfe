"""Unicode hygiene for text corpora: NFC normalization and mojibake
repair — the first stage every web-scale curation pipeline runs
before tokenization or dedup (un-normalized text makes identical
strings hash differently; mojibake poisons language ID and quality
scores).

Spark has no built-in Unicode normalizer, so both operators are
Arrow-batched kernels (``pandas_udf``) — the sanctioned Python path;
work is per-character string transformation that no Column-expression
composition can express.

* :func:`nfc_normalize` — ``unicodedata.normalize("NFC", …)``.
  Driver-checkable against an INDEPENDENT implementation: DuckDB's
  ``nfc_normalize`` (ICU) must produce byte-identical output, which
  the ``unicode_nfc_normalize`` gate pins.
* :func:`fix_mojibake` — repairs the classic UTF-8-bytes-decoded-as-
  cp1252/latin-1 corruption (``café`` → ``cafÃ©``) by re-encoding
  through the wrong codec and decoding as UTF-8; strings that don't
  survive the round trip are returned untouched, so the repair is
  idempotent and safe to run corpus-wide. Repeated application fixes
  doubly-mangled text; ``passes`` bounds it.

Reference parity: cademirch/ccgp-data-wrangling normalizes sheet
strings ad hoc (utils/parse.py lowercase/strip); corpus-scale
Unicode repair is beyond-reference surface.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["nfc_normalize", "fix_mojibake", "fix_mojibake_str"]


def nfc_normalize(col: Column | str) -> Column:
    """NFC-normalize a string column (Arrow-batched kernel).

    The ``pandas_udf`` is created HERE, not at module import: the
    decorator parses its return type through the active session, and
    executors re-import this module in session-less Python workers —
    a module-level decorator would crash every task."""

    @pandas_udf("string")
    def kernel(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize("NFC", v)
            if v is not None
            else None
        )

    return kernel(F.col(col) if isinstance(col, str) else col)


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    """Per-character inverse of a best-fit cp1252 decode.

    Real-world manglers decode UTF-8 bytes as cp1252 and leave the
    five undefined cells (0x81 0x8D 0x8F 0x90 0x9D) as the raw C1
    control character — so a single mangled string can MIX cp1252
    characters with C1 controls (e.g. U+201D → 'â€' + U+009D).  A
    whole-string ``encode("cp1252")`` or ``encode("latin-1")`` fails
    on such mixes (r6 advice): '€' is not latin-1 and U+009D is not
    cp1252.  Encoding character-by-character — cp1252 first, any
    U+0080–U+009F straggler mapped straight to its byte value —
    inverts the mangle exactly.  Returns None when some character has
    no byte-level preimage (genuinely non-mojibake text)."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if 0x80 <= cp <= 0x9F:
                out.append(cp)
            else:
                return None
    return bytes(out)


def fix_mojibake_str(s: str, *, passes: int = 2) -> str:
    """Repair UTF-8-mis-decoded text (plain-Python core, also used by
    tests as the single-string reference). Each pass re-encodes via
    the sloppy-cp1252 inverse (see :func:`_sloppy_cp1252_encode`) and
    decodes as UTF-8; a pass that fails either step leaves the string
    as-is, which makes the repair a no-op on healthy text."""
    for _ in range(passes):
        b = _sloppy_cp1252_encode(s)
        if b is None:
            return s
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if t == s:
            return s
        s = t
    return s


def fix_mojibake(col: Column | str) -> Column:
    """Repair mojibake in a string column (Arrow-batched kernel;
    created at call time — see nfc_normalize)."""
    repair = fix_mojibake_str

    @pandas_udf("string")
    def kernel(s: pd.Series) -> pd.Series:
        return s.map(lambda v: repair(v) if v is not None else None)

    return kernel(F.col(col) if isinstance(col, str) else col)
