"""PDF text extraction — the other document container every curation
pipeline meets (alongside WARC), implemented from the public PDF 1.4
spec (ISO 32000 subset) with nothing beyond stdlib ``zlib``/``re``.

What this parser implements (and tests):

* object scan: ``N G obj … endobj`` bodies located lexically — the
  robust route for extraction tooling (a damaged xref is the most
  common real-world PDF defect, so extractors don't trust it);
* stream objects: the dict between ``obj`` and ``stream`` is parsed
  for ``/FlateDecode`` (zlib-inflated) — uncompressed streams pass
  through;
* content-stream text operators inside ``BT … ET`` blocks:
  ``Tj`` (show string), ``'``/``"`` (next-line show), ``TJ`` (array
  of strings and kerning numbers), with literal-string escapes
  (``\\n \\r \\t \\( \\) \\\\`` and octal ``\\ddd``) and ``<hex>``
  strings; positioning operators ``Td/TD/T*`` become newlines and
  large negative TJ kerns become spaces — the standard heuristic
  reconstruction every extractor performs (text in PDF has no
  logical structure, only placements);
* encryption, xref streams, object streams (1.5+), CIDFont/ToUnicode
  remapping and non-Latin encodings raise ``NotImplementedError``
  honestly — the fixture writer emits none of them.

Scale shape: identical to WARC — PDFs land as binary blobs, the
extraction runs inside one Arrow ``mapInPandas`` pass
(:func:`pdf_documents`), one row per page, nothing driver-side.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "extract_pdf_pages",
    "pdf_documents",
    "build_pdf",
    "PDF_PAGE_SCHEMA",
]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"^(.*?)stream\r?\n(.*)\nendstream\s*$", re.S)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal(data: bytes, pos: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at ``data[pos] == '('``;
    returns (decoded bytes, index past the closing paren). Handles
    balanced parens, backslash escapes, and octal escapes."""
    assert data[pos : pos + 1] == b"("
    out = bytearray()
    depth = 1
    i = pos + 1
    while i < len(data):
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(data) and len(digits) < 3 and data[j : j + 1].isdigit():
                    digits += data[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out += c
        i += 1
    raise ValueError("unterminated PDF literal string")


def _parse_hex(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.index(b">", pos)
    hx = re.sub(rb"\s", b"", data[pos + 1 : end])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    return bytes.fromhex(hx.decode("ascii")), end + 1


_TOKEN_RE = re.compile(
    rb"\(|<(?![<])|\]|\[|BT\b|ET\b|Tj\b|TJ\b|T\*|Td\b|TD\b|'|\"|(-?\d+(?:\.\d+)?)"
)


def _content_text(content: bytes, *, kern_space: float = 100.0) -> str:
    """Reconstruct text from one content stream: strings shown by
    Tj/TJ/'/\" inside BT..ET, newlines for Td/TD/T*/'/\", spaces for
    TJ kerns more negative than ``kern_space``.

    The token walk parses strings IN PLACE (the scan index jumps past
    each string body), so brackets/parens/operator names inside
    string data can never confuse the operator stream, and TJ arrays
    are collected incrementally in operand order — no re-scanning."""
    out: list[str] = []
    in_text = False
    pending: list[bytes] = []  # string operands since the last operator
    arr_items: list[Any] | None = None  # open TJ array, in order
    i = 0
    while i < len(content):
        m = _TOKEN_RE.search(content, i)
        if not m:
            break
        tok = m.group(0)
        i = m.end()
        if tok == b"(":
            s, i = _parse_literal(content, m.start())
            if arr_items is not None:
                arr_items.append(s)
            elif in_text:
                pending.append(s)
            continue
        if tok == b"<":
            s, i = _parse_hex(content, m.start())
            if arr_items is not None:
                arr_items.append(s)
            elif in_text:
                pending.append(s)
            continue
        if m.group(1) is not None:  # number
            if arr_items is not None:
                arr_items.append(float(m.group(1)))
            continue
        if tok == b"BT":
            in_text = True
        elif tok == b"ET":
            in_text = False
        elif tok == b"[":
            arr_items = []
        elif tok == b"]":
            pass  # keep arr_items until the TJ that consumes it
        elif tok == b"Tj" and pending:
            out.append(pending[-1].decode("latin-1"))
            pending = []
        elif tok in (b"'", b'"') and in_text:
            out.append("\n")
            if pending:
                out.append(pending[-1].decode("latin-1"))
            pending = []
        elif tok == b"TJ":
            for el in arr_items or []:
                if isinstance(el, bytes):
                    out.append(el.decode("latin-1"))
                elif el < -kern_space:
                    out.append(" ")
            arr_items = None
            pending = []
        elif tok in (b"Td", b"TD", b"T*"):
            if in_text and out:
                out.append("\n")
            pending = []
    return "".join(out)


_OBJ_START_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
# direct /Length only: '/Length 6 0 R' (indirect reference) must NOT
# half-match its first number
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s*R)\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")


def extract_pdf_pages(payload: bytes) -> list[str]:
    """Extract per-page text from a PDF byte blob (one string per
    content stream, in object order — the fixture writer emits one
    content stream per page in page order).

    Stream bodies are sliced by the dict's ``/Length`` when present —
    compressed bytes may legally contain ``endobj``/``endstream``, so
    the lexical ``.*?endobj`` scan alone would truncate such objects;
    only length-less streams fall back to the lexical boundary.
    Indirect ``/Length N 0 R`` references raise honestly (resolving
    them needs the xref this extractor deliberately doesn't trust).
    """
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in payload:
        raise NotImplementedError("encrypted PDF")
    pages: list[str] = []
    pos = 0
    while True:
        om = _OBJ_START_RE.search(payload, pos)
        if not om:
            break
        sm = _STREAM_START_RE.search(payload, om.end())
        em = payload.find(b"endobj", om.end())
        if em < 0:
            em = len(payload)
        if sm is None or sm.start() > em:
            pos = em + 6  # no stream in this object
            continue
        head = payload[om.end() : sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm:
            data = payload[sm.end() : sm.end() + int(lm.group(1))]
            pos = payload.find(b"endobj", sm.end() + int(lm.group(1)))
            pos = pos + 6 if pos >= 0 else len(payload)
        else:
            if re.search(rb"/Length\s+\d+\s+\d+\s*R", head):
                raise NotImplementedError("indirect /Length reference")
            end = payload.find(b"\nendstream", sm.end())
            if end < 0:
                raise ValueError("unterminated PDF stream")
            data = payload[sm.end() : end]
            pos = end + len(b"\nendstream")
        if b"/ObjStm" in head or b"/XRef" in head:
            raise NotImplementedError("PDF 1.5 object/xref streams")
        if b"/FlateDecode" in head:
            data = zlib.decompress(data)
        elif b"/Filter" in head:
            raise NotImplementedError("non-Flate PDF stream filter")
        if b"BT" in data:
            pages.append(_content_text(data))
    return pages


PDF_PAGE_SCHEMA = "doc_id long, page int, text string, n_chars int"


def pdf_documents(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Explode PDF blobs into one row per page with extracted text —
    one Arrow mapInPandas pass, the WARC-ingest shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                for k, text in enumerate(extract_pdf_pages(bytes(blob))):
                    rows.append(
                        {
                            "doc_id": did,
                            "page": k,
                            "text": text,
                            "n_chars": len(text),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "text", "n_chars"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        op, schema=PDF_PAGE_SCHEMA
    )


def _escape_literal(s: str) -> bytes:
    b = s.encode("latin-1")
    return (
        b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    )


def build_pdf(pages: list[list[Any]], *, compress: bool = True) -> bytes:
    """Fixture writer: a conformant single-font PDF 1.4 with a correct
    xref table. Each page is a list of segments: a plain string →
    one ``Tj`` line (``Td`` positioning, so extraction shows it on its
    own line); a list of strings/ints → one ``TJ`` array (ints are
    kern amounts); a tuple ``("hex", s)`` → hex-string ``Tj``.
    ``compress`` Flate-encodes the content streams (the common case).
    """
    objects: list[bytes] = []

    def content_for(segs: list[Any]) -> bytes:
        lines = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        first = True
        for seg in segs:
            if not first:
                lines.append(b"0 -14 Td")
            first = False
            if isinstance(seg, str):
                lines.append(b"(" + _escape_literal(seg) + b") Tj")
            elif isinstance(seg, tuple) and seg[0] == "hex":
                lines.append(
                    b"<" + seg[1].encode("latin-1").hex().encode() + b"> Tj"
                )
            else:  # TJ array
                parts = []
                for el in seg:
                    if isinstance(el, str):
                        parts.append(b"(" + _escape_literal(el) + b")")
                    else:
                        parts.append(str(el).encode())
                lines.append(b"[" + b" ".join(parts) + b"] TJ")
        lines.append(b"ET")
        return b"\n".join(lines)

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages, 3 font, then per page:
    # (4+2k) page, (5+2k) content
    kids = b" ".join(
        b"%d 0 R" % (4 + 2 * k) for k in range(n_pages)
    )
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for k, segs in enumerate(pages):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % (5 + 2 * k)
        )
        raw = content_for(segs)
        if compress:
            data = zlib.compress(raw)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(data)
        else:
            data = raw
            head = b"<< /Length %d >>" % len(data)
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(buf)
