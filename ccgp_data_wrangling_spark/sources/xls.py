"""Dependency-free legacy ``.xls`` (BIFF8) reader + fixture writer.

The reference reads submitted sheets with ``pd.read_excel``
(utils/parse.py:167,228-230), which accepts legacy ``.xls`` via xlrd —
not shipped in this environment. A ``.xls`` file is a CFB (Compound
File Binary, MS-CFB) container holding a ``Workbook`` stream of BIFF8
records (MS-XLS), so this module reads the subset that submitted
metadata sheets actually use with ``struct`` + bytes only:

* CFB: header → FAT (via DIFAT) → directory → ``Workbook`` stream,
  including the mini-FAT/mini-stream path real small files use;
* BIFF8: BOUNDSHEET (sheet directory), SST (+CONTINUE splits),
  LABELSST / LABEL / RSTRING (strings), NUMBER / RK / MULRK (floats),
  BOOLERR; FORMULA cells yield their cached numeric result.

Cells come back as strings (or None), the same shape as
``xlsx.xlsx_rows`` — submitted sheets are string-typed by contract and
typed later by the cleaning pipeline. Floats that are integral print
without the trailing ``.0`` (pandas ``dtype=str`` parity).

``write_xls`` emits a minimal-but-valid BIFF8 workbook for fixtures
and round-trip tests (the Workbook stream is padded past the 4096-byte
mini-stream cutoff so it lives in the regular FAT).

Scale note: like the xlsx path, parsing is driver-side by design —
submitted spreadsheets are small per-file; the distributed plan starts
at ``spark.createDataFrame`` in ``ingest.read_submitted_sheet``.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------


def _u32s(data: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(data) // 4}I", data[: len(data) // 4 * 4]))


def read_cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Read the first CFB stream whose name is in ``names`` —
    the container walk (header → FAT via DIFAT → directory →
    stream chain, incl. the mini-FAT path) shared by the ``.xls``
    reader here and the legacy ``.doc`` reader
    (:mod:`sources.doc`)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not a CFB/.xls file (bad magic)")
    sect_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    n_difat = struct.unpack_from("<I", data, 72)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]

    def sector(n: int) -> bytes:
        off = ssz * (n + 1)
        return data[off : off + ssz]

    # FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    fat_sectors = [s for s in _u32s(data[76 : 76 + 436]) if s != _FREESECT]
    next_difat = struct.unpack_from("<I", data, 68)[0]
    for _ in range(n_difat):
        if next_difat in (_ENDOFCHAIN, _FREESECT):
            break
        body = sector(next_difat)
        fat_sectors += [s for s in _u32s(body[:-4]) if s != _FREESECT]
        next_difat = struct.unpack_from("<I", body, ssz - 4)[0]
    fat: list[int] = []
    for s in fat_sectors:
        fat += _u32s(sector(s))

    def chain(start: int) -> bytes:
        out, n, hops = [], start, 0
        while n not in (_ENDOFCHAIN, _FREESECT):
            out.append(sector(n))
            n = fat[n]
            hops += 1
            if hops > len(fat) + 1:
                raise ValueError("corrupt FAT chain (cycle)")
        return b"".join(out)

    # directory entries (128 bytes each)
    dir_data = chain(first_dir)
    entries = []
    for off in range(0, len(dir_data) - 127, 128):
        raw_name = dir_data[off : off + 64]
        name_len = struct.unpack_from("<H", dir_data, off + 64)[0]
        name = raw_name[: max(0, name_len - 2)].decode("utf-16-le", "ignore")
        obj_type = dir_data[off + 66]
        start = struct.unpack_from("<I", dir_data, off + 116)[0]
        size = struct.unpack_from("<Q", dir_data, off + 120)[0]
        entries.append((name, obj_type, start, size))

    root = next(e for e in entries if e[1] == 5)
    wb = next(
        (e for e in entries if e[1] == 2 and e[0] in names), None
    )
    if wb is None:
        raise ValueError(
            f"no {'/'.join(names)} stream in the CFB container"
        )
    _, _, wb_start, wb_size = wb

    if wb_size >= mini_cutoff:
        return chain(wb_start)[:wb_size]

    # mini-stream path: the root entry's chain IS the mini stream
    mini_stream = chain(root[2])[: root[3]]
    minifat: list[int] = []
    n = first_minifat
    while n not in (_ENDOFCHAIN, _FREESECT):
        minifat += _u32s(sector(n))
        n = fat[n]
    out, n, hops = [], wb_start, 0
    while n not in (_ENDOFCHAIN, _FREESECT):
        out.append(mini_stream[msz * n : msz * (n + 1)])
        n = minifat[n]
        hops += 1
        if hops > len(minifat) + 1:
            raise ValueError("corrupt miniFAT chain (cycle)")
    return b"".join(out)[:wb_size]


def _read_workbook_stream(data: bytes) -> bytes:
    return read_cfb_stream(data, ("Workbook", "Book"))


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

_BOF, _EOF = 0x0809, 0x000A
_BOUNDSHEET, _SST, _CONTINUE = 0x0085, 0x00FC, 0x003C
_LABELSST, _LABEL, _RSTRING = 0x00FD, 0x0204, 0x00D6
_NUMBER, _RK, _MULRK, _BOOLERR = 0x0203, 0x027E, 0x00BD, 0x0205
_FORMULA_RECS = (0x0006, 0x0406, 0x0206)


def _records(stream: bytes, at: int = 0):
    """Yield (opcode, data_offset, length) from ``at`` to stream end."""
    n = len(stream)
    while at + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, at)
        yield op, at + 4, ln
        at += 4 + ln


class _SstReader:
    """Byte reader over SST + CONTINUE segments.

    BIFF8 may split a string ANYWHERE across a CONTINUE boundary; when
    the split lands inside a string's character data, the continuation
    re-emits a fresh grbit byte declaring the encoding of the rest.
    The reader tracks segment boundaries so ``chars`` can re-read it.
    """

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0  # current segment
        self.p = 0  # position within it

    def _avail(self) -> int:
        return len(self.segs[self.i]) - self.p

    def _advance(self) -> None:
        while self.i < len(self.segs) - 1 and self._avail() == 0:
            self.i += 1
            self.p = 0

    def take(self, n: int) -> bytes:
        out = b""
        while n:
            self._advance()
            got = self.segs[self.i][self.p : self.p + min(n, self._avail())]
            if not got:
                raise ValueError("SST truncated")
            out += got
            self.p += len(got)
            n -= len(got)
        return out

    def chars(self, cch: int, high: bool) -> str:
        # cch counts UTF-16 CODE UNITS (a non-BMP char is 2 units);
        # surrogatepass keeps pair halves split across CONTINUE
        # boundaries, and the final re-encode/decode merges them
        out = ""
        while cch:
            self._advance()
            if self._avail() == 0:
                raise ValueError("SST truncated")
            width = 2 if high else 1
            n_here = min(cch, self._avail() // width)
            if n_here == 0:
                raise ValueError("SST char split inside a code unit")
            raw = self.take(n_here * width)
            if high:
                out += raw.decode("utf-16-le", "surrogatepass")
            else:
                out += raw.decode("latin-1")
            cch -= n_here
            if cch and self._avail() == 0:
                # split mid-string: continuation re-declares encoding
                self._advance()
                high = bool(self.take(1)[0] & 0x01)
        return out.encode("utf-16-le", "surrogatepass").decode(
            "utf-16-le", "surrogatepass"
        )

    def string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        grbit = self.take(1)[0]
        high, ext, rich = bool(grbit & 1), bool(grbit & 4), bool(grbit & 8)
        n_runs = struct.unpack("<H", self.take(2))[0] if rich else 0
        n_ext = struct.unpack("<I", self.take(4))[0] if ext else 0
        s = self.chars(cch, high)
        if n_runs:
            self.take(4 * n_runs)
        if n_ext:
            self.take(n_ext)
        return s


def _short_string(data: bytes, at: int) -> str:
    """BOUNDSHEET-style short unicode string (u8 length)."""
    cch = data[at]
    high = bool(data[at + 1] & 1)
    raw = data[at + 2 : at + 2 + cch * (2 if high else 1)]
    return raw.decode("utf-16-le" if high else "latin-1")


def _rk_value(rk: int) -> float:
    cents = rk & 1
    if rk & 2:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        val = float(v)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return val / 100.0 if cents else val


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e16 else repr(v)


def xls_rows(path: str, *, sheet: str | int = 0) -> list[list[str | None]]:
    """Read one worksheet of a BIFF8 ``.xls`` into dense rows of
    strings/None — the same shape as :func:`xlsx.xlsx_rows`.
    """
    with open(path, "rb") as fh:
        stream = _read_workbook_stream(fh.read())

    # workbook-globals pass: sheet directory + shared strings
    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    sst_strings: list[str] = []
    sst_segments: list[bytes] = []
    collecting_sst = False
    for op, off, ln in _records(stream):
        if op == _BOUNDSHEET:
            pos = struct.unpack_from("<I", stream, off)[0]
            sheets.append((_short_string(stream, off + 6), pos))
            collecting_sst = False
        elif op == _SST:
            sst_segments = [stream[off + 8 : off + ln]]
            n_unique = struct.unpack_from("<I", stream, off + 4)[0]
            collecting_sst = True
        elif op == _CONTINUE and collecting_sst:
            sst_segments.append(stream[off : off + ln])
        elif op == _EOF:
            break
        else:
            collecting_sst = False
    if sst_segments:
        rd = _SstReader(sst_segments)
        sst_strings = [rd.string() for _ in range(n_unique)]

    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f".xls has {len(sheets)} sheets, asked for #{sheet}")
        start = sheets[sheet][1]
    else:
        by_name = dict(sheets)
        if sheet not in by_name:
            raise ValueError(f"no sheet named {sheet!r}; have {sorted(by_name)}")
        start = by_name[sheet]

    cells: dict[tuple[int, int], str | None] = {}

    def put(r: int, c: int, v: str | None) -> None:
        cells[(r, c)] = v

    for op, off, ln in _records(stream, start):
        if op == _EOF:
            break
        elif op == _NUMBER:
            r, c = struct.unpack_from("<HH", stream, off)
            put(r, c, _fmt_num(struct.unpack_from("<d", stream, off + 6)[0]))
        elif op == _RK:
            r, c = struct.unpack_from("<HH", stream, off)
            put(r, c, _fmt_num(_rk_value(struct.unpack_from("<I", stream, off + 6)[0])))
        elif op == _MULRK:
            r, c_first = struct.unpack_from("<HH", stream, off)
            n = (ln - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", stream, off + 4 + 6 * i + 2)[0]
                put(r, c_first + i, _fmt_num(_rk_value(rk)))
        elif op == _LABELSST:
            r, c = struct.unpack_from("<HH", stream, off)
            idx = struct.unpack_from("<I", stream, off + 6)[0]
            put(r, c, sst_strings[idx])
        elif op in (_LABEL, _RSTRING):
            r, c = struct.unpack_from("<HH", stream, off)
            rd = _SstReader([stream[off + 6 : off + ln]])
            put(r, c, rd.string())
        elif op == _BOOLERR:
            r, c = struct.unpack_from("<HH", stream, off)
            val, is_err = stream[off + 6], stream[off + 7]
            put(r, c, None if is_err else ("TRUE" if val else "FALSE"))
        elif op in _FORMULA_RECS:
            r, c = struct.unpack_from("<HH", stream, off)
            result = stream[off + 6 : off + 14]
            if result[6:8] != b"\xff\xff":  # cached numeric result
                put(r, c, _fmt_num(struct.unpack("<d", result)[0]))
            # string/bool/err formula results need the trailing STRING
            # record; submitted sheets don't use formulas — leave None
    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)
    ]


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _biff_string(s: str) -> bytes:
    """SST-style unicode string, always uncompressed UTF-16LE.

    cch is the UTF-16 CODE-UNIT count (non-BMP chars take two), not
    ``len(s)`` — the property round-trip test caught that one.
    """
    enc = s.encode("utf-16-le")
    return struct.pack("<HB", len(enc) // 2, 0x01) + enc


def write_xls(path: str, sheets: dict[str, list[list]]) -> None:
    """Write a minimal valid BIFF8 ``.xls``: str cells → SST+LABELSST,
    numbers → NUMBER, None → omitted. Round-trips through
    :func:`xls_rows`. Fixture-sized sheets only (single SST record —
    raises if the string table would need CONTINUE splits).
    """
    strings: list[str] = []
    sidx: dict[str, int] = {}
    total_refs = 0

    sheet_streams: list[bytes] = []
    for rows in sheets.values():
        body = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, str):
                    if v not in sidx:
                        sidx[v] = len(strings)
                        strings.append(v)
                    total_refs += 1
                    body += _rec(
                        _LABELSST, struct.pack("<HHHI", r, c, 0, sidx[v])
                    )
                else:
                    body += _rec(
                        _NUMBER, struct.pack("<HHHd", r, c, 0, float(v))
                    )
        body += _rec(_EOF, b"")
        sheet_streams.append(body)

    sst_body = struct.pack("<II", total_refs, len(strings)) + b"".join(
        _biff_string(s) for s in strings
    )
    if len(sst_body) > 8214:
        raise ValueError("fixture SST too large (would need CONTINUE records)")

    # globals substream with BOUNDSHEET offsets patched after layout
    names = list(sheets)
    globals_head = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    globals_head += _rec(_SST, sst_body)

    def bound(name: str, pos: int) -> bytes:
        nm = name.encode("utf-16-le")
        return _rec(
            _BOUNDSHEET,
            struct.pack("<IBB", pos, 0, 0)
            + struct.pack("<BB", len(nm) // 2, 1)
            + nm,
        )

    # two-pass: sizes of BOUNDSHEET records don't depend on offsets
    bs_size = sum(len(bound(n, 0)) for n in names)
    globals_len = len(globals_head) + bs_size + 4  # + EOF
    offsets = []
    at = globals_len
    for ss in sheet_streams:
        offsets.append(at)
        at += len(ss)
    stream = (
        globals_head
        + b"".join(bound(n, o) for n, o in zip(names, offsets))
        + _rec(_EOF, b"")
        + b"".join(sheet_streams)
    )
    # pad past the 4096-byte mini-stream cutoff: the container below
    # only implements the regular-FAT placement (trailing zeros parse
    # as harmless zero-length records)
    if len(stream) < 4096:
        stream += b"\x00" * (4096 - len(stream))
    _write_cfb(path, stream)


def _write_cfb(path: str, stream: bytes) -> None:
    """Minimal CFB: 1+ FAT sectors, 1 directory sector, stream sectors."""
    n_stream = (len(stream) + 511) // 512
    # solve for FAT count: fat entries cover fat + dir + stream sectors
    n_fat = 1
    while (n_fat + 1 + n_stream) > n_fat * 128:
        n_fat += 1
    if n_fat > 109:
        raise ValueError("fixture too large for header DIFAT")
    dir_sector_id = n_fat
    first_stream = n_fat + 1
    total = n_fat + 1 + n_stream

    fat = [_FATSECT] * n_fat + [_ENDOFCHAIN]  # FAT sectors + dir chain
    for i in range(n_stream - 1):
        fat.append(first_stream + i + 1)
    fat.append(_ENDOFCHAIN)
    fat += [_FREESECT] * (n_fat * 128 - len(fat))

    def dirent(name: str, obj_type: int, start: int, size: int) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        ent = nm + b"\x00" * (64 - len(nm))
        ent += struct.pack("<H", len(nm))
        ent += struct.pack("<BB", obj_type, 1)  # color: black
        left = right = _NOSTREAM
        child = 1 if obj_type == 5 else _NOSTREAM
        ent += struct.pack("<III", left, right, child)
        ent += b"\x00" * 16  # CLSID
        ent += b"\x00" * 4  # state bits
        ent += b"\x00" * 16  # timestamps
        ent += struct.pack("<IQ", start, size)
        return ent

    directory = dirent("Root Entry", 5, _ENDOFCHAIN, 0)
    directory += dirent("Workbook", 2, first_stream, len(stream))
    directory += b"\x00" * (512 - len(directory) % 512 if len(directory) % 512 else 0)

    header = _CFB_MAGIC + b"\x00" * 16
    header += struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3)
    header += struct.pack("<H", 0xFFFE)  # little-endian
    header += struct.pack("<HH", 9, 6)  # 512-byte sectors, 64-byte minis
    header += b"\x00" * 6
    header += struct.pack("<I", 0)  # directory sector count (v3: 0)
    header += struct.pack("<I", n_fat)
    header += struct.pack("<I", dir_sector_id)
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", 4096)  # mini cutoff
    header += struct.pack("<II", _ENDOFCHAIN, 0)  # miniFAT start/count
    header += struct.pack("<II", _ENDOFCHAIN, 0)  # DIFAT start/count
    difat = list(range(n_fat)) + [_FREESECT] * (109 - n_fat)
    header += struct.pack("<109I", *difat)
    assert len(header) == 512

    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(struct.pack(f"<{len(fat)}I", *fat))
        fh.write(directory)
        fh.write(stream)
        pad = n_stream * 512 - len(stream)
        if pad:
            fh.write(b"\x00" * pad)
