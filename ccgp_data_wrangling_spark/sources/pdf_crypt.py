"""PDF standard security handler (ISO 32000-1 §7.6) — RC4-40/128 and
AES-128 (/V 1–4, /R 2–4, /StdCF /AESV2) for the text extractor, plus
the primitives themselves, implemented from the public specs with
nothing beyond stdlib ``hashlib``:

* RC4 — the original stream cipher, §7.6.2 algorithm 1 key schedule;
* AES-128 — FIPS-197 forward and inverse cipher (the fixture writer
  encrypts, the extractor decrypts), CBC mode with the 16-byte IV
  prepended to the ciphertext and PKCS#7-style padding exactly as
  §7.6.2 prescribes for /AESV2;
* Algorithm 2 (file key from user password), Algorithm 3 (/O),
  Algorithms 4/5 (/U for R2 / R3+), Algorithm 1 (per-object key:
  MD5(key + objnum₃ + gen₂ [+ "sAlT"])).

Revision 5/6 (AES-256, /AESV3, PDF 2.0) is out of scope and the
caller raises ``NotImplementedError`` — consistent with the honest
capability gates elsewhere in the media layer.

Reference parity: cademirch/ccgp-data-wrangling has no document
layer; this extends the engine's PDF source (sources/pdf.py).
"""

from __future__ import annotations

import hashlib

__all__ = [
    "rc4",
    "aes128_cbc_encrypt",
    "aes128_cbc_decrypt",
    "PAD",
    "compute_file_key",
    "compute_o",
    "compute_u",
    "verify_user_password",
    "object_key",
    "decrypt_bytes",
    "encrypt_bytes",
]

# §7.6.3.3 — the 32-byte password padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197).  Tables are computed at import from the GF(2^8)
# definitions — no magic constant blobs to transcribe wrong.
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse via exponentiation tables, then the
    # FIPS-197 §5.1.1 affine transform
    sbox = [0] * 256
    inv = [0] * 256
    # brute-force inverses (256² ops once at import)
    for a in range(1, 256):
        for b in range(1, 256):
            if _gmul(a, b) == 1:
                inv[a] = b
                break
    for x in range(256):
        c = inv[x] if x else 0
        y = c
        for _ in range(4):
            c = ((c << 1) | (c >> 7)) & 0xFF
            y ^= c
        sbox[x] = y ^ 0x63
    isbox = [0] * 256
    for i, v in enumerate(sbox):
        isbox[v] = i
    return sbox, isbox


_SBOX, _ISBOX = _build_sbox()
_RCON = [0x01]
for _ in range(9):
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return w


def _add_round_key(state: list[int], w: list[list[int]], rnd: int) -> None:
    for c in range(4):
        for r in range(4):
            state[4 * c + r] ^= w[4 * rnd + c][r]


def _encrypt_block(block: bytes, w: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, w, 0)
    for rnd in range(1, 11):
        s = [_SBOX[b] for b in s]
        # ShiftRows (state stored column-major: s[4c+r])
        s = [s[(4 * ((c + r) % 4)) + r] for c in range(4) for r in range(4)]
        # re-index: build row-shifted state column by column
        if rnd < 10:
            t = [0] * 16
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t[4 * c + 0] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                t[4 * c + 1] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                t[4 * c + 2] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                t[4 * c + 3] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
            s = t
        _add_round_key(s, w, rnd)
    return bytes(s)


def _decrypt_block(block: bytes, w: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, w, 10)
    for rnd in range(9, -1, -1):
        # InvShiftRows
        s = [s[(4 * ((c - r) % 4)) + r] for c in range(4) for r in range(4)]
        s = [_ISBOX[b] for b in s]
        _add_round_key(s, w, rnd)
        if rnd > 0:
            t = [0] * 16
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t[4 * c + 0] = (
                    _gmul(a[0], 14) ^ _gmul(a[1], 11)
                    ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
                )
                t[4 * c + 1] = (
                    _gmul(a[0], 9) ^ _gmul(a[1], 14)
                    ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
                )
                t[4 * c + 2] = (
                    _gmul(a[0], 13) ^ _gmul(a[1], 9)
                    ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
                )
                t[4 * c + 3] = (
                    _gmul(a[0], 11) ^ _gmul(a[1], 13)
                    ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
                )
            s = t
    return bytes(s)


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with PKCS#7 padding; returns iv + ciphertext (the
    §7.6.2 /AESV2 wire format)."""
    if len(key) != 16 or len(iv) != 16:
        raise ValueError("AES-128 needs 16-byte key and IV")
    w = _expand_key(key)
    padn = 16 - len(data) % 16
    data = data + bytes([padn]) * padn
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, w)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes128_cbc_encrypt`: data = iv + ciphertext,
    PKCS#7 padding stripped (and validated — garbage padding means a
    wrong key, which must not pass silently)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC payload must be iv + k·16 bytes")
    w = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, w), prev))
        prev = blk
    padn = out[-1]
    if not 1 <= padn <= 16 or out[-padn:] != bytes([padn]) * padn:
        raise ValueError("bad AES padding (wrong key?)")
    return bytes(out[:-padn])


# ---------------------------------------------------------------------------
# Standard security handler algorithms (§7.6.3)
# ---------------------------------------------------------------------------


def _padded(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_file_key(
    password: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    *,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (user) password."""
    n = length_bits // 8
    h = hashlib.md5(_padded(password))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(
    owner_pw: bytes, user_pw: bytes, r: int, length_bits: int
) -> bytes:
    """Algorithm 3: the /O entry (owner password digest)."""
    n = length_bits // 8
    key = hashlib.md5(_padded(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3+): the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    u = rc4(key, digest)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding


def verify_user_password(
    password: bytes,
    o: bytes,
    u: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    *,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6: recompute /U from the candidate password; on match
    return the file key, else None. R3+ compares the first 16 bytes
    only (the rest is arbitrary padding by spec)."""
    key = compute_file_key(
        password, o, p, id0, r, length_bits,
        encrypt_metadata=encrypt_metadata,
    )
    expect = compute_u(key, id0, r)
    ok = expect[:16] == u[:16] if r >= 3 else expect == u[:32]
    return key if ok else None


def object_key(file_key: bytes, num: int, gen: int, *, aes: bool) -> bytes:
    """Algorithm 1: the per-object key — MD5 over the file key, the
    low 3 bytes of the object number, the low 2 bytes of the
    generation, plus the "sAlT" constant for AES."""
    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    )
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_bytes(data: bytes, key: bytes, *, aes: bool) -> bytes:
    if aes:
        return aes128_cbc_decrypt(key, data)
    return rc4(key, data)


def encrypt_bytes(data: bytes, key: bytes, *, aes: bool, iv: bytes = b"") -> bytes:
    if aes:
        return aes128_cbc_encrypt(key, iv or bytes(16), data)
    return rc4(key, data)
