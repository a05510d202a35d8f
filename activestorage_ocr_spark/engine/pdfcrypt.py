"""Standard security handler (PDF 32000-1 §7.6) — RC4-40/128 (V1/V2,
R2/R3) and AES-128-CBC (V4/R4, /AESV2) for the EMPTY-user-password case:
owner-locked PDFs that every viewer opens without prompting, a large
fraction of real crawled PDFs. User-password-protected documents
authenticate false and quarantine with a named error upstream.

Both directions ship (the builder encrypts fixtures, the parser decrypts),
so coverage needs no external tool. AES is implemented from FIPS-197 with
a COMPUTED S-box — multiplicative inverse in GF(2^8) plus the affine
transform — so no lookup-table transcription is involved; the only
memorized constant in this module is the spec's famous 32-byte password
pad. RC4 is the standard KSA/PRGA.
"""

from __future__ import annotations

import hashlib
import struct

#: §7.6.3.3 password padding constant
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
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
# AES-128 (FIPS-197) with a computed S-box
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse via x^254 (Fermat in GF(2^8)), then the affine
    # transform b ^ rotl(b,1..4) ^ 0x63 — the spec's construction, computed
    sbox = bytearray(256)
    for x in range(256):
        inv = 0
        if x:
            inv = x
            for _ in range(6):  # x^(2^k) chain -> x^254
                inv = _gf_mul(_gf_mul(inv, inv), x)
            inv = _gf_mul(inv, inv)
        b = inv
        s = b
        for r in range(1, 5):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[x] = s ^ 0x63
    inv_sbox = bytearray(256)
    for x, y in enumerate(sbox):
        inv_sbox[y] = x
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()


def _expand_key(key: bytes) -> list[list[int]]:
    assert len(key) == 16
    words = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(11)]


def _add_rk(st: list[int], rk: list[int]) -> None:
    for i in range(16):
        st[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    st = list(block)
    _add_rk(st, rks[0])
    for rnd in range(1, 11):
        st = [_SBOX[b] for b in st]
        st = [st[_SHIFT[i]] for i in range(16)]
        if rnd < 10:
            ns = [0] * 16
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                ns[4 * c + 0] = _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3]
                ns[4 * c + 1] = a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3]
                ns[4 * c + 2] = a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3)
                ns[4 * c + 3] = _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2)
            st = ns
        _add_rk(st, rks[rnd])
    return bytes(st)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    st = list(block)
    _add_rk(st, rks[10])
    for rnd in range(9, -1, -1):
        st = [st[_INV_SHIFT[i]] for i in range(16)]
        st = [_INV_SBOX[b] for b in st]
        _add_rk(st, rks[rnd])
        if rnd > 0:
            ns = [0] * 16
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                ns[4 * c + 0] = (
                    _gf_mul(a[0], 14) ^ _gf_mul(a[1], 11)
                    ^ _gf_mul(a[2], 13) ^ _gf_mul(a[3], 9)
                )
                ns[4 * c + 1] = (
                    _gf_mul(a[0], 9) ^ _gf_mul(a[1], 14)
                    ^ _gf_mul(a[2], 11) ^ _gf_mul(a[3], 13)
                )
                ns[4 * c + 2] = (
                    _gf_mul(a[0], 13) ^ _gf_mul(a[1], 9)
                    ^ _gf_mul(a[2], 14) ^ _gf_mul(a[3], 11)
                )
                ns[4 * c + 3] = (
                    _gf_mul(a[0], 11) ^ _gf_mul(a[1], 13)
                    ^ _gf_mul(a[2], 9) ^ _gf_mul(a[3], 14)
                )
            st = ns
    return bytes(st)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rks = _expand_key(key)
    padlen = 16 - (len(data) % 16)
    data = data + bytes([padlen]) * padlen
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return iv + bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    rks = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    padlen = out[-1]
    if not (1 <= padlen <= 16):
        raise ValueError("bad AES padding")
    return bytes(out[:-padlen])


# ---------------------------------------------------------------------------
# standard security handler algorithms (§7.6.3)
# ---------------------------------------------------------------------------


def _padded(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def derive_key(
    o: bytes, p: int, id0: bytes, r: int, nbytes: int, password: bytes = b""
) -> bytes:
    """Algorithm 2: the file encryption key from a (user) password."""
    h = hashlib.md5(
        _padded(password) + o[:32] + struct.pack("<i", p) + id0
    )
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, nbytes: int) -> bytes:
    """Algorithm 3: the /O value."""
    h = hashlib.md5(_padded(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4key = h[:nbytes]
    o = rc4(rc4key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U value for the given file key."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def authenticate_empty_user(
    o: bytes, u: bytes, p: int, id0: bytes, r: int, nbytes: int
) -> bytes | None:
    """Empty-user-password check (Algorithm 6): returns the file key when
    the document opens without a password, else None."""
    key = derive_key(o, p, id0, r, nbytes)
    want = compute_u(key, id0, r)
    got_ok = (u[:16] == want[:16]) if r >= 3 else (u[:32] == want[:32])
    return key if got_ok else None


def object_key(key: bytes, oid: int, gen: int, aes: bool) -> bytes:
    """Per-object key (Algorithm 1)."""
    h = hashlib.md5(
        key
        + struct.pack("<I", oid)[:3]
        + struct.pack("<I", gen)[:2]
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def decrypt_bytes(data: bytes, key: bytes, oid: int, gen: int, aes: bool) -> bytes:
    ok = object_key(key, oid, gen, aes)
    if aes:
        return aes_cbc_decrypt(ok, data)
    return rc4(ok, data)


def encrypt_bytes(data: bytes, key: bytes, oid: int, gen: int, aes: bool) -> bytes:
    ok = object_key(key, oid, gen, aes)
    if aes:
        # deterministic IV from the object identity: fixtures must be
        # reproducible bit-for-bit (a production writer uses random IVs)
        iv = hashlib.md5(b"iv" + ok + struct.pack("<I", oid)).digest()
        return aes_cbc_encrypt(ok, iv, data)
    return rc4(ok, data)
