"""Standard security handler (PDF 32000-1 §7.6 + ISO 32000-2 §7.6.4) —
RC4-40/128 (V1/V2, R2/R3), AES-128-CBC (V4/R4, /AESV2), and AES-256-CBC
(V5, R5 legacy + R6 with the hardened Algorithm-2.B KDF) for the
EMPTY-user-password case:
owner-locked PDFs that every viewer opens without prompting, a large
fraction of real crawled PDFs. User-password-protected documents
authenticate false and quarantine with a named error upstream.

Both directions ship (the builder encrypts fixtures, the parser decrypts),
so coverage needs no external tool. AES (128 and 256) is implemented from
FIPS-197 with a COMPUTED S-box — multiplicative inverse in GF(2^8) plus
the affine transform, T-tables derived from it — so no lookup-table
transcription is involved, and both key sizes are pinned against the
official appendix-C known-answer vectors; the only memorized constant in
this module is the spec's famous 32-byte password pad. RC4 is the
standard KSA/PRGA. An R6 KDF detail divergence would fail CLOSED (the
empty-password authentication misses and the document quarantines as
password-protected) — never silently wrong output.
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
    """AES key schedule for 128- or 256-bit keys (FIPS-197 §5.2)."""
    nk = len(key) // 4
    assert nk in (4, 8)
    rounds = 10 if nk == 4 else 14
    words = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    rcon = 1
    for i in range(nk, 4 * (rounds + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(rounds + 1)]


def _add_rk(st: list[int], rk: list[int]) -> None:
    for i in range(16):
        st[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _build_ttables():
    """Classical T-table AES: one 32-bit lookup per state byte per round
    (the R6 KDF runs thousands of blocks through CBC — byte-wise
    MixColumns is ~20x too slow in Python)."""
    te = [[0] * 256 for _ in range(4)]
    td = [[0] * 256 for _ in range(4)]
    for x in range(256):
        sx = _SBOX[x]
        w = (
            (_gf_mul(sx, 2) << 24) | (sx << 16) | (sx << 8) | _gf_mul(sx, 3)
        )
        for i in range(4):
            te[i][x] = ((w >> (8 * i)) | (w << (32 - 8 * i))) & 0xFFFFFFFF
        ix = _INV_SBOX[x]
        wd = (
            (_gf_mul(ix, 14) << 24) | (_gf_mul(ix, 9) << 16)
            | (_gf_mul(ix, 13) << 8) | _gf_mul(ix, 11)
        )
        for i in range(4):
            td[i][x] = ((wd >> (8 * i)) | (wd << (32 - 8 * i))) & 0xFFFFFFFF
    return te, td


(_TE, _TD) = _build_ttables()


def _rk_words(rks: list[list[int]]) -> list[list[int]]:
    return [
        [
            (rk[4 * c] << 24) | (rk[4 * c + 1] << 16) | (rk[4 * c + 2] << 8)
            | rk[4 * c + 3]
            for c in range(4)
        ]
        for rk in rks
    ]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    return _encrypt_block_w(block, _rk_words(rks))


def _encrypt_block_w(block: bytes, rw: list[list[int]]) -> bytes:
    te0, te1, te2, te3 = _TE
    nr = len(rw) - 1
    s0 = int.from_bytes(block[0:4], "big") ^ rw[0][0]
    s1 = int.from_bytes(block[4:8], "big") ^ rw[0][1]
    s2 = int.from_bytes(block[8:12], "big") ^ rw[0][2]
    s3 = int.from_bytes(block[12:16], "big") ^ rw[0][3]
    for rnd in range(1, nr):
        k = rw[rnd]
        t0 = (
            te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF] ^ te2[(s2 >> 8) & 0xFF]
            ^ te3[s3 & 0xFF] ^ k[0]
        )
        t1 = (
            te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF] ^ te2[(s3 >> 8) & 0xFF]
            ^ te3[s0 & 0xFF] ^ k[1]
        )
        t2 = (
            te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF] ^ te2[(s0 >> 8) & 0xFF]
            ^ te3[s1 & 0xFF] ^ k[2]
        )
        t3 = (
            te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF] ^ te2[(s1 >> 8) & 0xFF]
            ^ te3[s2 & 0xFF] ^ k[3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = rw[nr]
    sb = _SBOX
    out = bytearray(16)
    for c, (a, b, cc, d) in enumerate(
        ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
    ):
        w = (
            (sb[a >> 24] << 24) | (sb[(b >> 16) & 0xFF] << 16)
            | (sb[(cc >> 8) & 0xFF] << 8) | sb[d & 0xFF]
        ) ^ k[c]
        out[4 * c : 4 * c + 4] = w.to_bytes(4, "big")
    return bytes(out)


def _inv_schedule(rw: list[list[int]]) -> list[list[int]]:
    """Equivalent-inverse-cipher round keys (InvMixColumns on the middle
    rounds) — prepared ONCE per CBC call, not per block."""
    nr = len(rw) - 1
    ik = [list(rw[nr])]
    for rnd in range(nr - 1, 0, -1):
        row = []
        for w in rw[rnd]:
            b = w.to_bytes(4, "big")
            m = (
                (
                    (_gf_mul(b[0], 14) ^ _gf_mul(b[1], 11)
                     ^ _gf_mul(b[2], 13) ^ _gf_mul(b[3], 9)) << 24
                )
                | (
                    (_gf_mul(b[0], 9) ^ _gf_mul(b[1], 14)
                     ^ _gf_mul(b[2], 11) ^ _gf_mul(b[3], 13)) << 16
                )
                | (
                    (_gf_mul(b[0], 13) ^ _gf_mul(b[1], 9)
                     ^ _gf_mul(b[2], 14) ^ _gf_mul(b[3], 11)) << 8
                )
                | (
                    _gf_mul(b[0], 11) ^ _gf_mul(b[1], 13)
                    ^ _gf_mul(b[2], 9) ^ _gf_mul(b[3], 14)
                )
            )
            row.append(m)
        ik.append(row)
    ik.append(list(rw[0]))
    return ik


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    return _decrypt_block_w(block, _inv_schedule(_rk_words(rks)))


def _decrypt_block_w(block: bytes, ik: list[list[int]]) -> bytes:
    td0, td1, td2, td3 = _TD
    sb = _INV_SBOX
    nr = len(ik) - 1
    s0 = int.from_bytes(block[0:4], "big") ^ ik[0][0]
    s1 = int.from_bytes(block[4:8], "big") ^ ik[0][1]
    s2 = int.from_bytes(block[8:12], "big") ^ ik[0][2]
    s3 = int.from_bytes(block[12:16], "big") ^ ik[0][3]
    for rnd in range(1, nr):
        k = ik[rnd]
        t0 = (
            td0[s0 >> 24] ^ td1[(s3 >> 16) & 0xFF] ^ td2[(s2 >> 8) & 0xFF]
            ^ td3[s1 & 0xFF] ^ k[0]
        )
        t1 = (
            td0[s1 >> 24] ^ td1[(s0 >> 16) & 0xFF] ^ td2[(s3 >> 8) & 0xFF]
            ^ td3[s2 & 0xFF] ^ k[1]
        )
        t2 = (
            td0[s2 >> 24] ^ td1[(s1 >> 16) & 0xFF] ^ td2[(s0 >> 8) & 0xFF]
            ^ td3[s3 & 0xFF] ^ k[2]
        )
        t3 = (
            td0[s3 >> 24] ^ td1[(s2 >> 16) & 0xFF] ^ td2[(s1 >> 8) & 0xFF]
            ^ td3[s0 & 0xFF] ^ k[3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = ik[nr]
    out = bytearray(16)
    for c, (a, b, cc, d) in enumerate(
        ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
    ):
        w = (
            (sb[a >> 24] << 24) | (sb[(b >> 16) & 0xFF] << 16)
            | (sb[(cc >> 8) & 0xFF] << 8) | sb[d & 0xFF]
        ) ^ k[c]
        out[4 * c : 4 * c + 4] = w.to_bytes(4, "big")
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rw = _rk_words(_expand_key(key))
    padlen = 16 - (len(data) % 16)
    data = data + bytes([padlen]) * padlen
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block_w(blk, rw)
        out += prev
    return iv + bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    ik = _inv_schedule(_rk_words(_expand_key(key)))
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block_w(blk, ik), prev))
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
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    nbytes: int,
    password: bytes = b"",
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a (user) password. For
    R >= 4 with /EncryptMetadata false, 0xFFFFFFFF is appended to the MD5
    input (32000-1 §7.6.3.3 step f) — a common producer setting; without
    it such documents fail empty-password auth and wrongly quarantine."""
    h = hashlib.md5(
        _padded(password)
        + o[:32]
        + struct.pack("<i", p)
        + id0
        + (b"\xff\xff\xff\xff" if r >= 4 and not encrypt_metadata else b"")
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
    o: bytes,
    u: bytes,
    p: int,
    id0: bytes,
    r: int,
    nbytes: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Empty-user-password check (Algorithm 6): returns the file key when
    the document opens without a password, else None."""
    key = derive_key(o, p, id0, r, nbytes, encrypt_metadata=encrypt_metadata)
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
    if aes and len(key) == 32:
        # AESV3 (ISO 32000-2 §7.6.3.3): the 32-byte file key is used
        # DIRECTLY — Algorithm 1's per-object MD5 derivation applies only
        # to the V<5 handlers. Deriving here would decrypt our own
        # fixtures fine but fail every real-world AES-256 PDF.
        return aes_cbc_decrypt(key, data)
    ok = object_key(key, oid, gen, aes)
    if aes:
        return aes_cbc_decrypt(ok, data)
    return rc4(ok, data)


def encrypt_bytes(data: bytes, key: bytes, oid: int, gen: int, aes: bool) -> bytes:
    if aes and len(key) == 32:
        # AESV3: raw file key, mirroring decrypt_bytes
        iv = hashlib.md5(b"iv" + key + struct.pack("<I", oid)).digest()
        return aes_cbc_encrypt(key, iv, data)
    ok = object_key(key, oid, gen, aes)
    if aes:
        # deterministic IV from the object identity: fixtures must be
        # reproducible bit-for-bit (a production writer uses random IVs)
        iv = hashlib.md5(b"iv" + ok + struct.pack("<I", oid)).digest()
        return aes_cbc_encrypt(ok, iv, data)
    return rc4(ok, data)


# ---------------------------------------------------------------------------
# AES-256 handler (PDF 2.0 / ISO 32000-2 §7.6.4: V5, R5 legacy + R6)
# ---------------------------------------------------------------------------


def _aes_cbc_nopad(key: bytes, iv: bytes, data: bytes, decrypt: bool) -> bytes:
    if len(data) % 16:
        raise ValueError("nopad CBC needs 16-byte multiples")
    rw = _rk_words(_expand_key(key))
    ik = _inv_schedule(rw) if decrypt else None
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        if decrypt:
            out += bytes(a ^ b for a, b in zip(_decrypt_block_w(blk, ik), prev))
            prev = blk
        else:
            prev = _encrypt_block_w(bytes(a ^ b for a, b in zip(blk, prev)), rw)
            out += prev
    return bytes(out)


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the hardened R6 password hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_nopad(k[:16], k[16:32], k1, decrypt=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _r5_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    return hashlib.sha256(password + salt + udata).digest()


def r6_make(file_key: bytes, r: int = 6, seed: bytes = b"fixture") -> dict:
    """Builder side: /U //UE //O //OE for EMPTY user and owner passwords
    (deterministic salts so fixtures reproduce bit-for-bit)."""
    assert len(file_key) == 32
    h = hash_2b if r == 6 else _r5_hash
    vs = hashlib.md5(seed + b"vs").digest()[:8]
    ks = hashlib.md5(seed + b"ks").digest()[:8]
    u = h(b"", vs) + vs + ks
    ue = _aes_cbc_nopad(h(b"", ks), bytes(16), file_key, decrypt=False)
    ovs = hashlib.md5(seed + b"ovs").digest()[:8]
    oks = hashlib.md5(seed + b"oks").digest()[:8]
    o = h(b"", ovs, u[:48]) + ovs + oks
    oe = _aes_cbc_nopad(h(b"", oks, u[:48]), bytes(16), file_key, decrypt=False)
    return {"U": u, "UE": ue, "O": o, "OE": oe}


def r6_authenticate_empty(
    u: bytes, ue: bytes, o: bytes, oe: bytes, r: int = 6
) -> bytes | None:
    """Empty-password authentication for V5 (R5 legacy or R6); returns the
    32-byte file key or None."""
    if len(u) < 48 or len(o) < 48 or len(ue) < 32 or len(oe) < 32:
        return None
    h = hash_2b if r == 6 else _r5_hash
    if h(b"", u[32:40]) == u[:32]:
        ikey = h(b"", u[40:48])
        return _aes_cbc_nopad(ikey, bytes(16), ue[:32], decrypt=True)
    if h(b"", o[32:40], u[:48]) == o[:32]:
        ikey = h(b"", o[40:48], u[:48])
        return _aes_cbc_nopad(ikey, bytes(16), oe[:32], decrypt=True)
    return None
