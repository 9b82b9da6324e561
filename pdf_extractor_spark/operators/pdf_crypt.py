"""Standard-security-handler decryption for the PDF tokenizer.

Implements the overwhelmingly common web case (round-2 verdict item
#3): ISO 32000-1 §7.6.3 standard security handler, revisions 2-4 —
RC4-40, RC4-128 and AES-128-CBC (``/V 1|2|4``, ``/CFM /V2|/AESV2``)
with an EMPTY user password. Documents protected by a real (non-empty)
user password stay undecryptable and keep the explicit ``encryption``
error the round-2 tokenizer already raised (reference behavior: its
``error_handler.py`` taxonomy also only *diagnoses* encryption).

Everything here is deterministic pure Python over public algorithms:
RC4 (the well-known stream cipher) and AES-128 (FIPS-197, tables
generated at import from the canonical GF(2^8) construction) — no
third-party crypto dependency, which also keeps the fixture WRITER
(:mod:`.pdf_generator`) able to produce encrypted fixtures that
round-trip byte-exactly.

The module is kernel-layer: no Spark imports (SURVEY.md §7.0).
"""

from __future__ import annotations

import functools
import hashlib
import re
import struct
from dataclasses import dataclass

# ISO 32000-1 Table 21 padding string (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# ------------------------------------------------------------------ RC4

def rc4(key: bytes, data: bytes) -> bytes:
    """Classic RC4 stream cipher (symmetric: encrypt == decrypt)."""
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


# -------------------------------------------------------------- AES-128
#
# FIPS-197 tables derived at import time from the canonical definition
# (GF(2^8) inverse + affine map) — no magic constant blobs to audit.

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
    # multiplicative inverse via exp/log tables over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)          # multiply by 3 = x ^ xtime(x)
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = [0] * 256
    inv_sbox = [0] * 256
    for c in range(256):
        inv = exp[255 - log[c]] if c else 0
        # affine transformation
        s = inv
        r = inv
        for _ in range(4):
            r = ((r << 1) | (r >> 7)) & 0xFF
            s ^= r
        s ^= 0x63
        sbox[c] = s
        inv_sbox[s] = c
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [1]
for _ in range(9):
    _RCON.append(_xtime(_RCON[-1]))

# fixed-multiplier GF(2^8) lookup tables: MixColumns uses {2,3}, the
# inverse {9,11,13,14} — table lookups replace the per-call bit loop
# (the per-block hot path; measured ~10× on the encrypted fixtures)
_MUL = {
    m: [_gmul(x, m) for x in range(256)] for m in (2, 3, 9, 11, 13, 14)
}
_M2, _M3 = _MUL[2], _MUL[3]
_M9, _M11, _M13, _M14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]


def _key_expansion(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2 key schedule for 128/192/256-bit keys →
    Nr+1 round keys (each 16 ints), Nr = Nk+6 (10/12/14). The
    Nk>6 extra SubWord on the i%Nk==4 column is the one rule
    AES-256 adds over AES-128."""
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


_ROW_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_ROW_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    st = list(block)
    _add_round_key(st, rks[0])
    for rnd in range(1, nr + 1):
        st = [_SBOX[b] for b in st]                      # SubBytes
        st = [st[_ROW_SHIFT[i]] for i in range(16)]      # ShiftRows
        if rnd != nr:                                    # MixColumns
            ns = [0] * 16
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                ns[4 * c + 0] = _M2[a[0]] ^ _M3[a[1]] ^ a[2] ^ a[3]
                ns[4 * c + 1] = a[0] ^ _M2[a[1]] ^ _M3[a[2]] ^ a[3]
                ns[4 * c + 2] = a[0] ^ a[1] ^ _M2[a[2]] ^ _M3[a[3]]
                ns[4 * c + 3] = _M3[a[0]] ^ a[1] ^ a[2] ^ _M2[a[3]]
            st = ns
        _add_round_key(st, rks[rnd])
    return bytes(st)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    nr = len(rks) - 1
    st = list(block)
    _add_round_key(st, rks[nr])
    for rnd in range(nr - 1, -1, -1):
        st = [st[_ROW_INV_SHIFT[i]] for i in range(16)]  # InvShiftRows
        st = [_INV_SBOX[b] for b in st]                  # InvSubBytes
        _add_round_key(st, rks[rnd])
        if rnd != 0:                                     # InvMixColumns
            ns = [0] * 16
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                ns[4 * c + 0] = (_M14[a[0]] ^ _M11[a[1]]
                                 ^ _M13[a[2]] ^ _M9[a[3]])
                ns[4 * c + 1] = (_M9[a[0]] ^ _M14[a[1]]
                                 ^ _M11[a[2]] ^ _M13[a[3]])
                ns[4 * c + 2] = (_M13[a[0]] ^ _M9[a[1]]
                                 ^ _M14[a[2]] ^ _M11[a[3]])
                ns[4 * c + 3] = (_M11[a[0]] ^ _M13[a[1]]
                                 ^ _M9[a[2]] ^ _M14[a[3]])
            st = ns
    return bytes(st)


# Compiled-AES fast path: `cryptography` ships in this environment;
# the from-scratch FIPS-197 implementation above stays the REFERENCE
# (pinned by the published Appendix B/C vectors and by an equality
# test against this path) and the fallback when the wheel is absent.
# The R6 hardened hash runs ~8k CBC block operations per DOCUMENT —
# pure Python pays ~1.2 s/doc there; the compiled path is ~1000×.
try:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )

    def _cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
        enc = _Cipher(
            _algorithms.AES(key), _modes.CBC(iv)
        ).encryptor()
        return enc.update(data) + enc.finalize()

    def _cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
        dec = _Cipher(
            _algorithms.AES(key), _modes.CBC(iv)
        ).decryptor()
        return dec.update(data) + dec.finalize()

except ImportError:  # pragma: no cover - environment without wheel
    def _cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
        rks = _key_expansion(key)
        out = bytearray()
        prev = iv
        for off in range(0, len(data), 16):
            block = bytes(
                a ^ b for a, b in zip(data[off : off + 16], prev)
            )
            prev = _encrypt_block(block, rks)
            out += prev
        return bytes(out)

    def _cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
        rks = _key_expansion(key)
        out = bytearray()
        prev = iv
        for off in range(0, len(data), 16):
            block = data[off : off + 16]
            plain = _decrypt_block(block, rks)
            out += bytes(p ^ v for p, v in zip(plain, prev))
            prev = block
        return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-CBC per ISO 32000 §7.6.2 (key length 16 or 32 — AESV2 /
    AESV3 share the payload format): first 16 bytes of ``data`` are
    the IV; PKCS#5 padding stripped."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload length")
    out = _cbc_decrypt_raw(key, data[:16], data[16:])
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad PKCS#5 padding")
    return bytes(out[:-pad])


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC with PKCS#5 padding (fixture writer; ``iv`` is
    caller-fixed for determinism)."""
    pad = 16 - len(data) % 16
    return iv + _cbc_encrypt_raw(key, iv, data + bytes([pad]) * pad)


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw AES-CBC, no padding, IV not emitted — the primitive the
    V5 key-wrap (/UE, /OE) and the Algorithm 2.B hash loop use.
    ``data`` must be a multiple of 16."""
    return _cbc_encrypt_raw(key, iv, data)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt_nopad` (the /UE, /OE unwrap
    direction — ISO 32000-2 Algorithm 2.A steps e/f use a zero IV)."""
    return _cbc_decrypt_raw(key, iv, data)


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block ECB (the /Perms field is a single AES-256-ECB
    block — ISO 32000-2 Algorithm 10). One block with a zero IV is
    ECB by definition (nothing to chain)."""
    return _cbc_encrypt_raw(key, b"\x00" * 16, block)


def aes_ecb_decrypt_block(key: bytes, block: bytes) -> bytes:
    return _cbc_decrypt_raw(key, b"\x00" * 16, block)


# ------------------------------------------- standard security handler

@dataclass(frozen=True)
class StdSecurity:
    v: int                 # /V 1, 2, 4 or 5
    r: int                 # /R 2, 3, 4 (legacy) or 5, 6 (AES-256)
    length: int            # key length in BITS (40..256)
    p: int                 # /P permissions (signed 32-bit)
    o: bytes               # /O 32 bytes (V≤4) or 48 bytes (V5)
    u: bytes               # /U 32 bytes (V≤4) or 48 bytes (V5)
    id0: bytes             # first file identifier string
    aes: bool              # /CFM /AESV2 or /AESV3 (else RC4)
    encrypt_metadata: bool = True
    ue: bytes = b""        # /UE 32 bytes (V5: wrapped file key)
    oe: bytes = b""        # /OE 32 bytes (V5)
    perms: bytes = b""     # /Perms 16 bytes (V5)


_STR_RE = rb"(?:<([0-9A-Fa-f\s]*)>|\(((?:[^()\\]|\\.)*)\))"


def _decode_pdfstr(hexpart: bytes | None, litpart: bytes | None) -> bytes:
    if hexpart is not None:
        h = re.sub(rb"\s", b"", hexpart)
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))
    out = bytearray()
    i = 0
    lit = litpart or b""
    while i < len(lit):
        c = lit[i]
        if c == 0x5C and i + 1 < len(lit):  # backslash escape
            n = lit[i + 1 : i + 2]
            table = {b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                     b"(": 40, b")": 41, b"\\": 92}
            if n in table:
                out.append(table[n])
                i += 2
                continue
            if n.isdigit():
                j = i + 1
                while j < len(lit) and j < i + 4 and lit[j : j + 1].isdigit():
                    j += 1
                out.append(int(lit[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _dict_str(body: bytes, key: bytes) -> bytes | None:
    m = re.search(rb"/" + key + rb"\s*" + _STR_RE, body)
    if not m:
        return None
    return _decode_pdfstr(m.group(1), m.group(2))


def parse_encrypt_dict(enc_body: bytes, id0: bytes) -> StdSecurity | None:
    """Parse a ``/Filter /Standard`` encryption dictionary; None when
    the handler or algorithm is outside the supported set (crypt
    filters other than Identity/V2/AESV2/AESV3, custom handlers).
    V5 (AES-256, PDF 2.0 / Adobe ext. level 3) additionally carries
    48-byte /O and /U plus the wrapped-key fields /UE /OE /Perms."""
    if b"/Standard" not in enc_body:
        return None
    vm = re.search(rb"/V\s+(\d+)", enc_body)
    rm = re.search(rb"/R\s+(\d+)", enc_body)
    pm = re.search(rb"/P\s+(-?\d+)", enc_body)
    o = _dict_str(enc_body, b"O")
    u = _dict_str(enc_body, b"U")
    if not (vm and rm and pm and o and u):
        return None
    v, r = int(vm.group(1)), int(rm.group(1))
    if v not in (1, 2, 4, 5) or r not in (2, 3, 4, 5, 6):
        return None
    lm = re.search(rb"/Length\s+(\d+)", enc_body)
    length = int(lm.group(1)) if lm else 40
    aes = False
    em = re.search(rb"/EncryptMetadata\s+(true|false)", enc_body)
    encrypt_metadata = em is None or em.group(1) == b"true"
    if v == 4:
        cfm = re.search(rb"/CFM\s*/(\w+)", enc_body)
        if not cfm or cfm.group(1) not in (b"V2", b"AESV2"):
            return None
        aes = cfm.group(1) == b"AESV2"
        if aes:
            length = 128
    if v == 5:
        if r not in (5, 6):
            return None
        cfm = re.search(rb"/CFM\s*/(\w+)", enc_body)
        if not cfm or cfm.group(1) != b"AESV3":
            return None
        ue = _dict_str(enc_body, b"UE")
        oe = _dict_str(enc_body, b"OE")
        if ue is None or oe is None or len(ue) < 32 or len(oe) < 32:
            return None
        perms = _dict_str(enc_body, b"Perms") or b""
        return StdSecurity(
            v=5, r=r, length=256, p=int(pm.group(1)),
            o=o[:48].ljust(48, b"\x00"), u=u[:48].ljust(48, b"\x00"),
            id0=id0, aes=True, encrypt_metadata=encrypt_metadata,
            ue=ue[:32], oe=oe[:32], perms=perms[:16],
        )
    return StdSecurity(
        v=v, r=r, length=length, p=int(pm.group(1)),
        o=o[:32].ljust(32, b"\x00"), u=u[:32].ljust(32, b"\x00"),
        id0=id0, aes=aes, encrypt_metadata=encrypt_metadata,
    )


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_file_key(sec: StdSecurity, user_pw: bytes = b"") -> bytes:
    """Algorithm 2: padded password + O + P(le int32) + ID0
    [+ ffffffff when R4 and metadata unencrypted] → md5, then for R≥3
    fifty md5 rounds over the first n bytes."""
    n = sec.length // 8
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(sec.o)
    # /P is a 32-bit flag word; writers emit it signed OR unsigned
    # (e.g. 4294963392 == -3904). Pack the low 32 bits unsigned —
    # byte-identical for negative ints, no struct.error for unsigned.
    h.update(struct.pack("<I", sec.p & 0xFFFFFFFF))
    h.update(sec.id0)
    if sec.r >= 4 and not sec.encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if sec.r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o_entry(
    owner_pw: bytes, user_pw: bytes, r: int, length: int
) -> bytes:
    """Algorithm 3: the /O value (owner password hash)."""
    n = length // 8
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    out = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def compute_u_entry(sec_key: bytes, r: int, id0: bytes) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R≥3): the /U value."""
    if r == 2:
        return rc4(sec_key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    out = rc4(sec_key, h)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in sec_key), out)
    return out + b"\x00" * 16  # 16 bytes of arbitrary padding


def verify_user_password(sec: StdSecurity, key: bytes) -> bool:
    """Algorithm 6: does ``key`` (derived from the candidate password)
    reproduce /U? R≥3 compares only the first 16 bytes."""
    expect = compute_u_entry(key, sec.r, sec.id0)
    if sec.r == 2:
        return expect == sec.u
    return expect[:16] == sec.u[:16]


# --------------------------------------- V5 / AES-256 (ISO 32000-2)
#
# Public algorithms: 2.A (retrieve file key), 2.B (the R6 hardened
# password hash), 8/9 (writer side /U,/UE /O,/OE), 10 (/Perms).
# Passwords are UTF-8, truncated to 127 bytes; the empty user
# password — the owner-restricted-but-readable web case this
# extractor supports — needs no SASLprep.


def hash_2b(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """ISO 32000-2 Algorithm 2.B. R5 (the withdrawn Adobe ext. 3
    scheme) is a single SHA-256; R6 iterates an AES-128-CBC /
    SHA-{256,384,512} loop at least 64 rounds, stopping when the last
    byte of the final encryption ≤ round-64 (data-dependent work
    factor — the anti-brute-force hardening)."""
    password = password[:127]
    k = hashlib.sha256(password + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def verify_user_password_v5(sec: StdSecurity, user_pw: bytes = b"") -> bool:
    """Algorithm 11: hash(pw, validation salt = U[32:40]) == U[:32]."""
    return (
        hash_2b(user_pw, sec.u[32:40], b"", sec.r) == sec.u[:32]
    )


@functools.lru_cache(maxsize=1024)
def retrieve_file_key_v5(
    sec: StdSecurity, user_pw: bytes = b""
) -> bytes | None:
    """Algorithm 2.A user-password leg: validate against /U, then
    unwrap /UE with the intermediate key from the key salt
    (U[40:48]); zero-IV AES-256-CBC, no padding. None when the
    password does not validate.

    Memoized: the R6 hash is deliberately expensive (its whole point
    is to slow brute force), and a batch routinely re-derives the
    same key — multi-doc fixtures sharing one writer setup, or
    re-parses of the same file; StdSecurity is a frozen (hashable)
    dataclass, so (sec, pw) is a sound cache key."""
    if not verify_user_password_v5(sec, user_pw):
        return None
    ik = hash_2b(user_pw, sec.u[40:48], b"", sec.r)
    return aes_cbc_decrypt_nopad(ik, b"\x00" * 16, sec.ue)


def check_perms_v5(sec: StdSecurity, file_key: bytes) -> bool:
    """Algorithm 13 sanity check: /Perms decrypts (AES-256-ECB) to a
    block whose bytes 9-11 read 'adb', whose first 4 bytes echo /P
    little-endian, and whose byte 8 echoes /EncryptMetadata. Vacuously
    true when the writer omitted /Perms."""
    if len(sec.perms) != 16:
        return True
    blk = aes_ecb_decrypt_block(file_key, sec.perms)
    return (
        blk[9:12] == b"adb"
        and blk[:4] == struct.pack("<I", sec.p & 0xFFFFFFFF)
        and blk[8:9] == (b"T" if sec.encrypt_metadata else b"F")
    )


def compute_u_entry_v5(
    user_pw: bytes, file_key: bytes, vsalt: bytes, ksalt: bytes, r: int
) -> tuple[bytes, bytes]:
    """Algorithm 8 (writer twin): returns (/U 48 bytes, /UE 32
    bytes). Salts are caller-fixed — the spec says random; fixtures
    need determinism."""
    u = hash_2b(user_pw, vsalt, b"", r) + vsalt + ksalt
    ik = hash_2b(user_pw, ksalt, b"", r)
    ue = aes_cbc_encrypt_nopad(ik, b"\x00" * 16, file_key)
    return u, ue


def compute_o_entry_v5(
    owner_pw: bytes, file_key: bytes, vsalt: bytes, ksalt: bytes,
    u48: bytes, r: int,
) -> tuple[bytes, bytes]:
    """Algorithm 9 (writer twin): the owner hash binds the full
    48-byte /U as extra hash data."""
    o = hash_2b(owner_pw, vsalt, u48, r) + vsalt + ksalt
    ik = hash_2b(owner_pw, ksalt, u48, r)
    oe = aes_cbc_encrypt_nopad(ik, b"\x00" * 16, file_key)
    return o, oe


def compute_perms_v5(
    p: int, encrypt_metadata: bool, file_key: bytes
) -> bytes:
    """Algorithm 10 (writer twin). Bytes 12-15 are 'random' per the
    spec and ignored by readers; fixtures pin them to 'pdfx'."""
    blk = (
        struct.pack("<I", p & 0xFFFFFFFF)
        + b"\xff\xff\xff\xff"
        + (b"T" if encrypt_metadata else b"F")
        + b"adb"
        + b"pdfx"
    )
    return aes_ecb_encrypt_block(file_key, blk)


def object_key(file_key: bytes, oid: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 per-object key: md5(key + oid₃LE + gen₂LE
    [+ 'sAlT' for AES]), truncated to min(len+5, 16)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", oid)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_object_bytes(
    sec: StdSecurity, file_key: bytes, oid: int, gen: int, raw: bytes
) -> bytes:
    if sec.v == 5:
        # AESV3: the 256-bit file key is used directly — no
        # per-object md5 derivation (ISO 32000-2 §7.6.3.3 note)
        return aes_cbc_decrypt(file_key, raw)
    k = object_key(file_key, oid, gen, sec.aes)
    if sec.aes:
        return aes_cbc_decrypt(k, raw)
    return rc4(k, raw)


def encrypt_object_bytes(
    sec_aes: bool | str, file_key: bytes, oid: int, gen: int, raw: bytes,
    iv: bytes = b"\x00" * 16,
) -> bytes:
    """Fixture-writer twin of :func:`decrypt_object_bytes` (IV fixed by
    the caller — determinism over semantic security, these are test
    fixtures). ``sec_aes``: False = RC4, True = AESV2, "v5" = AESV3
    (file key direct, AES-256)."""
    if sec_aes == "v5":
        return aes_cbc_encrypt(file_key, iv, raw)
    k = object_key(file_key, oid, gen, sec_aes)
    if sec_aes:
        return aes_cbc_encrypt(k, iv, raw)
    return rc4(k, raw)
