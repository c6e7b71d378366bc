"""Standard security handler for encrypted PDFs (decrypt + test encryptor).

A real-world crawl contains RC4- and AES-encrypted PDFs; the reference
gets decryption free through pypdf/fitz (parsers/pypdf/__main__.py:30-32,
parsers/dots_ocr/__main__.py:111-118).  This module re-implements the
*standard security handler* from the public PDF spec (ISO 32000-1 §7.6,
ISO 32000-2 §7.6.4) from scratch so `kernels/pdftext` can read files
encrypted with the empty user password — the overwhelmingly common case
in crawled corpora (encryption used for permissions, not secrecy):

  - RC4 40/128-bit (V1/V2, R2/R3) with the Algorithm-2 MD5 key schedule,
  - AES-128-CBC via V4 crypt filters (/CFM /AESV2, R4) with the
    "sAlT"-extended per-object key,
  - AES-256-CBC (V5/R6, PDF 2.0) with the Algorithm-2.B hardened SHA-2
    hash and the /UE-wrapped file key.

Scale note: AES-CBC *decryption* parallelises across blocks (each plain
block = D(C_i) XOR C_{i-1}), so the hot decrypt path is vectorised with
NumPy over every block of a stream at once — no per-byte Python loop.
RC4 is inherently sequential (kept as a tight bytearray loop); it only
runs on the RC4-encrypted minority of documents.  Everything here runs
inside mapInPandas workers — per-document, driver never sees bytes.

The `encrypt_pdf` rewriter at the bottom is the generator-side analog
(used by fixtures/tests): it re-writes any parseable PDF as a
classic-layout encrypted file so decryption is proven by round-trip
against the unencrypted golden.
"""

from __future__ import annotations

import functools
import hashlib
import struct

import numpy as np

# r7 (guide §4.2 — hand bulk byte-crunching to native code): route the hot
# cipher paths through OpenSSL via the `cryptography` wheel when present.
# The from-scratch AES/RC4 below stay as the always-available fallback and
# the executable spec (tests/test_pdfcrypt.py pins byte-equality of the two
# paths), so results are identical either way; the R6 Algorithm-2.B KDF is
# ~64 AES-CBC rounds per password probe and dominates the encrypt-audit
# queries when run through the pure-Python block loop.
try:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _OsslCipher,
        algorithms as _ossl_alg,
        modes as _ossl_modes,
    )
    _HAVE_OSSL = True
except Exception:  # pragma: no cover - environment without the wheel
    _HAVE_OSSL = False
try:
    from cryptography.hazmat.decrepit.ciphers.algorithms import (
        ARC4 as _OsslARC4,
    )
except Exception:  # pragma: no cover
    _OsslARC4 = None

# ---------------------------------------------------------------------------
# GF(2^8) tables + AES S-boxes (built, not typed, to rule out table typos)
# ---------------------------------------------------------------------------


def _build_tables():
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 3: x*2 ^ x, reduced mod 0x11B
        x = (x ^ (x << 1) ^ (0x11B if x & 0x80 else 0)) & 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox = [0] * 256
    for v in range(256):
        inv = 0 if v == 0 else exp[255 - log[v]]
        s, r = inv, inv
        for _ in range(4):
            r = ((r << 1) | (r >> 7)) & 0xFF
            s ^= r
        sbox[v] = s ^ 0x63
    inv_sbox = [0] * 256
    for v in range(256):
        inv_sbox[sbox[v]] = v
    muls = {m: np.array([gmul(m, v) for v in range(256)], dtype=np.uint8)
            for m in (2, 3, 9, 11, 13, 14)}
    return (np.array(sbox, dtype=np.uint8),
            np.array(inv_sbox, dtype=np.uint8), muls)


_SBOX, _INV_SBOX, _MUL = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]
# byte-index permutations over the 16-byte block (state byte b[4c+r])
_SHIFT_IDX = np.array([4 * ((c + r) % 4) + r
                       for c in range(4) for r in range(4)], dtype=np.int64)
_INV_SHIFT_IDX = np.array([4 * ((c - r) % 4) + r
                           for c in range(4) for r in range(4)], dtype=np.int64)


def _expand_key(key: bytes) -> np.ndarray:
    """AES key schedule -> (Nr+1, 16) uint8 round keys."""
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    sb = _SBOX
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(sb[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [int(sb[b]) for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    flat = [b for word in w for b in word]
    return np.array(flat, dtype=np.uint8).reshape(nr + 1, 16)


def _inv_mix_columns(st: np.ndarray) -> np.ndarray:
    a = st.reshape(-1, 4, 4)  # (N, column, row)
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    out = np.empty_like(a)
    out[:, :, 0] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
    out[:, :, 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
    out[:, :, 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
    out[:, :, 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
    return out.reshape(-1, 16)


def _mix_columns(st: np.ndarray) -> np.ndarray:
    a = st.reshape(-1, 4, 4)
    m2, m3 = _MUL[2], _MUL[3]
    a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    out = np.empty_like(a)
    out[:, :, 0] = m2[a0] ^ m3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
    out[:, :, 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
    return out.reshape(-1, 16)


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Vectorised AES InvCipher over an (N, 16) uint8 array of blocks."""
    nr = rk.shape[0] - 1
    st = blocks ^ rk[nr]
    for rnd in range(nr - 1, 0, -1):
        st = st[:, _INV_SHIFT_IDX]
        st = _INV_SBOX[st]
        st = st ^ rk[rnd]
        st = _inv_mix_columns(st)
    st = st[:, _INV_SHIFT_IDX]
    st = _INV_SBOX[st]
    return st ^ rk[0]


def _ecb_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Vectorised AES Cipher over (N, 16) blocks (generator/KDF side)."""
    nr = rk.shape[0] - 1
    st = blocks ^ rk[0]
    for rnd in range(1, nr):
        st = _SBOX[st]
        st = st[:, _SHIFT_IDX]
        st = _mix_columns(st)
        st = st ^ rk[rnd]
    st = _SBOX[st]
    st = st[:, _SHIFT_IDX]
    return st ^ rk[nr]


def _build_te():
    """32-bit T-tables fusing SubBytes+ShiftRows+MixColumns for the
    scalar encrypt path (KDF/generator side — per-block numpy dispatch
    overhead dwarfs the arithmetic there, so plain ints win)."""
    m2, m3 = _MUL[2], _MUL[3]
    te0 = []
    for x in range(256):
        s = int(_SBOX[x])
        te0.append((int(m2[s]) << 24) | (s << 16) | (s << 8) | int(m3[s]))
    ror = lambda t, n: ((t >> n) | (t << (32 - n))) & 0xFFFFFFFF  # noqa: E731
    return (te0, [ror(t, 8) for t in te0], [ror(t, 16) for t in te0],
            [ror(t, 24) for t in te0])


_TE0, _TE1, _TE2, _TE3 = _build_te()
_SBOX_L = [int(x) for x in _SBOX]


def _rk_words(key: bytes) -> list[int]:
    flat = _expand_key(key).tobytes()
    return [int.from_bytes(flat[i:i + 4], "big")
            for i in range(0, len(flat), 4)]


def _encrypt_block_words(w0, w1, w2, w3, rkw: list[int]):
    """Scalar AES Cipher on four 32-bit column words."""
    te0, te1, te2, te3, sb = _TE0, _TE1, _TE2, _TE3, _SBOX_L
    nr = len(rkw) // 4 - 1
    w0 ^= rkw[0]
    w1 ^= rkw[1]
    w2 ^= rkw[2]
    w3 ^= rkw[3]
    for r in range(1, nr):
        k = 4 * r
        t0 = (te0[w0 >> 24] ^ te1[(w1 >> 16) & 255]
              ^ te2[(w2 >> 8) & 255] ^ te3[w3 & 255] ^ rkw[k])
        t1 = (te0[w1 >> 24] ^ te1[(w2 >> 16) & 255]
              ^ te2[(w3 >> 8) & 255] ^ te3[w0 & 255] ^ rkw[k + 1])
        t2 = (te0[w2 >> 24] ^ te1[(w3 >> 16) & 255]
              ^ te2[(w0 >> 8) & 255] ^ te3[w1 & 255] ^ rkw[k + 2])
        t3 = (te0[w3 >> 24] ^ te1[(w0 >> 16) & 255]
              ^ te2[(w1 >> 8) & 255] ^ te3[w2 & 255] ^ rkw[k + 3])
        w0, w1, w2, w3 = t0, t1, t2, t3
    k = 4 * nr
    o0 = ((sb[w0 >> 24] << 24) | (sb[(w1 >> 16) & 255] << 16)
          | (sb[(w2 >> 8) & 255] << 8) | sb[w3 & 255]) ^ rkw[k]
    o1 = ((sb[w1 >> 24] << 24) | (sb[(w2 >> 16) & 255] << 16)
          | (sb[(w3 >> 8) & 255] << 8) | sb[w0 & 255]) ^ rkw[k + 1]
    o2 = ((sb[w2 >> 24] << 24) | (sb[(w3 >> 16) & 255] << 16)
          | (sb[(w0 >> 8) & 255] << 8) | sb[w1 & 255]) ^ rkw[k + 2]
    o3 = ((sb[w3 >> 24] << 24) | (sb[(w0 >> 16) & 255] << 16)
          | (sb[(w1 >> 8) & 255] << 8) | sb[w2 & 255]) ^ rkw[k + 3]
    return o0, o1, o2, o3


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    rkw = _rk_words(key)
    w = struct.unpack(">4I", block)
    return struct.pack(">4I", *_encrypt_block_words(*w, rkw))


def aes_cbc_decrypt(key: bytes, data: bytes, iv: bytes | None = None,
                    unpad: bool = True) -> bytes:
    """CBC decrypt; iv=None means the first 16 bytes of data are the IV
    (the PDF stream layout).  Block-parallel: every block decrypts at
    once, then XORs against the shifted ciphertext."""
    if iv is None:
        iv, data = data[:16], data[16:]
    n = len(data) // 16
    if n == 0:
        return b""
    data = data[:n * 16]
    if _HAVE_OSSL:
        dec = _OsslCipher(_ossl_alg.AES(key), _ossl_modes.CBC(iv)).decryptor()
        out = dec.update(data) + dec.finalize()
    else:
        rk = _expand_key(key)
        ct = np.frombuffer(data, dtype=np.uint8).reshape(n, 16)
        pt = _ecb_decrypt_blocks(ct, rk)
        prev = np.vstack([np.frombuffer(iv, dtype=np.uint8).reshape(1, 16),
                          ct[:-1]])
        out = (pt ^ prev).tobytes()
    if unpad:
        pad = out[-1] if out else 0
        if 1 <= pad <= 16 and out.endswith(bytes([pad]) * pad):
            out = out[:-pad]
    return out


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes,
                    pad: bool = True) -> bytes:
    """CBC encrypt (generator / Algorithm-2.B side; inherently sequential
    across blocks, so per-block — only runs at fixture-gen / KDF time)."""
    if pad:
        k = 16 - len(data) % 16
        data = data + bytes([k]) * k
    if _HAVE_OSSL:
        enc = _OsslCipher(_ossl_alg.AES(key), _ossl_modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    rkw = _rk_words(key)
    out = bytearray(len(data))
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    for i in range(0, len(data), 16):
        b0, b1, b2, b3 = struct.unpack_from(">4I", data, i)
        p0, p1, p2, p3 = _encrypt_block_words(
            b0 ^ p0, b1 ^ p1, b2 ^ p2, b3 ^ p3, rkw)
        struct.pack_into(">4I", out, i, p0, p1, p2, p3)
    return bytes(out)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric; same call encrypts and decrypts)."""
    if (_OsslARC4 is not None and data
            and len(key) * 8 in _OsslARC4.key_sizes):
        enc = _OsslCipher(_OsslARC4(key), mode=None).encryptor()
        return enc.update(data) + enc.finalize()
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# Standard security handler key derivation (ISO 32000-1 §7.6.3)
# ---------------------------------------------------------------------------

_PAD = bytes([0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00,
              0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6,
              0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53,
              0x69, 0x7A])


def _file_key_std(o: bytes, p: int, id0: bytes, r: int, nbytes: int,
                  encrypt_metadata: bool, password: bytes = b"") -> bytes:
    """Algorithm 2: file key from the user password (padded; empty by
    default — the crawl norm). The owner route passes the 32-byte
    recovered pad directly (pad(x)==x when len(x)==32)."""
    h = hashlib.md5((password + _PAD)[:32] + o[:32]
                    + struct.pack("<i", p) + id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


@functools.lru_cache(maxsize=4096)
def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6).

    lru_cache: the hash is pure and deliberately slow (~64 AES-CBC
    rounds); a corpus pass touches the same document once per query, so
    caching by (password, salt, udata) makes every re-read after the
    first free within a python worker. 4096 entries x 32-byte keys is
    KBs of state."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k1, iv=k[16:32], pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _as_bytes(v) -> bytes:
    return v if isinstance(v, bytes) else b""


class StandardDecrypter:
    """Per-document decrypter built from the /Encrypt dict + first /ID.

    Tries `password` as the user password first (the passwords
    side-table hook — VERDICT r5 item 8), then the empty password (the
    crawl norm); for each candidate both the USER route and the OWNER
    route are attempted. Classic (R2-R4) keys are validated against /U
    (Algorithm 6) so a wrong password fails closed instead of decrypting
    to garbage. `ok` is False when the handler is unsupported or every
    route fails — the caller falls back to treating the file as damaged
    (error isolation), never raising out of the extract UDF.
    """

    def __init__(self, enc: dict, id0: bytes, password: bytes = b""):
        self.ok = False
        self.stm_cfm = self.str_cfm = "Identity"
        self.key = b""
        if str(enc.get("Filter", "Standard")) != "Standard":
            return  # third-party security handlers are out of scope
        self.r = int(enc.get("R", 2))
        self.v = int(enc.get("V", 1))
        length = int(enc.get("Length", 40) or 40)
        o, u = _as_bytes(enc.get("O")), _as_bytes(enc.get("U"))
        p = int(enc.get("P", -1))
        em = enc.get("EncryptMetadata", True) is not False
        pwds = [password, b""] if password else [b""]
        self.stm_cfm = self.str_cfm = "V2"  # V1/V2 default: RC4
        if self.v in (1, 2) and self.r in (2, 3):
            n = 5 if self.v == 1 else max(5, length // 8)
            self.key = self._classic_key(o, u, p, id0, n, em, pwds)
            if self.key is None:
                return
        elif self.v == 4:
            cf = enc.get("CF") if isinstance(enc.get("CF"), dict) else {}

            def cfm_of(name):
                name = str(name) if name is not None else "Identity"
                if name == "Identity":
                    return "Identity", 16
                ent = cf.get(name) if isinstance(cf.get(name), dict) else {}
                ln = int(ent.get("Length", 16) or 16)
                # /Length in a crypt filter is bytes per spec, but some
                # producers write bits — normalise
                return str(ent.get("CFM", "V2")), (ln // 8 if ln >= 40 else ln)

            self.stm_cfm, n1 = cfm_of(enc.get("StmF"))
            self.str_cfm, n2 = cfm_of(enc.get("StrF"))
            n = max(n1, n2, 5)
            self.key = self._classic_key(o, u, p, id0, n, em, pwds)
            if self.key is None:
                return
        elif self.v == 5 and self.r in (5, 6):
            self.stm_cfm = self.str_cfm = "AESV3"
            ue, oe = _as_bytes(enc.get("UE")), _as_bytes(enc.get("OE"))
            perms = _as_bytes(enc.get("Perms"))
            if len(u) < 48:
                return
            key = None
            # ISO 32000-2 Algorithm 2.A: the UTF-8 password is truncated
            # to 127 bytes before hashing (ADVICE r6; full SASLprep is
            # documented out of scope — registry passwords here are
            # ASCII, and a conforming writer applies the same prep)
            pwds = [pw[:127] for pw in pwds]
            for pw in pwds:
                # USER route (Algorithm 2.A): /Perms integrity (one AES
                # block) validates the derived key cheaply when present,
                # else the ~64-round /U validation hash
                if len(ue) >= 32:
                    ikey = _hash_2b(pw, u[40:48], b"")
                    cand = aes_cbc_decrypt(ikey, ue, iv=b"\x00" * 16,
                                           unpad=False)[:32]
                    if (self._perms_ok(cand, perms) if len(perms) == 16
                            else _hash_2b(pw, u[32:40], b"") == u[:32]):
                        key = cand
                        break
                if (len(o) >= 48 and len(oe) >= 32
                        and _hash_2b(pw, o[32:40], u[:48]) == o[:32]):
                    # OWNER route (Algorithm 2.A): /O validates against
                    # hash(pw + validation salt + U48), and the file key
                    # unwraps from /OE with the key-salt intermediate
                    # (udata = the full 48-byte /U)
                    ikey = _hash_2b(pw, o[40:48], u[:48])
                    cand = aes_cbc_decrypt(ikey, oe, iv=b"\x00" * 16,
                                           unpad=False)[:32]
                    if len(perms) != 16 or self._perms_ok(cand, perms):
                        key = cand
                        break
            if key is None:
                return  # wrong password (or corrupt) -> fail closed
            self.key = key
        else:
            return
        self.ok = True

    def _classic_key(self, o: bytes, u: bytes, p: int, id0: bytes,
                     n: int, em: bool, pwds: list) -> bytes | None:
        """R2-R4 file key: user route (Algorithm 2 + /U check per
        Algorithm 6) then owner route (Algorithm 7: /O unwraps to the
        padded user password) for each candidate password."""
        for pw in pwds:
            key = _file_key_std(o, p, id0, self.r, n, em, pw)
            if self._u_ok(key, u, id0):
                return key
            # owner route: okey from the owner password (Algorithm 3
            # steps a-d), /O decrypts to the PADDED user password
            h = hashlib.md5((pw + _PAD)[:32]).digest()
            if self.r >= 3:
                for _ in range(50):
                    h = hashlib.md5(h).digest()
            okey = h[:n]
            if self.r == 2:
                upad = rc4(okey, o[:32])
            else:
                upad = o[:32]
                for i in range(19, -1, -1):
                    upad = rc4(bytes(b ^ i for b in okey), upad)
            key = _file_key_std(o, p, id0, self.r, n, em, upad)
            if self._u_ok(key, u, id0):
                return key
        return None

    def _u_ok(self, key: bytes, u: bytes, id0: bytes) -> bool:
        """Algorithm 6: recompute /U from the candidate key (Algorithm
        4 for R2, Algorithm 5 first-16-bytes for R3/R4)."""
        if self.r == 2:
            return rc4(key, _PAD) == u[:32]
        x = rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        return x == u[:16]

    @staticmethod
    def _perms_ok(key: bytes, perms: bytes) -> bool:
        """Algorithm 13: /Perms decrypted with the file key reads 'adb'
        at bytes 9-11."""
        blk = np.frombuffer(perms, dtype=np.uint8).reshape(1, 16)
        dec = _ecb_decrypt_blocks(blk, _expand_key(key))
        return dec.tobytes()[9:12] == b"adb"

    def _objkey(self, num: int, gen: int, aes: bool) -> bytes:
        ext = b"\x73\x41\x6c\x54" if aes else b""  # "sAlT"
        d = hashlib.md5(self.key + num.to_bytes(3, "little")
                        + gen.to_bytes(2, "little") + ext).digest()
        return d[:min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str, data: bytes, num: int, gen: int) -> bytes:
        if not self.ok or cfm == "Identity":
            return data
        if cfm == "AESV3":
            return aes_cbc_decrypt(self.key, data)
        if cfm == "AESV2":
            return aes_cbc_decrypt(self._objkey(num, gen, True), data)
        return rc4(self._objkey(num, gen, False), data)  # V2 = RC4

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_cfm, data, num, gen)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_cfm, data, num, gen)


def sniff_encryption(pdf: bytes, password: bytes = b"") -> tuple[str, bool]:
    """(scheme, decrypt_ok) for auditing a crawled corpus.

    scheme is 'none' / 'rc4-40' / 'rc4-128' / 'aes-128' / 'aes-256' /
    'other' (identity or unknown crypt filters) / 'damaged'; decrypt_ok
    is True when the file is unencrypted or key derivation succeeded
    for `password` or the empty password (validated against /U, or
    /Perms for V5). `password` is the passwords side-table hook: a
    crawl joins a small (doc_id, password) registry into the audit."""
    from pdf_parse_bench_spark.kernels.pdftext import _PdfDoc
    try:
        doc = _PdfDoc(pdf, password=password)
        enc = doc.resolve(doc.trailer.get("Encrypt"))
    except Exception:
        return ("damaged", False)
    if not isinstance(enc, dict):
        return ("none", True)
    v = int(enc.get("V", 1) or 1)
    length = int(enc.get("Length", 40) or 40)
    if v == 5:
        scheme = "aes-256"
    elif v == 4:
        cf = enc.get("CF") if isinstance(enc.get("CF"), dict) else {}

        def _cfm(which):
            ent = cf.get(str(enc.get(which, "Identity")))
            return str(ent.get("CFM", "V2")) if isinstance(ent, dict) \
                else "Identity"
        # asymmetric /StmF vs /StrF: report the non-Identity side (a file
        # with plain strings but AES streams is still an AES file)
        cfm = _cfm("StmF")
        if cfm == "Identity":
            cfm = _cfm("StrF")
        scheme = {"AESV2": "aes-128", "V2": "rc4-128"}.get(cfm, "other")
    elif v in (1, 2):
        scheme = "rc4-128" if (v == 2 and length >= 128) else "rc4-40"
    else:
        scheme = "other"
    return (scheme, doc._crypt is not None)


# ---------------------------------------------------------------------------
# Generator side: rewrite any parseable PDF as an encrypted classic-layout
# file (fixtures/tests only — proves decryption by round-trip)
# ---------------------------------------------------------------------------

VARIANTS = ("rc4-40", "rc4-128", "aes-128", "aes-256",
            "aes-128-stmf-only", "aes-128-strf-only", "aes-256-owner")


def sniff_label(variant: str) -> str:
    """The scheme label sniff_encryption reports for a generator variant
    (the suffix variants are wire-indistinguishable refinements)."""
    base = variant.replace("-nm", "").replace("-stmf-only", "")         .replace("-strf-only", "").replace("-owner", "")
    return base


class _Encrypter:
    def __init__(self, variant: str, seed: int,
                 user_password: bytes = b""):
        """`user_password` locks the file for readers: both the user and
        the owner password are set to it (so neither empty-password
        route succeeds) — the fixture side of the passwords side-table
        hook (VERDICT r5 item 8)."""
        rng = np.random.default_rng(0xC0DEC + seed)
        self.variant = variant
        self.id0 = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        self.p = -4
        # asymmetric crypt filters (V4): '-stmf-only' leaves strings
        # PLAIN (/StrF /Identity), '-strf-only' leaves streams plain
        self.enc_streams = not variant.endswith("-strf-only")
        self.enc_strings = not variant.endswith("-stmf-only")
        if variant.startswith("aes-256"):
            # 'aes-256-owner': the USER password is non-empty (the file
            # is password-locked for readers) while the OWNER password
            # is empty — the decrypter must authenticate via the /O
            # validation hash and unwrap the key from /OE
            upw = (b"reader-%d" % seed) if variant == "aes-256-owner" \
                else user_password
            opw = user_password  # empty unless password-locked
            # conforming-writer side of ISO 32000-2 Algorithm 2.A prep
            upw, opw = upw[:127], opw[:127]
            self.key = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
            vs = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
            ks = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
            self.u = _hash_2b(upw, vs, b"") + vs + ks
            ikey = _hash_2b(upw, ks, b"")
            self.ue = aes_cbc_encrypt(ikey, self.key, iv=b"\x00" * 16,
                                      pad=False)
            vso = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
            kso = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
            self.o = _hash_2b(opw, vso, self.u) + vso + kso
            self.oe = aes_cbc_encrypt(_hash_2b(opw, kso, self.u), self.key,
                                      iv=b"\x00" * 16, pad=False)
            self.perms = aes_encrypt_block(
                self.key, struct.pack("<i", self.p) + b"\xff\xff\xff\xff"
                + b"Tadb" + bytes(4))
        else:
            # 'aes-128-nm' = V4/AESV2 with /EncryptMetadata false (the
            # 0xFFFFFFFF key-derivation suffix branch)
            self.em = variant != "aes-128-nm"
            if variant.startswith("aes-128") and variant != "aes-128":
                variant = "aes-128"
                self.variant = "aes-128"
            self.r = {"rc4-40": 2, "rc4-128": 3, "aes-128": 4}[variant]
            self.nbytes = 5 if variant == "rc4-40" else 16
            # Algorithm 3: /O from the owner (== user) password
            pw_pad = (user_password + _PAD)[:32]
            h = hashlib.md5(pw_pad).digest()
            if self.r >= 3:
                for _ in range(50):
                    h = hashlib.md5(h).digest()
            okey = h[:self.nbytes]
            o = rc4(okey, pw_pad)
            if self.r >= 3:
                for i in range(1, 20):
                    o = rc4(bytes(b ^ i for b in okey), o)
            self.o = o
            self.key = _file_key_std(o, self.p, self.id0, self.r,
                                     self.nbytes, self.em, user_password)
            if self.r == 2:  # Algorithm 4
                self.u = rc4(self.key, _PAD)
            else:  # Algorithm 5
                u = rc4(self.key, hashlib.md5(_PAD + self.id0).digest())
                for i in range(1, 20):
                    u = rc4(bytes(b ^ i for b in self.key), u)
                self.u = u + bytes(16)
        self._rng = rng

    def encrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.variant.startswith("aes-256"):
            iv = self._rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            return iv + aes_cbc_encrypt(self.key, data, iv=iv)
        d = hashlib.md5(self.key + num.to_bytes(3, "little")
                        + gen.to_bytes(2, "little")
                        + (b"sAlT" if self.variant == "aes-128" else b"")
                        ).digest()[:min(self.nbytes + 5, 16)]
        if self.variant == "aes-128":
            iv = self._rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            return iv + aes_cbc_encrypt(d, data, iv=iv)
        return rc4(d, data)

    def encrypt_dict(self) -> bytes:
        hx = lambda b: b"<" + b.hex().encode() + b">"  # noqa: E731
        if self.variant.startswith("aes-256"):
            return (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                    b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                    b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
                    b" /O " + hx(self.o) + b" /U " + hx(self.u)
                    + b" /OE " + hx(self.oe) + b" /UE " + hx(self.ue)
                    + b" /Perms " + hx(self.perms)
                    + b" /P %d >>" % self.p)
        if self.variant == "aes-128":
            em = b"" if self.em else b" /EncryptMetadata false"
            stmf = b"/StdCF" if self.enc_streams else b"/Identity"
            strf = b"/StdCF" if self.enc_strings else b"/Identity"
            return (b"<< /Filter /Standard /V 4 /R 4 /Length 128"
                    b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                    b" /Length 16 >> >> /StmF " + stmf
                    + b" /StrF " + strf + em
                    + b" /O " + hx(self.o) + b" /U " + hx(self.u)
                    + b" /P %d >>" % self.p)
        v, r, ln = (1, 2, 40) if self.variant == "rc4-40" else (2, 3, 128)
        return (b"<< /Filter /Standard /V %d /R %d /Length %d /O " % (v, r, ln)
                + hx(self.o) + b" /U " + hx(self.u) + b" /P %d >>" % self.p)


def _ser(v, crypt_str) -> bytes:
    """Serialise a parsed COS value back to PDF syntax, encrypting
    strings through `crypt_str`."""
    from pdf_parse_bench_spark.kernels.pdftext import _Name, _Ref
    if isinstance(v, _Name):
        esc = "".join(c if 0x21 <= ord(c) <= 0x7E and c not in "()<>[]{}/%#"
                      else "#%02X" % ord(c) for c in str(v))
        return b"/" + esc.encode("latin-1")
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, _Ref):
        return b"%d 0 R" % int(v)
    if v is None:
        return b"null"
    if isinstance(v, int):
        return b"%d" % v
    if isinstance(v, float):
        return ("%g" % v).encode()
    if isinstance(v, bytes):
        return b"<" + crypt_str(v).hex().encode() + b">"
    if isinstance(v, list):
        return b"[ " + b" ".join(_ser(x, crypt_str) for x in v) + b" ]"
    if isinstance(v, dict):
        return (b"<< " + b" ".join(
            _ser(_Name(k), crypt_str) + b" " + _ser(x, crypt_str)
            for k, x in v.items()) + b" >>")
    raise TypeError(f"unserialisable COS value {type(v)}")


def encrypt_pdf(pdf: bytes, variant: str = "rc4-128", seed: int = 0,
                user_password: bytes = b"") -> bytes:
    """Rewrite `pdf` as a classic-layout file encrypted with the standard
    security handler (empty user/owner password).  Object numbers are
    preserved; ObjStm-packed objects are re-emitted as top-level objects
    (strings inside object streams are never separately encrypted, so a
    faithful rewrite must unpack them)."""
    from pdf_parse_bench_spark.kernels.pdftext import _PdfDoc, _Ref
    doc = _PdfDoc(pdf)
    enc = _Encrypter(variant, seed, user_password)
    nums = sorted(set(doc.offsets) | set(doc.in_objstm))
    old_enc = doc.trailer.get("Encrypt")
    if isinstance(old_enc, _Ref) and int(old_enc) in nums:
        nums.remove(int(old_enc))  # already-encrypted source: drop its dict
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in nums:
        val, raw = doc.get_object(num)
        if val is None and raw is None:
            continue
        if isinstance(val, dict) and str(val.get("Type", "")) in (
                "ObjStm", "XRef"):
            continue  # containers of the old layout; not re-emitted
        crypt_str = (lambda b, _n=num: enc.encrypt(b, _n, 0)) \
            if enc.enc_strings else (lambda b: b)  # noqa: E731
        if raw is not None:
            body = enc.encrypt(raw, num, 0) if enc.enc_streams else raw
            d2 = dict(val)
            d2["Length"] = len(body)
            piece = (_ser(d2, crypt_str) + b"\nstream\n" + body
                     + b"\nendstream")
        else:
            piece = _ser(val, crypt_str)
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + piece + b"\nendobj\n"
    enc_num = max(nums) + 1
    offsets[enc_num] = len(out)
    out += b"%d 0 obj\n" % enc_num + enc.encrypt_dict() + b"\nendobj\n"
    xref_at = len(out)
    size = enc_num + 1
    out += b"xref\n0 %d\n" % size
    for n in range(size):
        if n in offsets:
            out += b"%010d 00000 n \n" % offsets[n]
        else:
            out += b"0000000000 65535 f \n"
    root = doc.trailer.get("Root")
    root_s = b"%d 0 R" % int(root) if isinstance(root, _Ref) else b"1 0 R"
    idh = b"<" + enc.id0.hex().encode() + b">"
    out += (b"trailer\n<< /Size %d /Root " % size + root_s
            + b" /Encrypt %d 0 R /ID [ " % enc_num + idh + b" " + idh
            + b" ] >>\nstartxref\n%d\n%%%%EOF\n" % xref_at)
    return bytes(out)
