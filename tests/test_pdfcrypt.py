"""Standard-security-handler tests (kernels/pdfcrypt).

The reference reads encrypted PDFs for free through pypdf/fitz
(parsers/pypdf/__main__.py:30-32, parsers/dots_ocr/__main__.py:111-118);
here the handler is re-implemented from the public spec, so correctness
is proven two ways: published known-answer vectors for the primitives
(FIPS-197, the classic RC4 test vector), and full-file round-trips —
encrypt a fixture PDF with each supported variant, then assert the
extractor recovers byte-identical text/spans vs the unencrypted file.
"""

from __future__ import annotations

import binascii

import numpy as np
import pytest

from pdf_parse_bench_spark import fixtures as fx
from pdf_parse_bench_spark.kernels import pdfcrypt as pc
from pdf_parse_bench_spark.kernels.pdftext import (
    extract_pdf_spans,
    extract_pdf_text,
)


# -- primitives: published known-answer vectors -----------------------------

def test_aes128_fips197_vector():
    key = bytes(range(16))
    pt = binascii.unhexlify("00112233445566778899aabbccddeeff")
    ct = pc.aes_encrypt_block(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    rk = pc._expand_key(key)
    blk = np.frombuffer(ct, dtype=np.uint8).reshape(1, 16)
    assert pc._ecb_decrypt_blocks(blk, rk).tobytes() == pt


def test_aes256_fips197_vector():
    key = bytes(range(32))
    pt = binascii.unhexlify("00112233445566778899aabbccddeeff")
    ct = pc.aes_encrypt_block(key, pt)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"  # FIPS-197 C.3
    rk = pc._expand_key(key)
    blk = np.frombuffer(ct, dtype=np.uint8).reshape(1, 16)
    assert pc._ecb_decrypt_blocks(blk, rk).tobytes() == pt


def test_rc4_vector():
    assert pc.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # symmetric
    assert pc.rc4(b"Key", pc.rc4(b"Key", b"arbitrary data")) \
        == b"arbitrary data"


def test_cbc_roundtrip_vectorised_decrypt():
    """The numpy block-parallel CBC decrypt inverts the scalar encrypt
    for every length class (empty / one block / many, padded)."""
    key = b"0123456789abcdef"
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 1000):
        msg = bytes((i * 7) & 0xFF for i in range(n))
        enc = pc.aes_cbc_encrypt(key, msg, iv=iv)
        assert len(enc) % 16 == 0 and len(enc) > len(msg) - 16
        assert pc.aes_cbc_decrypt(key, iv + enc) == msg


# -- full-file round-trips ---------------------------------------------------

def _fixture_pdf(did: int):
    spans = fx.generate_doc_spans(
        did, fx._mk_text(["alpha", "beta", "gamma", "delta"],
                         fx._doc_rng(did)))
    pdf, _txt, _entries, _scheme, _imgs = fx.generate_pdf(did, spans)
    return pdf


@pytest.mark.parametrize("variant", pc.VARIANTS)
def test_encrypted_pdf_roundtrip(variant):
    pdf = _fixture_pdf(11)
    epdf = pc.encrypt_pdf(pdf, variant, seed=11)
    # the rewrite really is encrypted: plaintext stream bytes are gone
    assert b"/Encrypt" in epdf
    assert extract_pdf_text(epdf) == extract_pdf_text(pdf)
    assert extract_pdf_spans(epdf) == extract_pdf_spans(pdf)


def test_encrypted_streams_are_opaque():
    """The encrypted file must not contain the original deflate streams
    (i.e. encryption actually transformed the bytes)."""
    pdf = _fixture_pdf(23)
    from pdf_parse_bench_spark.kernels.pdftext import _PdfDoc
    doc = _PdfDoc(pdf)
    # longest raw content stream of the original
    raws = [raw for num in sorted(set(doc.offsets) | set(doc.in_objstm))
            for _, raw in [doc.get_object(num)] if raw]
    probe = max(raws, key=len)[:64]
    for variant in ("rc4-128", "aes-128"):
        assert probe not in pc.encrypt_pdf(pdf, variant, seed=23)


def test_wrong_password_validation_fails_closed():
    """A V5 file whose unwrapped file key fails the /Perms integrity
    check (Algorithm 13) must fall to the damaged-file path
    (handler.ok False), not crash and not emit garbage."""
    pdf = _fixture_pdf(5)
    epdf = bytearray(pc.encrypt_pdf(pdf, "aes-256", seed=5))
    # corrupt /UE -> wrong user-route key -> Perms check fails; the
    # OWNER route (empty owner password, intact /OE) still recovers it
    at = epdf.find(b"/UE <")
    assert at > 0
    epdf[at + 5:at + 9] = b"0000" if epdf[at + 5:at + 9] != b"0000" \
        else b"1111"
    assert extract_pdf_text(bytes(epdf)) != ""  # owner-route recovery
    # corrupt /OE too -> both routes dead -> fail closed
    at = epdf.find(b"/OE <")
    assert at > 0
    epdf[at + 5:at + 9] = b"0000" if epdf[at + 5:at + 9] != b"0000" \
        else b"1111"
    out = extract_pdf_text(bytes(epdf))
    assert out == ""  # no garbage text, no exception


def test_wrong_password_u_hash_fallback_without_perms():
    """Without /Perms the handler falls back to the full Algorithm-2.A
    /U validation hash — a corrupt validation hash must fail closed."""
    pdf = _fixture_pdf(5)
    epdf = pc.encrypt_pdf(pdf, "aes-256", seed=5)
    at = epdf.find(b" /Perms <")
    end = epdf.find(b">", at) + 1
    stripped = bytearray(epdf[:at] + epdf[end:])
    # offsets after the Encrypt dict shift; the dict precedes the xref,
    # and the trailer's startxref is now stale — rebuild it
    sx = stripped.rfind(b"startxref")
    xr = stripped.rfind(b"\nxref\n")
    stripped[sx:] = b"startxref\n%d\n%%%%EOF\n" % (xr + 1)
    assert extract_pdf_text(bytes(stripped)) != ""  # still valid sans Perms
    at = stripped.find(b"/U <")
    stripped[at + 4:at + 8] = b"0000" \
        if stripped[at + 4:at + 8] != b"0000" else b"1111"
    assert extract_pdf_text(bytes(stripped)) == ""


def test_sniff_encryption_labels_every_variant():
    pdf = _fixture_pdf(31)
    for variant in pc.VARIANTS:
        s, ok = pc.sniff_encryption(pc.encrypt_pdf(pdf, variant, seed=31))
        assert (s, ok) == (pc.sniff_label(variant), True)


def test_decrypter_rejects_unknown_handler():
    h = pc.StandardDecrypter({"Filter": "Acme.SecretHandler"}, b"")
    assert not h.ok
    # Identity pass-through when not ok
    assert h.decrypt_stream(b"abc", 1, 0) == b"abc"


def test_encrypt_metadata_false_key_derivation_branch():
    """/EncryptMetadata false appends 0xFFFFFFFF to the Algorithm-2 MD5
    input (R>=4) — a file written that way must round-trip, proving the
    decrypt side takes the same branch."""
    pdf = _fixture_pdf(13)
    epdf = pc.encrypt_pdf(pdf, "aes-128-nm", seed=13)
    assert b"/EncryptMetadata false" in epdf
    assert extract_pdf_text(epdf) == extract_pdf_text(pdf)


@pytest.mark.parametrize("variant",
                         ("rc4-40", "rc4-128", "aes-128", "aes-256"))
def test_password_locked_requires_side_table_password(variant):
    """A file locked with a REAL user password (owner password set too):
    the empty-password audit fails closed, the right password decrypts
    byte-identically, a wrong password fails closed — across every
    supported scheme (Algorithm 6 /U validation for R2-R4, the 2.A
    routes for R6). This is the kernels half of the passwords
    side-table hook (VERDICT r5 item 8)."""
    pdf = _fixture_pdf(31)
    locked = pc.encrypt_pdf(pdf, variant, seed=31,
                            user_password=b"open-sesame")
    assert pc.sniff_encryption(locked)[1] is False
    assert pc.sniff_encryption(locked, password=b"open-sesame")[1] is True
    assert pc.sniff_encryption(locked, password=b"wrong")[1] is False
    assert extract_pdf_text(locked, password=b"open-sesame") \
        == extract_pdf_text(pdf)
    assert extract_pdf_text(locked) == ""
    assert extract_pdf_spans(locked, password=b"open-sesame") \
        == extract_pdf_spans(pdf)


def test_classic_u_validation_fails_closed_on_corrupt_u():
    """R2-R4 now validate the derived key against /U (Algorithm 6):
    a corrupted /U entry must fail closed instead of decrypting with a
    garbage-producing key."""
    pdf = _fixture_pdf(31)
    for variant in ("rc4-128", "aes-128"):
        epdf = bytearray(pc.encrypt_pdf(pdf, variant, seed=13))
        at = epdf.find(b"/U <")
        assert at > 0
        epdf[at + 4:at + 8] = b"0000" if epdf[at + 4:at + 8] != b"0000" \
            else b"1111"
        assert extract_pdf_text(bytes(epdf)) == "", variant


def test_locked_audit_spark_side_table_join(spark):
    """Operator half of the side-table hook: pdf_encrypt_audit joins the
    broadcast (doc_id, password) registry — rows with the right password
    flip to decrypt_ok=true, rows without an entry stay false."""
    from pdf_parse_bench_spark.operators.extract import pdf_encrypt_audit

    pdf = _fixture_pdf(7)
    rows = [("d1", pc.encrypt_pdf(pdf, "rc4-128", seed=1,
                                  user_password=b"pw-1")),
            ("d2", pc.encrypt_pdf(pdf, "aes-128", seed=2,
                                  user_password=b"pw-2")),
            ("d3", pc.encrypt_pdf(pdf, "aes-128", seed=3))]
    docs = spark.createDataFrame(rows, "doc_id string, pdf_bytes binary")
    pws = spark.createDataFrame(
        [("d1", "pw-1"), ("d2", "nope")], "doc_id string, password string")
    out = {r["doc_id"]: r["decrypt_ok"]
           for r in pdf_encrypt_audit(docs, passwords_df=pws).collect()}
    assert out == {"d1": True, "d2": False, "d3": True}
    base = {r["doc_id"]: r["decrypt_ok"]
            for r in pdf_encrypt_audit(docs).collect()}
    assert base == {"d1": False, "d2": False, "d3": True}


def test_openssl_and_pure_python_paths_agree():
    """r7 pin: when the OpenSSL-backed fast path is available, its output
    must be byte-identical to the from-scratch AES/RC4 implementation on
    random vectors (key sizes 16/24/32; CBC both directions; RC4 at the
    PDF key lengths)."""
    import os
    import numpy as np
    from pdf_parse_bench_spark.kernels import pdfcrypt as pc

    if not pc._HAVE_OSSL:
        import pytest
        pytest.skip("cryptography wheel not present")
    rng = np.random.default_rng(7)

    def rand(n):
        return bytes(rng.integers(0, 256, n, dtype=np.uint8))

    for klen in (16, 24, 32):
        key, iv = rand(klen), rand(16)
        data = rand(16 * 37)
        ct = pc.aes_cbc_encrypt(key, data, iv, pad=False)
        # pure-python reference path
        rkw = pc._rk_words(key)
        import struct
        out = bytearray(len(data))
        p = struct.unpack(">4I", iv)
        for i in range(0, len(data), 16):
            b = struct.unpack_from(">4I", data, i)
            p = pc._encrypt_block_words(*(x ^ y for x, y in zip(b, p)), rkw)
            struct.pack_into(">4I", out, i, *p)
        assert ct == bytes(out)
        # decrypt round-trips through the numpy InvCipher reference
        rk = pc._expand_key(key)
        ctm = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 16)
        pt = pc._ecb_decrypt_blocks(ctm, rk)
        prev = np.vstack([np.frombuffer(iv, dtype=np.uint8).reshape(1, 16),
                          ctm[:-1]])
        assert (pt ^ prev).tobytes() == data
        assert pc.aes_cbc_decrypt(key, ct, iv=iv, unpad=False) == data
    # RC4: fast path vs the from-scratch KSA/PRGA loop
    for klen in (5, 10, 16):
        key, data = rand(klen), rand(333)
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % klen]) & 0xFF
            s[i], s[j] = s[j], s[i]
        ref = bytearray(len(data))
        i = j = 0
        for k, c in enumerate(data):
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            ref[k] = c ^ s[(s[i] + s[j]) & 0xFF]
        assert pc.rc4(key, data) == bytes(ref)


def test_r6_password_truncated_to_127_bytes():
    """ISO 32000-2 Algorithm 2.A: R6 passwords hash over at most 127
    UTF-8 bytes, so a >127-byte registry password validates identically
    to its 127-byte prefix (ADVICE r6)."""
    from pdf_parse_bench_spark.kernels.pdfcrypt import (
        encrypt_pdf, sniff_encryption)

    base = (b"%PDF-1.7\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" >>\nendobj\ntrailer\n<< /Root 1 0 R >>\n")
    long_pw = b"x" * 150
    enc = encrypt_pdf(base, variant="aes-256", seed=3,
                      user_password=long_pw)
    scheme, ok_full = sniff_encryption(enc, password=long_pw)
    assert scheme == "aes-256" and ok_full
    _, ok_prefix = sniff_encryption(enc, password=long_pw[:127])
    assert ok_prefix
    _, ok_wrong = sniff_encryption(enc, password=b"y" * 150)
    assert not ok_wrong
