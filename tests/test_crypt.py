"""Standard security handler (pdfcore/crypt.py): primitive vectors,
handler algorithms, end-to-end encrypted-PDF extraction, error paths.

The reference has no encryption support (nothing under
/root/reference/src handles /Encrypt); this is a north-star extension
from the public spec (ISO 32000-1 §7.6, FIPS-197)."""

from __future__ import annotations

import pytest

from pdf_parser_ray.pdfcore.crypt import (
    PAD,
    Aes128,
    StandardSecurityHandler,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    compute_file_key,
    compute_o_entry,
    compute_u_entry,
    object_key,
    rc4,
)
from pdf_parser_ray.pdfcore.errors import EncryptionError, PdfError


def test_aes128_fips197_vectors():
    # FIPS-197 Appendix C.1
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = Aes128(key).encrypt_block(pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert Aes128(key).decrypt_block(ct) == pt
    # FIPS-197 Appendix B
    k2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    p2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert Aes128(k2).encrypt_block(p2).hex() == "3925841d02dc09fbdc118597196a0b32"


def test_rc4_known_vectors():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"round trip data")) == b"round trip data"


def test_cbc_roundtrip_and_padding_errors():
    key = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 64):
        data = bytes((i * 7) % 256 for i in range(n))
        enc = aes_cbc_encrypt(key, bytes(16), data)
        assert len(enc) % 16 == 0 and len(enc) >= 32
        assert aes_cbc_decrypt(key, enc) == data
    with pytest.raises(EncryptionError, match="length"):
        aes_cbc_decrypt(key, bytes(16))  # IV only
    with pytest.raises(EncryptionError, match="length"):
        aes_cbc_decrypt(key, bytes(33))
    with pytest.raises(EncryptionError, match="padding"):
        aes_cbc_decrypt(key, bytes(32))  # decrypts to garbage padding


def test_handler_algorithms_consistency():
    """O/U/file-key round-trip: a handler built from the O entry it
    computed must authenticate its own U entry, per revision."""
    for r, nbytes, mode in ((2, 5, "rc4"), (3, 16, "rc4"), (4, 16, "aesv2")):
        id0 = bytes(range(16))
        o = compute_o_entry(b"", b"", r, nbytes)
        h = StandardSecurityHandler(r, nbytes, o, -1, id0, mode)
        u = compute_u_entry(h.file_key, id0, r)
        assert h.verify_user_password(u)
        assert not h.verify_user_password(bytes(32))
        data = b"stream payload \x00\xff bytes" * 9
        enc = h.encrypt(7, 0, data)
        assert enc != data
        assert h.decrypt(7, 0, enc) == data
        # per-object keys differ by object number
        assert h.encrypt(8, 0, data) != enc
    assert len(PAD) == 32
    assert object_key(bytes(5), 1, 0, False) == object_key(bytes(5), 1, 0, False)
    assert object_key(bytes(16), 1, 0, True) != object_key(bytes(16), 1, 0, False)


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2"])
@pytest.mark.parametrize("xref_kind", ["classic", "stream", "objstm"])
def test_encrypted_pdf_extract_roundtrip(mode, xref_kind):
    from pdf_parser_ray.pdfcore import PdfDocument
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf
    from pdf_parser_ray.pdfcore.textextract import extract_text

    text = "alpha beta gamma\nsecond line here\nthird one"
    pdf = build_text_pdf(
        text, show_variant="cmap", stream_filter="flate",
        xref_kind=xref_kind, encrypt=mode,
    )
    assert b"alpha" not in pdf  # ciphertext on disk
    got, spans = extract_text(PdfDocument(pdf))
    assert got.decode() == text
    assert spans and spans[0]["start"] == 0


def test_encrypted_image_xobject_decrypts():
    from pdf_parser_ray.pdfcore import PdfDocument
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf

    px = bytes((i * 3) % 256 for i in range(3 * 4 * 3))
    pdf = build_text_pdf(
        "txt", image={"width": 3, "height": 4, "pixels": px}, encrypt="aesv2"
    )
    imgs = PdfDocument(pdf).extract_images([1])
    assert imgs[0][0]["rgb"] == px


def test_wrong_password_and_unsupported_profiles_raise():
    from pdf_parser_ray.pdfcore import PdfDocument
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf

    pdf = bytearray(build_text_pdf("secret", encrypt="rc4-128"))
    i = pdf.rindex(b"/U <")
    pdf[i + 5] = ord("f") if pdf[i + 5] != ord("f") else ord("0")
    with pytest.raises(EncryptionError, match="password"):
        PdfDocument(bytes(pdf))
    # unsupported V/R combination
    pdf2 = bytearray(build_text_pdf("secret", encrypt="rc4-128"))
    j = pdf2.rindex(b"/V 2 /R 3")
    pdf2[j : j + 9] = b"/V 5 /R 6"
    with pytest.raises(EncryptionError, match="unsupported"):
        PdfDocument(bytes(pdf2))


def test_corrupt_encrypted_pdf_raises_only_pdferror():
    """Bit-flips across an encrypted file must surface as PdfError
    (any subclass), never a foreign exception — the extract stage's
    error-channel contract."""
    from pdf_parser_ray.pdfcore import PdfDocument
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf
    from pdf_parser_ray.pdfcore.textextract import extract_text

    base = build_text_pdf("some text\nmore", encrypt="aesv2")
    for k in range(0, len(base), 37):
        b = bytearray(base)
        b[k] ^= 0x41
        try:
            got, _ = extract_text(PdfDocument(bytes(b)))
        except PdfError:
            pass
