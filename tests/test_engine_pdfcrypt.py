"""Standard security handler (`engine/pdfcrypt.py`, PDF 32000-1 §7.6) and
its integration in the PDF parse path: RC4-40/128 and AES-128-CBC for the
empty-user-password (owner-locked) case."""

import numpy as np
import pytest

from activestorage_ocr_spark.engine import pdfcrypt as pc
from activestorage_ocr_spark.engine import pdfx, rasters
from activestorage_ocr_spark.engine.extract import extract_document

PROFILES = ["rc4-40", "rc4", "aes", "aes-nometa", "aes256"]


class TestPrimitives:
    def test_aes_fips197_known_answer(self):
        # FIPS-197 appendix C.1 — pins the COMPUTED S-box construction
        key = bytes(range(16))
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = pc._encrypt_block(pt, pc._expand_key(key))
        assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
        assert pc._decrypt_block(ct, pc._expand_key(key)) == pt

    def test_sbox_spot_values(self):
        assert pc._SBOX[0x00] == 0x63
        assert pc._SBOX[0x01] == 0x7C
        assert pc._SBOX[0x53] == 0xED
        assert pc._INV_SBOX[pc._SBOX[0xAB]] == 0xAB

    def test_aes256_fips197_known_answer(self):
        # FIPS-197 appendix C.3 (256-bit key)
        key = bytes(range(32))
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = pc._encrypt_block(pt, pc._expand_key(key))
        assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
        assert pc._decrypt_block(ct, pc._expand_key(key)) == pt

    def test_r6_handler_round_trip(self):
        import hashlib

        fk = hashlib.sha256(b"filekey").digest()
        for r in (5, 6):
            vals = pc.r6_make(fk, r=r)
            got = pc.r6_authenticate_empty(
                vals["U"], vals["UE"], vals["O"], vals["OE"], r=r
            )
            assert got == fk

    def test_rc4_known_answer(self):
        assert pc.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"

    def test_cbc_round_trip(self):
        key = bytes(range(16))
        for n in (1, 15, 16, 17, 100):
            data = bytes((i * 7) % 256 for i in range(n))
            assert pc.aes_cbc_decrypt(key, pc.aes_cbc_encrypt(key, bytes(16), data)) == data

    @pytest.mark.parametrize("r,nb", [(2, 5), (3, 16), (4, 16)])
    def test_handler_empty_password_round_trip(self, r, nb):
        id0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
        o = pc.compute_o(b"", b"", r, nb)
        key = pc.derive_key(o, -44, id0, r, nb)
        u = pc.compute_u(key, id0, r)
        assert pc.authenticate_empty_user(o, u, -44, id0, r, nb) == key

    @pytest.mark.parametrize("r,nb", [(2, 5), (3, 16), (4, 16)])
    def test_user_password_rejects_empty(self, r, nb):
        id0 = bytes(16)
        o = pc.compute_o(b"owner", b"secret", r, nb)
        key = pc.derive_key(o, -44, id0, r, nb, password=b"secret")
        u = pc.compute_u(key, id0, r)
        assert pc.authenticate_empty_user(o, u, -44, id0, r, nb) is None


class TestPdfIntegration:
    @pytest.mark.parametrize("enc", PROFILES)
    def test_text_pdf_decrypts(self, enc):
        pdf = pdfx.build_text_pdf(
            [["Encrypted body with plenty of characters"]], encrypt=enc
        )
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "Encrypted body with plenty of characters"

    @pytest.mark.parametrize("enc", PROFILES)
    def test_image_pdf_decrypts(self, enc):
        img = rasters.render_text("CRYPT IMG", scale=2)
        res = extract_document(
            pdfx.build_image_pdf([(img, "DeviceGray")], encrypt=enc)
        )
        assert res["status"] == "ok"
        assert res["extracted_text"] == "CRYPT IMG"

    def test_encrypted_objstm_codec_combo(self):
        # the modern worst case: AES encryption + ObjStm layout + G4 image
        img = rasters.render_text("AES G4 OBJSTM", scale=2)
        pdf = pdfx.build_image_pdf([(img, "G4")], objstm=True, encrypt="aes")
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "AES G4 OBJSTM"

    @pytest.mark.parametrize("enc", PROFILES)
    def test_user_locked_quarantines_named(self, enc):
        pdf = pdfx.build_text_pdf(
            [["Locked body text"]], encrypt=enc, user_password=b"secret"
        )
        with pytest.raises(pdfx.PdfError, match="password-protected"):
            pdfx.parse_objects(pdf)
        res = extract_document(pdf)  # engine boundary: quarantine, no raise
        assert res["status"] != "ok"

    def test_unsupported_handler_named(self):
        pdf = bytearray(pdfx.build_text_pdf([["body"]], encrypt="rc4"))
        at = pdf.index(b"/Filter /Standard")
        pdf[at : at + 17] = b"/Filter /Custom78"
        with pytest.raises(pdfx.PdfError, match="security handler"):
            pdfx.parse_objects(bytes(pdf))

    def test_aesv3_uses_raw_file_key_not_object_key(self):
        # ISO 32000-2 §7.6.3.3: V5/AESV3 streams are encrypted with the
        # 32-byte FILE key directly — no Algorithm-1 per-object MD5
        # derivation. Simulate an externally produced PDF stream: encrypt
        # with the raw key and an IV chosen with NO knowledge of the
        # object number, then decrypt under several different (oid, gen)
        # pairs — all must succeed, proving oid/gen play no role.
        import hashlib

        fk = hashlib.sha256(b"external producer file key").digest()
        plaintext = b"externally produced AES-256 stream body"
        iv = hashlib.sha256(b"random producer iv").digest()[:16]
        ct = pc.aes_cbc_encrypt(fk, iv, plaintext)
        for oid, gen in ((1, 0), (42, 0), (9999, 3)):
            assert pc.decrypt_bytes(ct, fk, oid, gen, aes=True) == plaintext
        # and AES-128 still derives per-object keys (V4 semantics): the
        # same ciphertext under a 16-byte key must NOT decrypt raw
        k16 = fk[:16]
        ct16 = pc.aes_cbc_encrypt(pc.object_key(k16, 7, 0, True), iv, plaintext)
        assert pc.decrypt_bytes(ct16, k16, 7, 0, aes=True) == plaintext
        with pytest.raises(ValueError):
            pc.decrypt_bytes(ct16, k16, 8, 0, aes=True)  # wrong oid -> bad pad

    def test_encrypt_metadata_false_key_derivation(self):
        # 32000-1 §7.6.3.3 step f: R>=4 + /EncryptMetadata false appends
        # 0xFFFFFFFF to the MD5 input — a different file key entirely
        id0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
        o = pc.compute_o(b"", b"", 4, 16)
        k_meta = pc.derive_key(o, -44, id0, 4, 16, encrypt_metadata=True)
        k_nometa = pc.derive_key(o, -44, id0, 4, 16, encrypt_metadata=False)
        assert k_meta != k_nometa
        # R3 predates the flag: it must not change the key
        assert pc.derive_key(o, -44, id0, 3, 16, encrypt_metadata=False) == \
            pc.derive_key(o, -44, id0, 3, 16, encrypt_metadata=True)
        # auth only succeeds when the flag matches the /U derivation
        u_nometa = pc.compute_u(k_nometa, id0, 4)
        assert pc.authenticate_empty_user(
            o, u_nometa, -44, id0, 4, 16, encrypt_metadata=False
        ) == k_nometa
        assert pc.authenticate_empty_user(
            o, u_nometa, -44, id0, 4, 16, encrypt_metadata=True
        ) is None

    def test_encrypt_metadata_false_pdf_decrypts_e2e(self):
        pdf = pdfx.build_text_pdf(
            [["Unencrypted-metadata producer body"]], encrypt="aes-nometa"
        )
        assert b"/EncryptMetadata false" in pdf
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "Unencrypted-metadata producer body"

    def test_mutated_encrypted_pdfs_never_raise_at_engine(self):
        rng = np.random.RandomState(0)
        base = pdfx.build_text_pdf([["Fuzzable encrypted body"]], encrypt="aes")
        for _ in range(25):
            buf = bytearray(base)
            for _ in range(5):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            res = extract_document(bytes(buf))
            assert isinstance(res, dict) and "status" in res
