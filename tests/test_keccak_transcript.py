"""Keccak-256 and Fiat-Shamir transcript bit-exactness tests.

The transcript byte protocol (/root/reference/fiat_shamir/src/
fiat_shamir_transcript.rs:19-37) is the cross-implementation contract; Keccak
itself is pinned to public known-answer vectors (legacy 0x01 padding).
"""

import secrets

from zktpu.field.spec import BN254_FQ, BLS12_381_FR
from zktpu.field.host import vec_to_bytes
from zktpu.hash.keccak import keccak256, keccak256_batch, _keccak256_py
from zktpu.transcript import Transcript

# public Keccak-256 vectors (Ethereum-style keccak, NOT SHA3-256)
VECTORS = {
    b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
    b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
    b"testing": "5f16f4c7f149ac4f9510d9cf8cf384038ad348b3bcdc01915f95de12df9d1b02",
}


def test_keccak_known_vectors():
    for msg, want in VECTORS.items():
        assert keccak256(msg).hex() == want
        assert _keccak256_py(msg).hex() == want


def test_keccak_c_matches_python_on_random_lengths():
    for ln in [1, 100, 135, 136, 137, 271, 272, 5000]:
        msg = secrets.token_bytes(ln)
        assert keccak256(msg) == _keccak256_py(msg)


def test_keccak_batch():
    blob = secrets.token_bytes(64 * 7)
    got = keccak256_batch(blob, 64)
    for i in range(7):
        assert got[32 * i : 32 * i + 32] == keccak256(blob[64 * i : 64 * i + 64])


def test_transcript_challenge_semantics():
    # challenge = keccak(buffer); new state = that digest
    t = Transcript(BN254_FQ)
    t.append(b"zero knowledge")
    d1 = keccak256(b"zero knowledge")
    assert t.get_random_challenge() == BN254_FQ.from_le_bytes_mod_order(d1)
    # second squeeze hashes the re-appended digest
    d2 = keccak256(d1)
    assert t.get_random_challenge() == BN254_FQ.from_le_bytes_mod_order(d2)


def test_transcript_field_element_append():
    t1 = Transcript(BLS12_381_FR)
    t2 = Transcript(BLS12_381_FR)
    vals = [0, 1, BLS12_381_FR.modulus - 1, 123456789]
    t1.append_field_elements(vals)
    t2.append(vec_to_bytes(BLS12_381_FR, vals))
    assert t1.get_random_challenge() == t2.get_random_challenge()


def test_serialization_width():
    # arkworks BigInt<4>::to_bytes_le is 32 bytes for 255-bit fields
    assert len(vec_to_bytes(BLS12_381_FR, [1])) == 32
    assert vec_to_bytes(BN254_FQ, [1])[:4] == b"\x01\x00\x00\x00"
