"""Canonical proof serialization (SURVEY.md section 5.4): exact round trips
and cross-path byte equality. The reference has no byte format at all
(/root/reference/gkr/src/gkr_protocol.rs:24-29), so these bytes ARE the
interchange contract."""

import numpy as np
import pytest

from zktpu import serialize as ser
from zktpu.curve import bls12_381 as hc
from zktpu.field import jnp_backend as fb
from zktpu.field.spec import BLS12_381_FR, BN254_FQ
from zktpu.gkr import protocol as gkr
from zktpu.gkr.circuit import Circuit, ADD, MUL
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.sumcheck import protocol as sumcheck

ctx = fb.get_ctx(BLS12_381_FR)


def test_g1_roundtrip():
    pts = [None, hc.G1_GEN, hc.multiply(hc.G1_GEN, 123456789),
           hc.neg(hc.multiply(hc.G1_GEN, 7))]
    for pt in pts:
        blob = ser.encode_g1(pt)
        assert len(blob) == ser.G1_BYTES
        assert ser.decode_g1(ser.Reader(blob)) == pt


def test_g1_both_sign_classes():
    """Some multiple has the larger root, some the smaller; both must survive."""
    seen = set()
    for k in range(1, 20):
        pt = hc.multiply(hc.G1_GEN, k)
        blob = ser.encode_g1(pt)
        seen.add(blob[-1] & 0x80)
        assert ser.decode_g1(ser.Reader(blob)) == pt
    assert seen == {0, 0x80}


def test_g2_roundtrip():
    pts = [None, hc.G2_GEN, hc.multiply(hc.G2_GEN, 987654321),
           hc.neg(hc.multiply(hc.G2_GEN, 12))]
    for pt in pts:
        blob = ser.encode_g2(pt)
        assert len(blob) == ser.G2_BYTES
        got = ser.decode_g2(ser.Reader(blob))
        if pt is None:
            assert got is None
        else:
            assert got[0].coeffs == pt[0].coeffs and got[1].coeffs == pt[1].coeffs


def test_field_rejects_non_canonical():
    blob = (BLS12_381_FR.modulus).to_bytes(32, "little")
    with pytest.raises(ValueError):
        ser.decode_field(ser.Reader(blob))


def test_plain_sumcheck_proof_roundtrip():
    bn_ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(5)
    poly = MultilinearPoly.from_ints(
        bn_ctx, [int(v) for v in rng.integers(0, 1 << 60, size=16)]
    )
    proof = sumcheck.prove(poly)
    blob = ser.encode_sumcheck_proof(proof, BN254_FQ)
    back = ser.decode_sumcheck_proof(blob, BN254_FQ)
    assert back.claimed_sum == proof.claimed_sum
    assert back.proof_polynomials == proof.proof_polynomials
    assert ser.encode_sumcheck_proof(back, BN254_FQ) == blob


def test_gkr_proof_roundtrip_and_cross_path_bytes():
    """Lazy and dense provers must emit byte-identical GkrProof blobs, and
    a decoded blob must still verify."""
    structure = [[ADD, ADD, ADD, ADD], [MUL, ADD], [ADD]]
    circuit = Circuit(ctx, structure)
    inputs = [5, 2, 2, 4, 10, 0, 3, 3]
    p_lazy = gkr.prove(circuit, inputs, taus=[11, 7, 13], lazy=True)
    p_dense = gkr.prove(circuit, inputs, taus=[11, 7, 13], lazy=False)

    blob_lazy = ser.encode_gkr_proof(p_lazy)
    blob_dense = ser.encode_gkr_proof(p_dense)
    assert blob_lazy == blob_dense

    back = ser.decode_gkr_proof(blob_lazy)
    assert ser.encode_gkr_proof(back) == blob_lazy
    assert gkr.verify(back, circuit)
