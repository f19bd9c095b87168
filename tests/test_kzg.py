"""Multilinear KZG tests pinned to /root/reference/pcs/src/kzg_pcs/kzg.rs
known-answer vectors (slow: device ladders + host pairings on 2 CPUs)."""

import pytest

from zktpu.field.spec import BLS12_381_FR
from zktpu.field import jnp_backend as fb
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.pcs.kzg import KZG, eq_table_device
from zktpu.curve import bls12_381 as hc
from zktpu.curve import device as dc

ctx = fb.get_ctx(BLS12_381_FR)
POLY_EVALS = [0, 4, 0, 4, 0, 4, 3, 7]
TAUS = [5, 2, 3]
OPENING = [6, 4, 0]


@pytest.fixture(scope="module")
def kzg():
    return KZG.setup(3, TAUS)


@pytest.fixture(scope="module")
def poly():
    return MultilinearPoly.from_ints(ctx, POLY_EVALS)


def test_lagrange_basis(kzg):
    """kzg.rs:234-255: eq evals [-8,12,16,-24,10,-15,-20,30] * G1."""
    basis = dc.unpack_points(kzg.g1_lagrange_basis)
    want = [hc.multiply(hc.G1_GEN, s % hc.R_ORDER) for s in [-8, 12, 16, -24, 10, -15, -20, 30]]
    assert basis == want


def test_eq_table_values():
    import numpy as np

    eq = fb.from_mont(ctx, eq_table_device(TAUS))
    got = [int(v) for v in ctx.unpack(np.asarray(eq))]
    p = ctx.spec.modulus
    assert got == [s % p for s in [-8, 12, 16, -24, 10, -15, -20, 30]]


def test_commit(kzg, poly):
    """kzg.rs:317-341: commitment == 42 * G1."""
    assert kzg.commit(poly) == hc.multiply(hc.G1_GEN, 42)


def test_open(kzg, poly):
    """kzg.rs:344-366."""
    assert kzg.open(OPENING, poly) == 72


def test_get_proof(kzg, poly):
    """kzg.rs:369-400: quotients [6, 18, 4] * G1."""
    proof = kzg.get_proof(72, OPENING, poly)
    assert proof == [hc.multiply(hc.G1_GEN, s) for s in [6, 18, 4]]


def test_verify_roundtrip_and_forgery(kzg, poly):
    """kzg.rs:403-463."""
    commitment = kzg.commit(poly)
    opened = kzg.open(OPENING, poly)
    proof = kzg.get_proof(opened, OPENING, poly)
    assert KZG.verify(commitment, opened, proof, OPENING, kzg.g2_taus)
    assert not KZG.verify(commitment, opened, [hc.G1_GEN] * 3, OPENING, kzg.g2_taus)


def test_setup_validations():
    with pytest.raises(ValueError):
        KZG.setup(0, [])
    with pytest.raises(ValueError):
        KZG.setup(2, [1, 2, 3])


def test_get_proof_tiered_msm_sizes():
    """Quotient tiling (KZG.TIER_BITS) must not change any commitment: a
    2^6-entry opening exercises tiles for every variable past the fourth."""
    import numpy as np

    rng = np.random.default_rng(31)
    vals = [int(v) for v in rng.integers(0, 1 << 60, size=64)]
    taus = [int(t) for t in rng.integers(2, 1 << 40, size=6)]
    poly = MultilinearPoly.from_ints(ctx, vals)
    kzg = KZG.for_poly(poly, taus)
    point = [int(v) for v in rng.integers(1, 1 << 40, size=6)]
    opened = kzg.open(point, poly)
    proof = kzg.get_proof(opened, point, poly)
    commitment = kzg.commit(poly)
    assert KZG.verify(commitment, opened, proof, point, kzg.g2_taus)
    # tampered quotient must fail
    bad = list(proof)
    bad[2] = hc.add(bad[2], hc.G1_GEN)
    assert not KZG.verify(commitment, opened, bad, point, kzg.g2_taus)
