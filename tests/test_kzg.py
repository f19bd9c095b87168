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


def test_commit_with_proof_pair_batched_matches_separate():
    """The single-ladder fused path (commitment as two basis-half segments +
    2n quotient segments in one batched MSM) must equal the separate
    commit/get_proof results exactly."""
    import numpy as np

    from zktpu.field import jnp_backend as fb
    from zktpu.field.spec import BLS12_381_FR
    from zktpu.pcs.kzg import KZG
    from zktpu.poly.multilinear import MultilinearPoly

    ctx = fb.get_ctx(BLS12_381_FR)
    rng = np.random.default_rng(29)
    n_vars = 4
    vals = [int(v) for v in rng.integers(0, 1 << 61, size=1 << n_vars)]
    poly = MultilinearPoly.from_ints(ctx, vals)
    taus = [int(t) for t in rng.integers(2, 1 << 60, size=n_vars)]
    kzg = KZG.setup(n_vars, taus)
    r_b = [int(v) for v in rng.integers(1, 1 << 60, size=n_vars)]
    r_c = [int(v) for v in rng.integers(1, 1 << 60, size=n_vars)]
    vb, vc = kzg.open(r_b, poly), kzg.open(r_c, poly)

    commitment = kzg.commit(poly)
    pb = kzg.get_proof(vb, r_b, poly)
    pc = kzg.get_proof(vc, r_c, poly)

    c2, pb2, pc2 = kzg.commit_with_proof_pair(
        (vb, r_b), (vc, r_c), poly, _force_batched=True
    )
    assert c2 == commitment
    assert pb2 == pb
    assert pc2 == pc
    assert KZG.verify(c2, vb, pb2, r_b, kzg.g2_taus)


def test_msm_bitsplit_multi_px_per_segment_bases():
    """Ladder multi-MSM with per-segment bases vs host naive."""
    import numpy as np
    import jax.numpy as jnp

    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc
    from zktpu.curve import lm_point as lp
    from zktpu.msm.bit_split import msm_bitsplit_multi_px

    rng = np.random.default_rng(33)
    m, S = 4, 3
    bases = [[hc.multiply(hc.G1_GEN, int(k)) for k in
              rng.integers(1, 1 << 30, size=m)] for _ in range(S)]
    scalars = [[int(v) for v in rng.integers(1, 1 << 62, size=m)]
               for _ in range(S)]
    pts_lm = tuple(
        jnp.stack([lp.to_lm(dc.pack_points(b))[i] for b in bases], axis=1)
        for i in range(3)
    )
    sc = jnp.stack([dc.pack_scalars(s) for s in scalars])
    out = msm_bitsplit_multi_px(pts_lm, sc)
    got = dc.unpack_points(tuple(jnp.swapaxes(v, 0, 1) for v in out))
    for s in range(S):
        expect = None
        for p, k in zip(bases[s], scalars[s]):
            t = hc.multiply(p, k)
            expect = t if expect is None else hc.add(expect, t)
        assert got[s] == expect
