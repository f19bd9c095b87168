"""NTT, Merkle tree, Shamir, and Fibonacci demo tests (reference parity)."""

from zktpu.field.spec import BN254_FR, BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.poly.univariate import UnivariatePoly
from zktpu.ntt.ntt import fft_evaluate, fft_interpolate, split_poly
from zktpu.merkle.tree import MerkleTree, MerkleProof, ProofData, LeafSide
from zktpu import shamir
from zktpu.fibonacci import fibonacci_check

FR = BN254_FR
FQ = BN254_FQ


# -- NTT: fft.rs test vectors ---------------------------------------------

def test_split_poly():
    """fft.rs:88-101."""
    p = FR.modulus
    poly = [2, (-14) % p, 2, 1]
    even, odd = split_poly(poly)
    assert even == [2, 2]
    assert odd == [(-14) % p, 1]


def test_fft_evaluate_matches_direct():
    """fft.rs:104-125: evaluations at the 4th roots of unity."""
    coeffs = [1, 2, 3, 4]
    poly = UnivariatePoly(FR, coeffs)
    got = fft_evaluate(poly)
    omega = FR.root_of_unity(4)
    p = FR.modulus
    want = [poly.evaluate(pow(omega, i, p)) for i in range(4)]
    assert got == want


def test_fft_roundtrip():
    """fft.rs:127-138 + a larger power-of-two size."""
    for coeffs in ([1, 2, 3, 4], list(range(1, 257))):
        poly = UnivariatePoly(FR, coeffs)
        evals = fft_evaluate(poly)
        back = fft_interpolate(FR, evals)
        assert back.coefficients == coeffs


def test_fft_rejects_non_pow2():
    try:
        fft_evaluate(UnivariatePoly(FR, [1, 2, 3]))
        raise AssertionError("should have raised")
    except ValueError:
        pass


# -- Merkle: merkle_tree.rs tests -----------------------------------------

def test_merkle_create_and_root():
    """merkle_tree.rs:222-251."""
    t = MerkleTree(FQ, 2)
    assert len(t.leaves) == 4
    assert len(t.tree) == 2
    assert [len(l) for l in t.tree] == [2, 1]
    h1 = t.hash_pair(0, 0)
    h2 = t.hash_pair(h1, h1)
    assert t.get_root_hash() == h2


def test_merkle_update_leaf():
    """merkle_tree.rs:253-273."""
    t = MerkleTree(FQ, 2)
    t.update_leaf(1, 10, is_hash=False)
    h = t.compute_hash(10)
    assert t.leaves[1] == h
    want_root = t.hash_pair(t.hash_pair(0, h), t.hash_pair(0, 0))
    assert t.get_root_hash() == want_root
    # delete = write back a raw zero hash (merkle_tree.rs:275-291)
    t.update_leaf(1, 0, is_hash=True)
    assert t.get_root_hash() == t.hash_pair(t.hash_pair(0, 0), t.hash_pair(0, 0))


def test_merkle_proof_roundtrip():
    """merkle_tree.rs:293-305."""
    t = MerkleTree(FQ, 3)
    t.update_leaf(0, 10, is_hash=False)
    proof = t.create_proof(10, 0)
    assert t.verify(proof)


def test_merkle_invalid_proof():
    """merkle_tree.rs:307-326."""
    t = MerkleTree(FQ, 2)
    fake = MerkleProof(10, [ProofData(0, LeafSide.LEFT)] * 2)
    assert not t.verify(fake)


def test_merkle_create_proof_wrong_data():
    """merkle_tree.rs:328-340."""
    t = MerkleTree(FQ, 2)
    t.update_leaf(0, 10, is_hash=False)
    try:
        t.create_proof(20, 0)
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_merkle_new_with_inputs():
    """merkle_tree.rs:342-367."""
    t = MerkleTree.new_with_inputs(FQ, 2, [1, 2, 3])
    for i, v in enumerate([1, 2, 3]):
        assert t.leaves[i] == t.compute_hash(v)
    assert t.leaves[3] == 0
    try:
        MerkleTree.new_with_inputs(FQ, 2, [1] * 5)
        raise AssertionError("should have raised")
    except ValueError:
        pass


# -- Shamir: shamir_secret_sharing.rs tests -------------------------------

def test_shamir_create_polynomial():
    poly = shamir.create_polynomial(4, 40, 6, seed=0)
    assert poly.degree() == 3
    assert poly.evaluate(6) == 40


def test_shamir_recover_known_points():
    """shamir_secret_sharing.rs:91-106: recover x^2+3x-5."""
    p = FQ.modulus
    points = [(1, (-1) % p), (2, 5), (3, 13)]
    poly = shamir.recover_polynomial(points, 3)
    assert poly.coefficients == [(-5) % p, 3, 1]
    assert shamir.get_secret(poly, 0) == (-5) % p


def test_shamir_share_and_recover():
    """shamir_secret_sharing.rs:153-169."""
    p = FQ.modulus
    secret_poly = shamir.create_polynomial(3, (-5) % p, 0, seed=42)
    shares = shamir.share_points(10, 3, secret_poly, seed=43)
    assert len(shares) == 10
    recovered = shamir.recover_polynomial(shares[2:6], 3)
    assert recovered.coefficients == secret_poly.coefficients
    assert shamir.get_secret(recovered, 0) == (-5) % p


def test_shamir_wrong_point_fails():
    p = FQ.modulus
    points = [(1, (-1) % p), (2, 5), (3, 1)]
    poly = shamir.recover_polynomial(points, 3)
    assert poly.coefficients != [(-5) % p, 3, 1]


def test_shamir_too_few_points():
    try:
        shamir.recover_polynomial([(1, 1), (2, 2)], 3)
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_shamir_too_few_shares():
    poly = shamir.create_polynomial(3, 1, 0, seed=1)
    try:
        shamir.share_points(2, 3, poly)
        raise AssertionError("should have raised")
    except ValueError:
        pass


# -- Fibonacci demo --------------------------------------------------------

def test_fibonacci_check():
    assert fibonacci_check()


def test_ntt_lm_matches_dense():
    """Limb-major four-step NTT (zktpu/ntt/ntt_lm.py) must be bit-identical
    to the dense stage ladder, including the recursive split (size > 2^11)
    and the inverse transform."""
    import numpy as np
    import jax.numpy as jnp
    from zktpu.ntt import ntt_lm as nl
    from zktpu.ntt.ntt import _ntt_kernel

    ctx = fb.get_ctx(BN254_FR)
    rng = np.random.default_rng(23)
    for logn in (6, 12):
        vals = [int(v) for v in rng.integers(0, 1 << 40, size=1 << logn)]
        table = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals)))
        for inv in (False, True):
            dense = np.asarray(_ntt_kernel(ctx, table, logn, inv))
            got = np.asarray(nl.ntt_lm(ctx, table, inv))
            assert (dense == got).all(), (logn, inv)


def test_ntt_pallas_matches_dense_interpret():
    """The fused single-program Pallas NTT (zktpu/ntt/pallas_ntt.py) must be
    bit-identical to the dense XLA ladder -- exercised here in interpret
    mode at the smallest size the two-phase schedule accepts (4 * TILE),
    forward and inverse."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    mp = pytest.MonkeyPatch()
    mp.setenv("ZKTPU_PALLAS_INTERPRET", "1")
    try:
        from zktpu.ntt import pallas_ntt as pn
        from zktpu.ntt.ntt import _ntt_kernel

        ctx = fb.get_ctx(BN254_FR)
        logn = 12
        assert pn.ntt_pallas_available(1 << logn)
        rng = np.random.default_rng(37)
        vals = [int(v) for v in rng.integers(0, 1 << 40, size=1 << logn)]
        table = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals)))
        for inv in (False, True):
            dense = np.asarray(_ntt_kernel(ctx, table, logn, inv))
            got = np.asarray(pn.ntt_pallas(ctx, table, inv))
            assert (dense == got).all(), inv
    finally:
        mp.undo()
