"""Sumcheck protocol tests: round-trips, forgeries, known vectors,
cross-checked against the exact host oracle for transcript bit-exactness."""

import numpy as np

from zktpu.field.spec import BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.poly.composed import ProductPoly, SumPoly
from zktpu.poly.univariate import UnivariatePoly
from zktpu.sumcheck import protocol as sc
from zktpu.transcript import Transcript

FQ = BN254_FQ


def _mle(values):
    return MultilinearPoly.from_ints(fb.get_ctx(FQ), values)


def test_prove_verify_roundtrip_small():
    poly = _mle([0, 3, 2, 5])
    proof = sc.prove(poly)
    assert proof.claimed_sum == 10
    assert sc.verify(poly, proof)


def test_prove_verify_roundtrip_2e12_constant():
    """Scaled-down version of the reference's 2^20 test
    (sum_check_protocol.rs:193-204); the full scale runs in bench.py."""
    poly = _mle([10] * (1 << 12))
    proof = sc.prove(poly)
    assert proof.claimed_sum == 10 * (1 << 12)
    assert sc.verify(poly, proof)


def test_invalid_proof_doesnt_verify():
    """sum_check_protocol.rs:206-222."""
    poly = _mle([0, 3, 2, 5])
    false_proof = sc.Proof(claimed_sum=20, proof_polynomials=[[3, 9], [1, 2]])
    assert not sc.verify(poly, false_proof)


def test_tampered_round_poly_fails():
    poly = _mle([1, 2, 3, 4, 5, 6, 7, 8])
    proof = sc.prove(poly)
    proof.proof_polynomials[1][0] = (proof.proof_polynomials[1][0] + 1) % FQ.modulus
    assert not sc.verify(poly, proof)


def test_gkr_round_poly_known_vector():
    """sum_check_protocol.rs:225-245: round poly through (0,20),(1,68),(2,156)."""
    ctx = fb.get_ctx(FQ)
    p1 = ProductPoly.from_ints(ctx, [[0, 3, 2, 5], [0, 6, 4, 10]])
    p2 = ProductPoly.from_ints(ctx, [[0, 1, 1, 2], [0, 2, 2, 4]])
    sp = SumPoly(ctx, [p1, p2])

    tables = sc._sum_poly_tables(sp)
    ys = sc._to_ints(ctx, sc.gkr_round_kernel(ctx, tables, sp.get_degree()))
    assert ys == [20, 68, 156]

    want = UnivariatePoly.interpolate(FQ, [(0, 20), (1, 68), (2, 156)])
    got = UnivariatePoly.interpolate(FQ, list(enumerate(ys)))
    assert got.coefficients == want.coefficients


def test_gkr_prove_verify():
    """sum_check_protocol.rs:247-269."""
    ctx = fb.get_ctx(FQ)
    p1 = ProductPoly.from_ints(ctx, [[0, 0, 0, 2], [0, 0, 0, 3]])
    p2 = ProductPoly.from_ints(ctx, [[0, 0, 0, 2], [0, 0, 0, 3]])
    sp = SumPoly(ctx, [p1, p2])

    t1 = Transcript(FQ)
    t2 = Transcript(FQ)
    proof = sc.gkr_prove(12, sp, t1)
    result = sc.gkr_verify(proof.proof_polynomials, proof.claimed_sum, t2, FQ)
    assert result.verified
    # prover and verifier transcripts agree
    assert result.random_challenges == proof.random_challenges


def test_gkr_round_kernel_matches_unfused_path():
    """The fused round kernel must equal partial_evaluate+reduce+sum."""
    ctx = fb.get_ctx(FQ)
    rng = np.random.default_rng(0)
    evals = [[int(x) for x in rng.integers(0, 1 << 30, size=8)] for _ in range(4)]
    sp = SumPoly(
        ctx,
        [ProductPoly.from_ints(ctx, evals[:2]), ProductPoly.from_ints(ctx, evals[2:])],
    )
    tables = sc._sum_poly_tables(sp)
    ys_fused = sc._to_ints(ctx, sc.gkr_round_kernel(ctx, tables, 2))
    for t, y in enumerate(ys_fused):
        folded = sp.partial_evaluate(sp.products[0].factors[0].encode_scalar(t))
        reduced = folded.reduce_table()
        want = int(ctx.unpack(np.asarray(fb.from_mont(ctx, fb.field_sum(ctx, reduced, axis=0)))))
        assert y == want


def test_proof_is_deterministic():
    """Same input -> identical proof (determinism contract, SURVEY.md 5.2)."""
    poly = _mle(list(range(16)))
    p1 = sc.prove(poly)
    p2 = sc.prove(poly)
    assert p1.proof_polynomials == p2.proof_polynomials
    assert p1.claimed_sum == p2.claimed_sum
