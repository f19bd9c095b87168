"""Polynomial layer tests, pinned to the reference's known-answer vectors."""

import numpy as np

from zktpu.field.spec import BN254_FQ, BLS12_381_FR
from zktpu.field import jnp_backend as fb
from zktpu.poly.univariate import UnivariatePoly
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.poly.composed import ProductPoly, SumPoly

FQ = BN254_FQ
P = FQ.modulus


# -- univariate: vectors from univariate_polynomial_dense.rs tests ---------

def test_univariate_degree():
    poly = UnivariatePoly(FQ, [3, 4, 3])
    assert poly.degree() == 2


def test_univariate_evaluate():
    poly = UnivariatePoly(FQ, [3, 4, 3])
    assert poly.evaluate(3) == 42


def test_univariate_scalar_mul():
    poly = UnivariatePoly(FQ, [3, 4, 3])
    assert poly.scalar_mul(2).coefficients == [6, 8, 6]


def test_univariate_add():
    a = UnivariatePoly(FQ, [3, 4, 3])
    b = UnivariatePoly(FQ, [-3, 0, 0, 4])
    assert (a + b).coefficients == [0, 4, 3, 4]


def test_univariate_mul():
    a = UnivariatePoly(FQ, [3, 4, 3])
    b = UnivariatePoly(FQ, [-3, 0, 0, 4])
    want = [(-9) % P, (-12) % P, (-9) % P, 12, 16, 12]
    assert (a * b).coefficients == want


def test_univariate_interpolate():
    pts = [(0, 2), (1, 4), (2, 6)]
    assert UnivariatePoly.interpolate(FQ, pts).coefficients == [2, 2]


def test_fibonacci_interpolation():
    """sample_tests/src/fibonacci_evaluation.rs:10-34 parity."""
    fib = [1, 1, 2, 3, 5, 8, 13, 21]
    poly = UnivariatePoly.interpolate(FQ, list(enumerate(fib)))
    for x in (2, 5, 7):
        assert poly.evaluate(x) == (poly.evaluate(x - 1) + poly.evaluate(x - 2)) % P


# -- multilinear: vectors from multilinear_polynomial_evaluation.rs --------

def _ctx():
    return fb.get_ctx(FQ)


def test_mle_partial_evaluate():
    ctx = _ctx()
    poly = MultilinearPoly.from_ints(ctx, [0, 0, 3, 10])
    res = poly.partial_evaluate(0, poly.encode_scalar(5))
    assert res.to_ints() == [15, 50]


def test_mle_full_evaluate():
    ctx = _ctx()
    poly = MultilinearPoly.from_ints(ctx, [0, 0, 3, 10])
    assert poly.evaluate_int([5, 1]) == 50


def test_mle_partial_evaluate_other_bit():
    # fixing variable 1 (LSB of the index for n=2): pairs (0,1) and (2,3)
    ctx = _ctx()
    poly = MultilinearPoly.from_ints(ctx, [1, 2, 3, 4])
    res = poly.partial_evaluate(1, poly.encode_scalar(10))
    # a + v*(b-a): [1+10*1, 3+10*1]
    assert res.to_ints() == [11, 13]


def test_tensor_add_mul():
    """gkr_protocol.rs:362-420 tensor vectors."""
    ctx = _ctx()
    a = MultilinearPoly.from_ints(ctx, [0, 2])
    b = MultilinearPoly.from_ints(ctx, [0, 3])
    add = MultilinearPoly.tensor_add_mul(ctx, a, b, "add")
    mul = MultilinearPoly.tensor_add_mul(ctx, a, b, "mul")
    assert add.to_ints() == [0, 3, 2, 5]
    assert mul.to_ints() == [0, 0, 0, 6]

    a2 = MultilinearPoly.from_ints(ctx, [0, 3])
    b2 = MultilinearPoly.from_ints(ctx, [0, 0, 0, 2])
    add2 = MultilinearPoly.tensor_add_mul(ctx, a2, b2, "add")
    mul2 = MultilinearPoly.tensor_add_mul(ctx, a2, b2, "mul")
    assert add2.to_ints() == [0, 0, 0, 2, 3, 3, 3, 5]
    assert mul2.to_ints() == [0, 0, 0, 0, 0, 0, 0, 6]


def test_mle_scale_add_sub_mul():
    ctx = _ctx()
    a = MultilinearPoly.from_ints(ctx, [1, 2, 3, 4])
    b = MultilinearPoly.from_ints(ctx, [10, 20, 30, 40])
    assert (a + b).to_ints() == [11, 22, 33, 44]
    assert (b - a).to_ints() == [9, 18, 27, 36]
    assert (a * b).to_ints() == [10, 40, 90, 160]
    assert a.scale(a.encode_scalar(7)).to_ints() == [7, 14, 21, 28]


# -- composed: vectors from composed_polynomial.rs tests -------------------

def test_product_poly_evaluates():
    ctx = _ctx()
    pp = ProductPoly.from_ints(ctx, [[0, 0, 0, 3], [0, 0, 0, 2]])
    assert _eval_product(pp, [2, 3]) == 216


def test_product_poly_partial_evaluate():
    ctx = _ctx()
    pp = ProductPoly.from_ints(ctx, [[0, 0, 0, 3], [0, 0, 0, 2]])
    enc = pp.factors[0].encode_scalar(2)
    res = pp.partial_evaluate(enc)
    assert [f.to_ints() for f in res.factors] == [[0, 6], [0, 4]]


def test_sum_poly_evaluates():
    ctx = _ctx()
    p1 = ProductPoly.from_ints(ctx, [[0, 0, 0, 3], [0, 0, 0, 2]])
    p2 = ProductPoly.from_ints(ctx, [[0, 0, 0, 4], [0, 0, 0, 5]])
    sp = SumPoly(ctx, [p1, p2])
    assert sp.evaluate_int([2, 3], p1.factors[0].encode_scalar) == 936


def test_sum_poly_partial_evaluate():
    ctx = _ctx()
    p1 = ProductPoly.from_ints(ctx, [[0, 0, 0, 3], [0, 0, 0, 2]])
    p2 = ProductPoly.from_ints(ctx, [[0, 0, 0, 4], [0, 0, 0, 5]])
    sp = SumPoly(ctx, [p1, p2])
    res = sp.partial_evaluate(p1.factors[0].encode_scalar(2))
    got = [[f.to_ints() for f in pr.factors] for pr in res.products]
    assert got == [[[0, 6], [0, 4]], [[0, 8], [0, 10]]]


def test_product_poly_rejects_mismatched_sizes():
    ctx = _ctx()
    try:
        ProductPoly.from_ints(ctx, [[0, 0, 0, 3], [0] * 8])
        raise AssertionError("should have raised")
    except ValueError:
        pass


def _eval_product(pp, values_int):
    enc = pp.factors[0].encode_scalar
    vals = [enc(v) for v in values_int]
    out = fb.from_mont(pp.ctx, pp.evaluate_mont(vals))
    return int(pp.ctx.unpack(np.asarray(out)))
