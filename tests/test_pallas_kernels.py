"""Pallas hot-op kernels vs the jnp backend: bit-exact parity.

Runs in interpreter mode on the CPU mesh (ZKTPU_PALLAS_INTERPRET); the same
kernels compile natively under Mosaic on TPU (exercised by bench.py and the
driver's entry check). Values must match the jnp backend bit-for-bit -- the
jnp backend itself is pinned to arkworks vectors in test_field_backend.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    """Interpret-mode only for THIS module. A module-level os.environ
    assignment executes at pytest collection time and leaks into every other
    test file, sending the whole CPU suite down the TPU-only jit paths (the
    unrolled point-op programs then segfault XLA:CPU)."""
    mp = pytest.MonkeyPatch()
    mp.setenv("ZKTPU_PALLAS_INTERPRET", "1")
    yield
    mp.undo()

from zktpu.field.spec import BLS12_381_FR, BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.field import limb_major as lm
from zktpu.field import pallas_kernels as pk
from zktpu.sumcheck.protocol import fold_tables_kernel, gkr_round_kernel

SIZE = 4096


@pytest.fixture(scope="module")
def data():
    ctx = fb.get_ctx(BLS12_381_FR)
    rng = np.random.default_rng(7)
    p = ctx.spec.modulus
    vals = [int(a) * int(b) % p for a, b in rng.integers(0, 2**62, size=(SIZE, 2))]
    a = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals)))
    b = jnp.roll(a, 1, axis=0)
    return ctx, p, vals, a, b


def test_limb_major_matches_jnp_backend(data):
    ctx, p, vals, a, b = data
    at = jnp.moveaxis(a, -1, 0)
    bt = jnp.moveaxis(b, -1, 0)
    for name, lm_fn, fb_fn in (
        ("add", lm.add, fb.add),
        ("sub", lm.sub, fb.sub),
        ("mont_mul", lm.mont_mul, fb.mont_mul),
    ):
        got = np.asarray(jnp.moveaxis(lm_fn(ctx, at, bt), 0, -1))
        ref = np.asarray(fb_fn(ctx, a, b))
        assert np.array_equal(got, ref), name


def test_mont_mul_pallas(data):
    ctx, p, vals, a, b = data
    ref = np.asarray(fb.mont_mul(ctx, a, b))
    got = np.asarray(pk.mont_mul_pallas(ctx, a, b))
    assert np.array_equal(ref, got)


def test_fold_pallas_and_leading_dims(data):
    ctx, p, vals, a, b = data
    r = fb.to_mont(ctx, jnp.asarray(ctx.pack(987654321)))
    ref = np.asarray(fold_tables_kernel(ctx, a, r))
    assert np.array_equal(ref, np.asarray(pk.fold_pallas(ctx, a, r)))
    tables = jnp.stack([jnp.stack([a, b]), jnp.stack([b, a])])
    ref4 = np.asarray(fold_tables_kernel(ctx, tables, r))
    assert np.array_equal(ref4, np.asarray(pk.fold_pallas(ctx, tables, r)))


def test_halves_sums_pallas(data):
    ctx, p, vals, a, b = data
    rows = pk.halves_sums_pallas(ctx, a)
    assert pk.lazy_rows_to_ints(ctx, rows) == [
        sum(vals[: SIZE // 2]) % p,
        sum(vals[SIZE // 2 :]) % p,
    ]


def test_fold_and_halves_pallas(data):
    ctx, p, vals, a, b = data
    r = fb.to_mont(ctx, jnp.asarray(ctx.pack(31337)))
    ref_f = fold_tables_kernel(ctx, a, r)
    folded, rows = pk.fold_and_halves_pallas(ctx, a, r)
    assert np.array_equal(np.asarray(ref_f), np.asarray(folded))
    fv = [int(v) for v in ctx.unpack(np.asarray(fb.from_mont(ctx, ref_f)))]
    assert pk.lazy_rows_to_ints(ctx, rows) == [
        sum(fv[: SIZE // 4]) % p,
        sum(fv[SIZE // 4 :]) % p,
    ]


def test_gkr_round_pallas(data):
    ctx, p, vals, a, b = data
    tables = jnp.stack([jnp.stack([a, b]), jnp.stack([b, a])])
    ref_ys = gkr_round_kernel(ctx, tables, 2)
    ref_ints = [int(v) for v in ctx.unpack(np.asarray(fb.from_mont(ctx, ref_ys)))]
    rows = pk.gkr_round_pallas(ctx, tables, 2)
    assert pk.lazy_rows_to_ints(ctx, rows) == ref_ints


def test_limb_major_wide_field():
    """24-limb (BLS12-381 Fq) path: the curve-coordinate width."""
    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(3)
    p = ctx.spec.modulus
    vals = [int(a) * int(b) % p for a, b in rng.integers(0, 2**62, size=(256, 2))]
    a = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals)))
    b = jnp.roll(a, 3, axis=0)
    at, bt = jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)
    got = np.asarray(jnp.moveaxis(lm.mont_mul(ctx, at, bt), 0, -1))
    assert np.array_equal(got, np.asarray(fb.mont_mul(ctx, a, b)))


def test_lazy_sum_headroom():
    """65536 max-value digit columns: the lazy-sum uint32 bound is tight."""
    ctx = fb.get_ctx(BLS12_381_FR)
    x = jnp.full((16, 1 << 16), 0xFFFF, jnp.uint32)
    rows = np.asarray(lm.lazy_sum(x, 2))
    total = sum(int(v) << (16 * i) for i, v in enumerate(rows[:, 0]))
    assert total == (2**256 - 1) * (1 << 16)


def test_point_add_px_edge_cases():
    """The Pallas add kernel's predicated-doubling fix must match the
    branchless host path on a batch mixing: distinct adds, P + P (doubling),
    P + (-P), P + inf, inf + P, inf + inf."""
    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc
    from zktpu.curve import lm_point as lp
    from zktpu.curve.pallas_point import point_add_px

    g = hc.G1_GEN
    p2 = hc.multiply(g, 2)
    p3 = hc.multiply(g, 3)
    lhs_host = [g, p3, p3, g, None, None]
    rhs_host = [p2, p3, hc.neg(p3), None, g, None]
    expect = [hc.add(a, b) for a, b in zip(lhs_host, rhs_host)]

    lhs = lp.to_lm(dc.pack_points(lhs_host))
    rhs = lp.to_lm(dc.pack_points(rhs_host))
    out = point_add_px(lhs, rhs)
    got = dc.unpack_points(lp.from_lm(out))
    assert got == expect
