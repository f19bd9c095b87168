"""Device limb arithmetic vs the exact host oracle, for every field spec."""

import random

import numpy as np
import pytest

from zktpu.field import host
from zktpu.field.spec import ALL_SPECS, BN254_FQ, BLS12_381_FQ
from zktpu.field import jnp_backend as fb


def _rand_elems(spec, n, seed):
    rng = random.Random(seed)
    special = [0, 1, 2, spec.modulus - 1, spec.modulus - 2, spec.R % spec.modulus]
    vals = special + [rng.randrange(spec.modulus) for _ in range(n - len(special))]
    return vals[:n]


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_pack_unpack_roundtrip(spec):
    ctx = fb.get_ctx(spec)
    vals = _rand_elems(spec, 10, 0)
    limbs = ctx.pack(vals)
    back = ctx.unpack(limbs)
    assert [int(x) for x in back] == vals


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    ctx = fb.get_ctx(spec)
    a_vals = _rand_elems(spec, 32, 1)
    b_vals = _rand_elems(spec, 32, 2)
    a = ctx.pack(a_vals)
    b = ctx.pack(b_vals)
    got_add = ctx.unpack(np.asarray(fb.add(ctx, a, b)))
    got_sub = ctx.unpack(np.asarray(fb.sub(ctx, a, b)))
    got_neg = ctx.unpack(np.asarray(fb.neg(ctx, a)))
    for i, (x, y) in enumerate(zip(a_vals, b_vals)):
        assert int(got_add[i]) == host.add(spec, x, y)
        assert int(got_sub[i]) == host.sub(spec, x, y)
        assert int(got_neg[i]) == host.neg(spec, x)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_mont_mul(spec):
    ctx = fb.get_ctx(spec)
    a_vals = _rand_elems(spec, 32, 3)
    b_vals = _rand_elems(spec, 32, 4)
    am = fb.to_mont(ctx, ctx.pack(a_vals))
    bm = fb.to_mont(ctx, ctx.pack(b_vals))
    prod = fb.from_mont(ctx, fb.mont_mul(ctx, am, bm))
    got = ctx.unpack(np.asarray(prod))
    for i, (x, y) in enumerate(zip(a_vals, b_vals)):
        assert int(got[i]) == host.mul(spec, x, y), f"{spec.name} idx {i}"


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_mont_roundtrip(spec):
    ctx = fb.get_ctx(spec)
    vals = _rand_elems(spec, 16, 5)
    limbs = ctx.pack(vals)
    back = ctx.unpack(np.asarray(fb.from_mont(ctx, fb.to_mont(ctx, limbs))))
    assert [int(x) for x in back] == vals


@pytest.mark.parametrize("spec", [BN254_FQ, BLS12_381_FQ], ids=lambda s: s.name)
def test_pow_and_inverse(spec):
    ctx = fb.get_ctx(spec)
    vals = [v for v in _rand_elems(spec, 10, 6) if v != 0]
    am = fb.to_mont(ctx, ctx.pack(vals))
    # pow
    e = 0xDEADBEEF12345
    got_pow = ctx.unpack(np.asarray(fb.from_mont(ctx, fb.pow_static(ctx, am, e))))
    for i, v in enumerate(vals):
        assert int(got_pow[i]) == host.pow_(spec, v, e)
    # inverse
    got_inv = ctx.unpack(np.asarray(fb.from_mont(ctx, fb.inverse(ctx, am))))
    for i, v in enumerate(vals):
        assert int(got_inv[i]) == host.inv(spec, v)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_field_sum(spec):
    ctx = fb.get_ctx(spec)
    for n in [1, 2, 3, 7, 64, 100]:
        vals = _rand_elems(spec, n, 100 + n)
        want = sum(vals) % spec.modulus
        got = ctx.unpack(np.asarray(fb.field_sum(ctx, ctx.pack(vals), axis=0)))
        assert int(got) == want


def test_bytes_packing_matches_arkworks_layout():
    spec = BN254_FQ
    ctx = fb.get_ctx(spec)
    vals = _rand_elems(spec, 8, 7)
    blob = ctx.canonical_to_bytes(ctx.pack(vals))
    assert blob == host.vec_to_bytes(spec, vals)
    back = ctx.bytes_to_canonical(blob)
    assert [int(x) for x in ctx.unpack(back)] == vals


def test_host_batch_inv():
    spec = BN254_FQ
    vals = [v for v in _rand_elems(spec, 12, 8) if v != 0]
    invs = host.batch_inv(spec, vals)
    for v, iv in zip(vals, invs):
        assert v * iv % spec.modulus == 1
