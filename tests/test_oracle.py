"""Cross-implementation check: C++ bigint oracle vs the JAX limb backend.

Two independent implementations (plain shift-subtract C++ vs Montgomery CIOS
limb kernels) agreeing on random inputs across all supported fields is the
no-Rust substitute for arkworks known-answer parity (SURVEY.md section 7d).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zktpu import oracle
from zktpu.field.spec import ALL_SPECS, BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.sumcheck.protocol import fold_tables_kernel


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_oracle_matches_python(spec):
    p = spec.modulus
    rng = np.random.default_rng(1)
    for _ in range(10):
        a = int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % p
        b = int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % p
        assert oracle.add(a, b, p) == (a + b) % p
        assert oracle.sub(a, b, p) == (a - b) % p
        assert oracle.mul(a, b, p) == a * b % p
    a = p - 3
    assert oracle.pow_(a, 5, p) == pow(a, 5, p)
    assert oracle.inverse(a, p) == pow(a, -1, p)


def test_oracle_matches_device_backend():
    spec = BN254_FQ
    p = spec.modulus
    ctx = fb.get_ctx(spec)
    rng = np.random.default_rng(2)
    vals_a = [int(x) * int(y) % p for x, y in rng.integers(0, 2**62, size=(16, 2))]
    vals_b = [int(x) * int(y) % p for x, y in rng.integers(0, 2**62, size=(16, 2))]
    a = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals_a)))
    b = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals_b)))
    got = [int(v) for v in ctx.unpack(np.asarray(fb.from_mont(ctx, fb.mont_mul(ctx, a, b))))]
    want = [oracle.mul(x, y, p) for x, y in zip(vals_a, vals_b)]
    assert got == want


def test_oracle_sumcheck_fold_matches_kernel():
    spec = BN254_FQ
    p = spec.modulus
    ctx = fb.get_ctx(spec)
    rng = np.random.default_rng(3)
    vals = [int(x) * int(y) % p for x, y in rng.integers(0, 2**62, size=(32, 2))]
    r = int(rng.integers(1, 2**61))
    table = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals)))
    folded = fold_tables_kernel(ctx, table, fb.to_mont(ctx, jnp.asarray(ctx.pack(r))))
    got = [int(v) for v in ctx.unpack(np.asarray(fb.from_mont(ctx, folded)))]
    assert got == oracle.sumcheck_fold(vals, r, p)
    assert oracle.vec_sum(vals, p) == sum(vals) % p
