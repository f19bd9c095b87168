"""Device (JAX) BLS12-381 G1 arithmetic over limb arrays.

TPU-native replacement for the reference's arkworks group-op hot paths: the
Lagrange-SRS batch scalar multiplication (/root/reference/pcs/src/kzg_pcs/
kzg.rs:183-212) and the commitment MSM (:131-144).

Representation: Jacobian points as a dict-free tuple (X, Y, Z) of uint32
``(..., 24)`` Montgomery limb arrays over Fq; the point at infinity is Z == 0.
All edge cases (infinity, doubling, inverse points) are handled branchlessly
with masked selects, so the same straight-line kernel runs for every lane --
the form XLA and the TPU VPU want. BLS12-381 G1 has no 2-torsion (group order
h*r is odd), so the Y == 0 doubling edge cannot occur.

Formulas: dbl-2009-l and add-2007-bl (a = 0 short Weierstrass), plus an
automatic cancellation: when P == -Q the addition's H == 0 makes Z3 == 0,
which is exactly the infinity encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field.spec import BLS12_381_FQ, BLS12_381_FR, LIMB_BITS
from . import bls12_381 as host_curve

FQ_CTX = fb.get_ctx(BLS12_381_FQ)
FR_CTX = fb.get_ctx(BLS12_381_FR)

SCALAR_BITS = 255


# ----------------------------------------------------------------------
# host <-> device point conversion
# ----------------------------------------------------------------------

def pack_points(affine_points) -> tuple:
    """List of host affine points ((x, y) FQ pairs or None) -> Jacobian limbs."""
    xs, ys, zs = [], [], []
    for pt in affine_points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(int(pt[0].n)), ys.append(int(pt[1].n)), zs.append(1)
    to_dev = lambda v: fb.to_mont(FQ_CTX, jnp.asarray(FQ_CTX.pack(v)))
    return (to_dev(xs), to_dev(ys), to_dev(zs))


def unpack_points(jac) -> list:
    """Jacobian limb arrays -> list of host affine points (None = infinity)."""
    X, Y, Z = jac
    xs = FQ_CTX.unpack(np.asarray(fb.from_mont(FQ_CTX, X)))
    ys = FQ_CTX.unpack(np.asarray(fb.from_mont(FQ_CTX, Y)))
    zs = FQ_CTX.unpack(np.asarray(fb.from_mont(FQ_CTX, Z)))
    xs, ys, zs = (np.atleast_1d(a) for a in (xs, ys, zs))
    out = []
    p = BLS12_381_FQ.modulus
    for x, y, z in zip(xs, ys, zs):
        x, y, z = int(x), int(y), int(z)
        if z == 0:
            out.append(None)
            continue
        zinv = pow(z, -1, p)
        zinv2 = zinv * zinv % p
        out.append(
            (host_curve.FQ(x * zinv2 % p), host_curve.FQ(y * zinv2 * zinv % p))
        )
    return out


def pack_scalars(values) -> jnp.ndarray:
    """Host ints -> canonical (non-Montgomery) Fr limb arrays for ladders."""
    return jnp.asarray(FR_CTX.pack([int(v) % BLS12_381_FR.modulus for v in values]))


# ----------------------------------------------------------------------
# point kernels
# ----------------------------------------------------------------------

def _mul(a, b):
    return fb.mont_mul(FQ_CTX, a, b)


def _add_f(a, b):
    return fb.add(FQ_CTX, a, b)


def _sub_f(a, b):
    return fb.sub(FQ_CTX, a, b)


def _dbl_f(a):
    return fb.add(FQ_CTX, a, a)


def point_double(pt):
    """dbl-2009-l; maps infinity to infinity automatically (Z3 = 2YZ)."""
    X, Y, Z = pt
    A = _mul(X, X)
    B = _mul(Y, Y)
    C = _mul(B, B)
    D = _dbl_f(_sub_f(_sub_f(_mul(_add_f(X, B), _add_f(X, B)), A), C))
    E = _add_f(_dbl_f(A), A)
    F = _mul(E, E)
    X3 = _sub_f(F, _dbl_f(D))
    eight_c = _dbl_f(_dbl_f(_dbl_f(C)))
    Y3 = _sub_f(_mul(E, _sub_f(D, X3)), eight_c)
    Z3 = _dbl_f(_mul(Y, Z))
    return (X3, Y3, Z3)


def point_add(p1, p2):
    """add-2007-bl with branchless edge handling."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1 = _mul(Z1, Z1)
    Z2Z2 = _mul(Z2, Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub_f(U2, U1)
    rr = _dbl_f(_sub_f(S2, S1))
    I = _mul(_dbl_f(H), _dbl_f(H))
    J = _mul(H, I)
    V = _mul(U1, I)
    X3 = _sub_f(_sub_f(_mul(rr, rr), J), _dbl_f(V))
    Y3 = _sub_f(_mul(rr, _sub_f(V, X3)), _dbl_f(_mul(S1, J)))
    Z3 = _mul(_sub_f(_sub_f(_mul(_add_f(Z1, Z2), _add_f(Z1, Z2)), Z1Z1), Z2Z2), H)
    added = (X3, Y3, Z3)

    p1_inf = fb.is_zero(FQ_CTX, Z1)
    p2_inf = fb.is_zero(FQ_CTX, Z2)
    h_zero = fb.is_zero(FQ_CTX, H)
    r_zero = fb.is_zero(FQ_CTX, rr)
    both = jnp.logical_and(jnp.logical_not(p1_inf), jnp.logical_not(p2_inf))
    is_double = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    # note: P == -Q (h_zero & !r_zero) already yields Z3 = 0 == infinity

    doubled = point_double(p1)

    def sel(mask, a, b):
        return jnp.where(mask[..., None], a, b)

    out = tuple(sel(is_double, d, a) for d, a in zip(doubled, added))
    out = tuple(sel(p1_inf, q, o) for q, o in zip(p2, out))
    out = tuple(sel(p2_inf, p, o) for p, o in zip(p1, out))
    return out


def infinity_like(shape_prefix) -> tuple:
    N = FQ_CTX.num_limbs
    zero = jnp.zeros(shape_prefix + (N,), jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FQ_CTX.one_mont), shape_prefix + (N,)).astype(
        jnp.uint32
    )
    return (zero, one, zero)


@functools.partial(jax.jit, static_argnums=())
def batch_scalar_mul(points, scalars):
    """Per-lane scalar multiplication: out[i] = scalars[i] * points[i].

    255-step double-and-add ladder via ``lax.fori_loop`` (MSB first); every
    step is one batched double + one masked batched add across all lanes.
    ``scalars``: canonical Fr limb arrays (..., 16).
    """
    shape = scalars.shape[:-1]
    acc0 = infinity_like(shape)

    def body(i, acc):
        bit_index = SCALAR_BITS - 1 - i
        limb = bit_index // LIMB_BITS
        pos = bit_index % LIMB_BITS
        bit = (jax.lax.dynamic_index_in_dim(scalars, limb, axis=-1, keepdims=False)
               >> pos) & 1
        acc = point_double(acc)
        with_p = point_add(acc, points)
        take = bit.astype(bool)
        return tuple(jnp.where(take[..., None], w, a) for w, a in zip(with_p, acc))

    return jax.lax.fori_loop(0, SCALAR_BITS, body, acc0)


def tree_sum_points(jac):
    """Sum points along axis 0 by log-depth pairwise addition."""
    X, Y, Z = jac
    n = X.shape[0]
    while n > 1:
        half = n // 2
        lo = (X[:half], Y[:half], Z[:half])
        hi = (X[half : 2 * half], Y[half : 2 * half], Z[half : 2 * half])
        red = point_add(lo, hi)
        if n % 2:
            red = tuple(
                jnp.concatenate([r, t[2 * half :]], axis=0) for r, t in zip(red, (X, Y, Z))
            )
        X, Y, Z = red
        n = X.shape[0]
    return (X[0], Y[0], Z[0])


@jax.jit
def msm(points, scalars):
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    Batched ladder then log-depth tree reduction -- one jitted program,
    replacing the reference's sequential per-point loop (kzg.rs:139-143).
    """
    per_point = batch_scalar_mul(points, scalars)
    return tree_sum_points(per_point)


def msm_host(affine_points, scalar_ints):
    """Convenience wrapper: host points/ints in, host affine point out."""
    pts = pack_points(affine_points)
    sc = pack_scalars(scalar_ints)
    return unpack_points(tuple(t[None] for t in msm(pts, sc)))[0]


@jax.jit
def batch_generator_mul(scalars):
    """scalars[i] * G1_generator for every lane (the SRS builder)."""
    n = scalars.shape[0]
    gen = pack_points([host_curve.G1_GEN])
    rep = tuple(jnp.broadcast_to(t, (n,) + t.shape[1:]) for t in gen)
    return batch_scalar_mul(rep, scalars)
