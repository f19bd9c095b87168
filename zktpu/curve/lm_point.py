"""Limb-major BLS12-381 G1 Jacobian point arithmetic.

Same formulas and branchless edge handling as ``zktpu.curve.device``
(dbl-2009-l / add-2007-bl, infinity encoded as Z == 0), but over the
limb-MAJOR tile layout of ``zktpu.field.limb_major``: a batch of points is a
(X, Y, Z) tuple of ``(24, B)`` uint32 Montgomery digit arrays, limbs on
sublanes and batch on lanes. On a TPU vector register the lanes-last
``(B, 24)`` layout of ``device.py`` uses 24 of 128 lanes; flipping the axes
gives full lane utilization and (measured) ~6x cheaper XLA compiles per
point-op site.

Everything here is pure jnp on static shapes, so the SAME function body
traces both inside ``pl.pallas_call`` (the production TPU path,
``zktpu.curve.pallas_point``) and as plain XLA (the CPU/test path) --
bit-identical field values to ``device.point_add``/``point_double``.

Replaces the arkworks group-op layer of the reference on the MSM hot path
(/root/reference/pcs/src/kzg_pcs/kzg.rs:131-144).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import jnp_backend as fb
from ..field import limb_major as lm
from ..field.spec import BLS12_381_FQ

FQ_CTX = fb.get_ctx(BLS12_381_FQ)

_U32 = jnp.uint32


def is_zero_lm(a):
    """(L, B) digits == 0 -> (B,) bool."""
    return jnp.all(a == 0, axis=0)


def where_pt(mask, a, b):
    """Per-lane select over (X, Y, Z) limb-major triples; mask: (B,)."""
    m = mask[None]
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def point_double_lm(ctx, pt, p_col=None, unroll: bool = True):
    """dbl-2009-l on limb-major coords; infinity -> infinity (Z3 = 2YZ).

    ``unroll``: unrolled CIOS (Mosaic kernels) vs fori_loop CIOS (plain-XLA
    fallback, ~20x lighter to compile; identical values).
    """
    X, Y, Z = pt
    mul_impl = lm.mont_mul if unroll else lm.mont_mul_loop
    mul = lambda a, b: mul_impl(ctx, a, b, p_col)
    addf = lambda a, b: lm.add(ctx, a, b, p_col)
    subf = lambda a, b: lm.sub(ctx, a, b, p_col)
    dblf = lambda a: lm.add(ctx, a, a, p_col)

    A = mul(X, X)
    B = mul(Y, Y)
    C = mul(B, B)
    xb = addf(X, B)
    D = dblf(subf(subf(mul(xb, xb), A), C))
    E = addf(dblf(A), A)
    F = mul(E, E)
    X3 = subf(F, dblf(D))
    eight_c = dblf(dblf(dblf(C)))
    Y3 = subf(mul(E, subf(D, X3)), eight_c)
    Z3 = dblf(mul(Y, Z))
    return (X3, Y3, Z3)


def point_add_parts(ctx, p1, p2, p_col=None, unroll: bool = True):
    """add-2007-bl core: returns (added, is_double, p1_inf, p2_inf) WITHOUT
    computing the doubling path. ``added`` is garbage on lanes where
    ``is_double`` holds (H == r == 0) -- the caller patches those, either
    branchlessly (``point_add_lm``) or predicated on ``any(is_double)``
    (``pallas_point``: a real doubling inside an MSM batch is rare, and the
    unconditional double costs ~10 extra CIOS muls per lane)."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    mul_impl = lm.mont_mul if unroll else lm.mont_mul_loop
    mul = lambda a, b: mul_impl(ctx, a, b, p_col)
    addf = lambda a, b: lm.add(ctx, a, b, p_col)
    subf = lambda a, b: lm.sub(ctx, a, b, p_col)
    dblf = lambda a: lm.add(ctx, a, a, p_col)

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(Y1, mul(Z2, Z2Z2))
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = subf(U2, U1)
    rr = dblf(subf(S2, S1))
    H2 = dblf(H)
    I = mul(H2, H2)
    J = mul(H, I)
    V = mul(U1, I)
    X3 = subf(subf(mul(rr, rr), J), dblf(V))
    Y3 = subf(mul(rr, subf(V, X3)), dblf(mul(S1, J)))
    z12 = addf(Z1, Z2)
    Z3 = mul(subf(subf(mul(z12, z12), Z1Z1), Z2Z2), H)
    added = (X3, Y3, Z3)

    p1_inf = is_zero_lm(Z1)
    p2_inf = is_zero_lm(Z2)
    h_zero = is_zero_lm(H)
    r_zero = is_zero_lm(rr)
    both = jnp.logical_and(jnp.logical_not(p1_inf), jnp.logical_not(p2_inf))
    is_double = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    return added, is_double, p1_inf, p2_inf


def point_add_lm(ctx, p1, p2, p_col=None, unroll: bool = True):
    """add-2007-bl with branchless infinity/doubling handling (identical
    select logic to ``device.point_add``)."""
    added, is_double, p1_inf, p2_inf = point_add_parts(ctx, p1, p2, p_col, unroll)
    doubled = point_double_lm(ctx, p1, p_col, unroll)

    out = where_pt(is_double, doubled, added)
    out = where_pt(p1_inf, p2, out)
    out = where_pt(p2_inf, p1, out)
    return out


# ----------------------------------------------------------------------
# layout conversion (lanes-last <-> limb-major)
# ----------------------------------------------------------------------

def to_lm(pt):
    """device.py (B, 24)-tuple -> limb-major (24, B)-tuple."""
    return tuple(jnp.swapaxes(t, -1, -2) for t in pt)


def from_lm(pt):
    """limb-major (24, B)-tuple -> lanes-last (B, 24)-tuple."""
    return tuple(jnp.swapaxes(t, -1, -2) for t in pt)


def infinity_lm(ctx, width: int):
    """(X, Y, Z) = (0, 1, 0) in Montgomery limb-major layout."""
    zero = jnp.zeros((ctx.num_limbs, width), _U32)
    one = jnp.broadcast_to(
        jnp.asarray(ctx.one_mont, _U32)[:, None], (ctx.num_limbs, width)
    )
    return (zero, one, zero)
