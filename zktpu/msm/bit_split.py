"""Bit-split MSM: sum_i s_i * P_i = sum_b 2^b * (sum over {i : bit b(s_i)} P_i).

TPU-shaped Pippenger relaxation: the inner sum is a full-width masked tree
reduction (log2(n) batched point adds, halving widths -- pure VPU work, no
scatter/gather), and the 2^b factors collapse into a single width-1 Horner
double chain over the 255 scalar bits. Compared to the batched ladder
(zktpu/curve/device.py: 255 full-width doubles + 255 full-width masked adds
+ a final tree), this does 255 tree reductions and NO full-width doubles --
about half the group operations, in one compact ``fori_loop`` program.

Masking is free: infinity is encoded as Z == 0, so "exclude point" is just
zeroing its Z lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curve import device as dc
from ..field.spec import LIMB_BITS

SCALAR_BITS = dc.SCALAR_BITS


def _tree_sum_static(pt):
    """Log-depth pairwise reduction over axis 0 (power-of-two width)."""
    X, Y, Z = pt
    while X.shape[0] > 1:
        half = X.shape[0] // 2
        odd = X.shape[0] - 2 * half
        lo = (X[:half], Y[:half], Z[:half])
        hi = (X[half : 2 * half], Y[half : 2 * half], Z[half : 2 * half])
        red = dc.point_add(lo, hi)
        if odd:
            red = tuple(
                jnp.concatenate([r, t[2 * half :]], axis=0)
                for r, t in zip(red, (X, Y, Z))
            )
        X, Y, Z = red
    return (X, Y, Z)


@jax.jit
def msm_bitsplit(points, scalars):
    """MSM over Jacobian limb points ((n, 24) triple) and canonical (n, 16)
    Fr scalars; returns a single Jacobian point triple ((24,) arrays)."""
    X, Y, Z = points

    def body(i, acc):
        bit_index = SCALAR_BITS - 1 - i
        limb = bit_index // LIMB_BITS
        pos = bit_index % LIMB_BITS
        bit = (
            jax.lax.dynamic_index_in_dim(scalars, limb, axis=-1, keepdims=False)
            >> pos
        ) & 1
        masked = (X, Y, jnp.where(bit.astype(bool)[..., None], Z, jnp.zeros_like(Z)))
        t = _tree_sum_static(masked)
        t = tuple(v[0] for v in t)
        acc = dc.point_double(acc)
        return dc.point_add(acc, t)

    acc0 = dc.infinity_like(())
    return jax.lax.fori_loop(0, SCALAR_BITS, body, acc0)


def msm_bitsplit_host(affine_points, scalar_ints):
    """Host points/ints in, host affine point out (test convenience)."""
    pts = dc.pack_points(affine_points)
    sc = dc.pack_scalars(scalar_ints)
    out = msm_bitsplit(pts, sc)
    return dc.unpack_points(tuple(t[None] for t in out))[0]


#: below this LAST-axis width the tree switches to one masked-fori site
_TREE_PX_DIRECT = 64


def _tree_sum_px(pt):
    """Log-depth pairwise reduction over the LAST axis of limb-major
    (24, ..., m) triples via the Pallas point kernel.

    Real halving slices while wide (bulk of the work at full lane
    efficiency), then ONE masked-roll fori site for the narrow tail --
    every Pallas site costs ~15 s of remote compile, so the level count
    must stay off the program's site bill."""
    from ..curve.pallas_point import point_add_px

    X, Y, Z = pt
    while X.shape[-1] > _TREE_PX_DIRECT:
        m = X.shape[-1]
        half = m // 2
        odd = m - 2 * half
        lead = X.shape[:-1]
        flat = lambda v: v.reshape(v.shape[0], -1)
        lo = tuple(flat(v[..., :half]) for v in (X, Y, Z))
        hi = tuple(flat(v[..., half: 2 * half]) for v in (X, Y, Z))
        red = tuple(
            v.reshape(*lead, half) for v in point_add_px(lo, hi)
        )
        if odd:
            red = tuple(
                jnp.concatenate([r, t[..., 2 * half:]], axis=-1)
                for r, t in zip(red, (X, Y, Z))
            )
        X, Y, Z = red
    m = X.shape[-1]
    if m > 1:
        from ..curve.pallas_point import point_add_px as _add

        lead = X.shape[:-1]
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (1,) * len(X.shape[:-1]) + (m,), X.ndim - 1
        )
        kp = 1 << (m - 1).bit_length()

        def body(i, pt3):
            x, y, z = pt3
            s = jnp.right_shift(jnp.int32(kp), i + 1)
            xs, ys, zs = (jnp.roll(v, -s, axis=-1) for v in (x, y, z))
            zs = jnp.where(idx + s < m, zs, 0)
            flat = lambda v: v.reshape(v.shape[0], -1)
            out = _add(
                tuple(flat(v) for v in (x, y, z)),
                tuple(flat(v) for v in (xs, ys, zs)),
            )
            return tuple(v.reshape(*lead, m) for v in out)

        X, Y, Z = jax.lax.fori_loop(
            0, (m - 1).bit_length(), body, (X, Y, Z)
        )
        X, Y, Z = X[..., :1], Y[..., :1], Z[..., :1]
    return (X, Y, Z)


@jax.jit
def msm_bitsplit_multi_px(points_lm, scalars_batch):
    """S same-size MSMs of one shared base as a bit-split ladder on the
    Pallas point kernels: ~log2(m) add sites in ONE fori program, so the
    cold remote-compile cost stays far below the windowed Pippenger
    monolith (~250 s) -- the right trade at small S*m, where the ladder's
    255 * S * m tree adds are cheap anyway (KZG get_proof at 2^12 scale).

    ``points_lm``: limb-major (24, m) triple (one shared base) or
    (24, S, m) triple (per-segment bases); ``scalars_batch``: canonical
    (S, m, 16) Fr limbs -> limb-major (24, S) Jacobian triple.
    """
    from ..curve.pallas_point import point_add_px, point_double_px
    from ..curve import lm_point as lp
    from ..curve.device import FQ_CTX

    S, m = scalars_batch.shape[:2]
    if points_lm[0].ndim == 2:
        Xb, Yb, Zb = (jnp.broadcast_to(v[:, None, :], (v.shape[0], S, m))
                      for v in points_lm)
    else:
        Xb, Yb, Zb = points_lm

    def body(i, acc):
        bit_index = SCALAR_BITS - 1 - i
        limb = bit_index // LIMB_BITS
        pos = bit_index % LIMB_BITS
        bit = (
            jax.lax.dynamic_index_in_dim(scalars_batch, limb, axis=-1,
                                         keepdims=False)
            >> pos
        ) & 1  # (S, m)
        masked = (Xb, Yb, jnp.where(bit.astype(bool)[None], Zb, 0))
        t = _tree_sum_px(masked)
        t = tuple(v[..., 0] for v in t)  # (24, S)
        acc = point_double_px(acc)
        return point_add_px(acc, t)

    acc0 = lp.infinity_lm(FQ_CTX, S)
    return jax.lax.fori_loop(0, SCALAR_BITS, body, acc0)
