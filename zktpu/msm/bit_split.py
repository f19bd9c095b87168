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
