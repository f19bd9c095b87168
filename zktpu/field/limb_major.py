"""Limb-major field arithmetic: the in-kernel (Pallas) layout.

The batched ``jnp_backend`` stores elements limbs-LAST (``(..., N)`` with N=16
uint32 lanes) -- the natural host/serialization layout, but on a TPU vector
register the 16-wide minor axis occupies only 16 of 128 lanes. Inside a Pallas
kernel we therefore flip to limbs-FIRST: a tile is ``(L, B)`` with the limb
axis on sublanes (16 or 24 rows -> 2-3 native (8,128) uint32 tiles) and the
batch axis on lanes (a multiple of 128 -> full lane utilization).

All functions here are pure jnp on static shapes, so they trace both inside
``pl.pallas_call`` kernels (the production TPU path) and as plain XLA ops (the
CPU/interpret test path). The arithmetic is the same delayed-carry CIOS /
two's-complement machinery as ``jnp_backend`` -- same field values bit-for-bit
-- with the carry cascade resolved by an unrolled Kogge-Stone sweep over the
limb axis instead of ``lax.associative_scan`` (which Mosaic does not lower).

Replaces the arkworks Montgomery bigint layer of the reference
(SURVEY.md section 2, "Native components") on the speed-of-light path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spec import LIMB_BITS, LIMB_MASK

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def _shift_up(x, d: int = 1):
    """Move values d limb positions toward the high limb (axis 0)."""
    if d >= x.shape[0]:
        return jnp.zeros_like(x)
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x[:-d], pad)


def ripple(x, bound: int):
    """Carry-propagate (L, B) lanes each < ``bound`` to clean base-2^16 digits.

    Coarse data-parallel passes until every lane <= 2^16, then an unrolled
    Kogge-Stone sweep resolves the remaining 0/1 carry cascade in log2(L)
    steps. The carry out of the top lane is discarded (callers size L so the
    true value fits) -- identical semantics to ``jnp_backend._ripple``.
    """
    while bound > 2 * LIMB_MASK:
        x = (x & _MASK) + _shift_up(x >> LIMB_BITS)
        bound = LIMB_MASK + (bound >> LIMB_BITS)
    if bound <= LIMB_MASK:
        return x
    # half-pass: lanes now <= 2^16 (2^16 "generates", 0xffff "propagates").
    # g/p stay uint32 0/1 -- Mosaic cannot pad/shift i1 vectors.
    x = (x & _MASK) + _shift_up(x >> LIMB_BITS)
    g = x >> LIMB_BITS
    p = (x == _MASK).astype(_U32)
    d = 1
    while d < x.shape[0]:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    return (x + _shift_up(g)) & _MASK


def _pad_hi(v):
    """(L, B) -> (L+1, B) with a one-limb up-shift."""
    return jnp.pad(v, [(1, 0)] + [(0, 0)] * (v.ndim - 1))


def _pad_lo(v):
    return jnp.pad(v, [(0, 1)] + [(0, 0)] * (v.ndim - 1))


def sub_raw(a, b, width: int):
    """a - b on clean (width, B) digits -> (diff mod 2^(16*width), borrow)."""
    s = _pad_lo(a + (_MASK - b))
    # +1 on digit 0 (Mosaic has no scatter: splice instead of .at[0].add)
    s = jnp.concatenate([s[0:1] + np.uint32(1), s[1:]], axis=0)
    s = ripple(s, 2 * LIMB_MASK + 1)
    return s[:width], jnp.logical_not(s[width] > 0)


def _p_col(ctx, ndim, p_col=None):
    """Modulus digits shaped (N, 1, ...) for broadcasting over batch lanes.

    Inside a Pallas kernel the caller MUST pass ``p_col`` (loaded from a
    kernel input) -- captured array constants are rejected by pallas_call."""
    if p_col is None:
        return jnp.asarray(ctx.p_arr, _U32).reshape((ctx.num_limbs,) + (1,) * (ndim - 1))
    return p_col.reshape((ctx.num_limbs,) + (1,) * (ndim - 1))


def _cond_sub_p(ctx, t, extra, p_col=None):
    """Reduce t (< 2p; ``extra`` = the 2^(16N) overflow bit) to [0, p)."""
    p_col = _p_col(ctx, t.ndim, p_col)
    diff, borrow = sub_raw(t, p_col, ctx.num_limbs)
    take_diff = jnp.logical_or(extra, jnp.logical_not(borrow))
    return jnp.where(take_diff[None], diff, t)


def add(ctx, a, b, p_col=None):
    """Modular addition of clean (N, B) digit tiles (domain-agnostic)."""
    s = ripple(_pad_lo(a + b), 2 * LIMB_MASK)
    return _cond_sub_p(ctx, s[: ctx.num_limbs], s[ctx.num_limbs] > 0, p_col)


def sub(ctx, a, b, p_col=None):
    diff, borrow = sub_raw(a, b, ctx.num_limbs)
    p_col = _p_col(ctx, a.ndim, p_col)
    fixed = ripple(_pad_lo(diff + p_col), 2 * LIMB_MASK)
    return jnp.where(borrow[None], fixed[: ctx.num_limbs], diff)


def mont_mul(ctx, a, b, p_col=None):
    """Delayed-carry CIOS on (N, B) Montgomery tiles: a*b*R^{-1} mod p.

    Same accumulator bounds as ``jnp_backend._mont_mul_impl``: each lane of t
    stays < N*2^18 + 2^17 << 2^32 for N <= 24 limbs.
    """
    n = ctx.num_limbs
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (n,) + shape)
    b = jnp.broadcast_to(b, (n,) + shape)
    p_col = _p_col(ctx, 1 + len(shape), p_col)
    n0p = np.uint32(ctx.n0p)

    t = jnp.zeros((n + 1,) + shape, dtype=_U32)
    for i in range(n):
        prod = a[i][None] * b
        t = t + _pad_lo(prod & _MASK) + _pad_hi(prod >> LIMB_BITS)

        m = ((t[0] & _MASK) * n0p) & _MASK
        prod2 = m[None] * p_col
        t = t + _pad_lo(prod2 & _MASK) + _pad_hi(prod2 >> LIMB_BITS)

        carry0 = t[0] >> LIMB_BITS
        t = jnp.concatenate(
            [t[1:2] + carry0[None], t[2:], jnp.zeros((1,) + shape, _U32)], axis=0
        )

    t = ripple(t, ctx.num_limbs * (1 << 18) + (1 << 17))
    return _cond_sub_p(ctx, t[:n], t[n] > 0, p_col)


def mont_mul_loop(ctx, a, b, p_col=None):
    """CIOS as a ``fori_loop`` over the limb index: identical field values to
    ``mont_mul`` with ~20x fewer HLO ops per call site.

    The unrolled ``mont_mul`` is right inside Mosaic kernels (software
    pipelining); this variant is for plain-XLA fallback paths (CPU tests)
    where each point-op call site would otherwise cost minutes of XLA
    optimization time.
    """
    import jax

    n = ctx.num_limbs
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (n,) + shape)
    b = jnp.broadcast_to(b, (n,) + shape)
    p_col = _p_col(ctx, 1 + len(shape), p_col)
    p_full = jnp.broadcast_to(p_col, (n,) + shape)
    n0p = np.uint32(ctx.n0p)

    def body(i, t):
        a_i = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)
        prod = a_i[None] * b
        t = t + _pad_lo(prod & _MASK) + _pad_hi(prod >> LIMB_BITS)
        m = ((t[0] & _MASK) * n0p) & _MASK
        prod2 = m[None] * p_full
        t = t + _pad_lo(prod2 & _MASK) + _pad_hi(prod2 >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS
        return jnp.concatenate(
            [t[1:2] + carry0[None], t[2:], jnp.zeros((1,) + shape, _U32)], axis=0
        )

    # derive the carry init from the inputs (a & 0) so that under shard_map
    # it carries the operands' varying manual axes -- a literal jnp.zeros is
    # unvarying and lax.fori_loop rejects the carry-type mismatch
    zero = jnp.broadcast_to((a[:1] | b[:1]) & _U32(0), (n + 1,) + shape)
    t = jax.lax.fori_loop(0, n, body, zero)
    t = ripple(t, ctx.num_limbs * (1 << 18) + (1 << 17))
    return _cond_sub_p(ctx, t[:n], t[n] > 0, p_col)


def mont_mul_scalar(ctx, a_limbs, b, p_col=None):
    """CIOS with a *scalar* left operand: ``a_limbs`` is a list of N traced
    uint32 scalars (one field element's digits, e.g. read from SMEM).

    Avoids the (N,1)->(N,B) vector broadcast of the generic ``mont_mul`` that
    Mosaic cannot lower when the operand derives from a (1,1) slice; scalar *
    vector products are natively supported.
    """
    n = ctx.num_limbs
    shape = b.shape[1:]
    p_col = _p_col(ctx, b.ndim, p_col)
    p_full = jnp.broadcast_to(p_col, (n,) + shape)
    n0p = np.uint32(ctx.n0p)

    t = jnp.zeros((n + 1,) + shape, dtype=_U32)
    for i in range(n):
        prod = a_limbs[i] * b
        t = t + _pad_lo(prod & _MASK) + _pad_hi(prod >> LIMB_BITS)

        m = ((t[0] & _MASK) * n0p) & _MASK
        prod2 = m[None] * p_full
        t = t + _pad_lo(prod2 & _MASK) + _pad_hi(prod2 >> LIMB_BITS)

        carry0 = t[0] >> LIMB_BITS
        t = jnp.concatenate(
            [t[1:2] + carry0[None], t[2:], jnp.zeros((1,) + shape, _U32)], axis=0
        )

    t = ripple(t, ctx.num_limbs * (1 << 18) + (1 << 17))
    return _cond_sub_p(ctx, t[:n], t[n] > 0, p_col)


def lazy_sum(x, extra_limbs: int = 2):
    """Exact integer sum of clean (N, B) digit columns along the batch axis.

    Returns clean (N + extra_limbs,) digits of the *integer* sum (NOT reduced
    mod p): plain uint32 lane sums (exact while B <= 2^16) followed by one
    ripple. Callers reduce mod p on host or chain through ``ripple`` when
    accumulating across tiles.
    """
    assert x.shape[-1] <= (1 << 16)
    pad = [(0, extra_limbs)] + [(0, 0)] * (x.ndim - 1)
    # int32 view: Mosaic lacks unsigned reductions; two's-complement addition
    # is bitwise identical and the true sum stays < 2^32
    acc = jnp.sum(jnp.pad(x, pad).astype(jnp.int32), axis=-1, keepdims=True)
    return ripple(acc.astype(_U32), (1 << 16) * LIMB_MASK + 1)
