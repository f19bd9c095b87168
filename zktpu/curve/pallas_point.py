"""Pallas TPU kernels for batched BLS12-381 G1 Jacobian point ops.

One XLA point-add call site inlines ~24 CIOS field muls (~25k HLO ops) and
costs minutes of XLA optimization PER SITE; an MSM has dozens of sites. Here
each point op is ONE Mosaic kernel -- compiled once per batch width, cached
(in-process via jit + on disk), and reused by every call site of that width.
Runtime layout is limb-major (``zktpu.curve.lm_point``): limbs on sublanes,
batch on 128-wide lanes.

Kernels:
  * ``point_add_px(p1, p2)``    -- complete Jacobian add (handles infinity,
                                   doubling, P == -Q), (24, B)-coord triples
  * ``point_double_px(p)``      -- plain double

On CPU (tests/CI) the same ``lm_point`` bodies trace as plain XLA -- identical
field values, no Mosaic. Widths are padded up to a lane multiple with
infinity points, which both ops map to identity behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.pallas_kernels import _interpret, _p_row
from . import lm_point as lp

_U32 = jnp.uint32
FQ_CTX = lp.FQ_CTX

#: lane tile for point kernels; (24, TILE) uint32 x ~40 live temporaries
TILE = 512
#: minimum padded width (one full lane vector)
MIN_W = 128


def pallas_points_available() -> bool:
    import os

    if os.environ.get("ZKTPU_PALLAS") == "0":
        return False
    return jax.default_backend() == "tpu" or bool(
        os.environ.get("ZKTPU_PALLAS_INTERPRET")
    )


def _pad_width(width: int) -> int:
    if width <= MIN_W:
        return MIN_W
    if width % TILE == 0 or width < TILE:
        # below one tile: round to a lane multiple; above: tile multiple
        m = MIN_W if width < TILE else TILE
        return -(-width // m) * m
    return -(-width // TILE) * TILE


def _pad_pts(pt, target: int):
    width = pt[0].shape[1]
    if width == target:
        return pt
    inf = lp.infinity_lm(FQ_CTX, target - width)
    return tuple(jnp.concatenate([a, b], axis=1) for a, b in zip(pt, inf))


def _coord_spec(n_limbs: int, tile: int):
    return pl.BlockSpec((n_limbs, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


def _p_spec(n_limbs: int):
    return pl.BlockSpec((1, n_limbs), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=())
def _add_impl(px, x1, y1, z1, x2, y2, z2):
    ctx = FQ_CTX
    n = ctx.num_limbs
    width = x1.shape[1]
    tile = min(TILE, width)

    def kernel(p_ref, x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr, ozr):
        pc = p_ref[...]
        p1 = (x1r[...], y1r[...], z1r[...])
        p2 = (x2r[...], y2r[...], z2r[...])
        added, is_double, p1_inf, p2_inf = lp.point_add_parts(ctx, p1, p2, pc)
        out = lp.where_pt(p1_inf, p2, added)
        out = lp.where_pt(p2_inf, p1, out)
        oxr[...], oyr[...], ozr[...] = out

        # real doublings (same point added to itself) are rare inside an MSM
        # batch; pay the ~10 extra CIOS muls only on tiles that contain one.
        # is_double excludes infinity lanes, so the fix never overlaps the
        # infinity selects above.
        @pl.when(jnp.any(is_double))
        def _():
            doubled = lp.point_double_lm(ctx, p1, pc)
            m = is_double[None]
            oxr[...] = jnp.where(m, doubled[0], oxr[...])
            oyr[...] = jnp.where(m, doubled[1], oyr[...])
            ozr[...] = jnp.where(m, doubled[2], ozr[...])

    shape = jax.ShapeDtypeStruct((n, width), _U32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(width // tile,),
        in_specs=[_p_spec(n)] + [_coord_spec(n, tile)] * 6,
        out_specs=(_coord_spec(n, tile),) * 3,
        interpret=_interpret(),
    )(px, x1, y1, z1, x2, y2, z2)


@functools.partial(jax.jit, static_argnums=())
def _double_impl(px, x, y, z):
    ctx = FQ_CTX
    n = ctx.num_limbs
    width = x.shape[1]
    tile = min(TILE, width)

    def kernel(p_ref, xr, yr, zr, oxr, oyr, ozr):
        pc = p_ref[...]
        out = lp.point_double_lm(ctx, (xr[...], yr[...], zr[...]), pc)
        oxr[...], oyr[...], ozr[...] = out

    shape = jax.ShapeDtypeStruct((n, width), _U32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(width // tile,),
        in_specs=[_p_spec(n)] + [_coord_spec(n, tile)] * 3,
        out_specs=(_coord_spec(n, tile),) * 3,
        interpret=_interpret(),
    )(px, x, y, z)


@functools.partial(jax.jit, static_argnums=())
def _add_jnp(p1, p2):
    """Plain-XLA fallback (CPU tests): loop-CIOS body, light to compile."""
    return lp.point_add_lm(FQ_CTX, p1, p2, unroll=False)


@functools.partial(jax.jit, static_argnums=())
def _double_jnp(pt):
    return lp.point_double_lm(FQ_CTX, pt, unroll=False)


def point_add_px(p1, p2):
    """Complete Jacobian add over limb-major (24, B) triples.

    Widths are padded to a tile multiple with infinities; the output keeps
    the input width.
    """
    width = p1[0].shape[1]
    if not pallas_points_available():
        return _add_jnp(p1, p2)
    target = _pad_width(width)
    p1p = _pad_pts(p1, target)
    p2p = _pad_pts(p2, target)
    out = _add_impl(_p_row(FQ_CTX), *p1p, *p2p)
    if target != width:
        out = tuple(t[:, :width] for t in out)
    return out


def point_double_px(pt):
    width = pt[0].shape[1]
    if not pallas_points_available():
        return _double_jnp(pt)
    target = _pad_width(width)
    ptp = _pad_pts(pt, target)
    out = _double_impl(_p_row(FQ_CTX), *ptp)
    if target != width:
        out = tuple(t[:, :width] for t in out)
    return out
