"""Pallas TPU kernels for the sumcheck/MLE hot loops.

Each kernel is one fused VMEM pass over the evaluation table -- the
speed-of-light path for the per-round device work of
/root/reference/sum_check/src/sum_check_protocol.rs:96-108 and :168-175:

  * ``fold_pallas``            -- partial_evaluate(0, r): out = a + r*(b - a)
  * ``halves_sums_pallas``     -- [sum(first half), sum(second half)]
  * ``fold_and_halves_pallas`` -- fold at r AND the folded table's half-sums
                                  in the same HBM pass (what a sumcheck round
                                  actually needs)
  * ``gkr_round_pallas``       -- degree-d round-poly evaluations of the GKR
                                  f(b,c) SumPoly (2 products x 2 factors)
  * ``mont_mul_pallas``        -- elementwise Montgomery product

Layout: tables arrive limbs-last ``(..., size, N)`` (the host/XLA layout);
each kernel transposes its VMEM tile to limb-major ``(N, TILE)`` so the limb
axis sits on sublanes and the batch axis fills all 128 lanes (see
``limb_major``). Reductions leave the modular reduction to the host: kernels
emit exact *integer* digit sums ("lazy rows", N+2 clean 16-bit digits), which
the per-round transcript step reduces mod p -- that final step is O(1) per
round and off the hot path.

Grid-level accumulation relies on consecutive grid steps mapping to the same
output block (revisited blocks stay resident in VMEM); all index maps here are
monotone in the grid index.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb_major as lm
from .jnp_backend import FieldCtx
from .spec import LIMB_BITS

_U32 = jnp.uint32
#: extra high digits on lazy sum rows (enough headroom for 2^32-entry tables)
EXTRA = 2
#: default batch-tile; (TILE, 16) uint32 = 64 KiB per operand in VMEM
TILE = 1024


def _interpret() -> bool:
    if os.environ.get("ZKTPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def pallas_available(size: int, tile: int = TILE) -> bool:
    """True when the fused kernels handle this table size on this backend."""
    if os.environ.get("ZKTPU_PALLAS") == "0":
        return False
    if size < 4 * tile or size % tile:
        return False
    return jax.default_backend() == "tpu" or bool(
        os.environ.get("ZKTPU_PALLAS_INTERPRET")
    )


def lazy_rows_to_ints(ctx: FieldCtx, rows, from_mont: bool = True) -> list[int]:
    """(k, N+EXTRA) uint32 digit rows -> canonical ints mod p.

    Rows are exact integer sums of Montgomery-domain table entries; reducing
    mod p and stripping the Montgomery factor on host costs O(k) bigint ops.
    """
    spec = ctx.spec
    p = spec.modulus
    r_inv = pow(spec.R, -1, p) if from_mont else 1
    out = []
    for row in np.asarray(rows, dtype=np.uint64):
        acc = 0
        for i, limb in enumerate(row):
            acc += int(limb) << (LIMB_BITS * i)
        out.append(acc * r_inv % p)
    return out


def _t2l(x):
    """Tile (..., T, N) -> limb-major (N, ..., T)."""
    return jnp.moveaxis(x, -1, 0)


def _l2t(x):
    return jnp.moveaxis(x, 0, -1)


# ----------------------------------------------------------------------
# elementwise Montgomery product
# ----------------------------------------------------------------------

def _p_row(ctx):
    return jnp.asarray(ctx.p_arr, _U32).reshape(1, ctx.num_limbs)


def _p_spec(ctx, ngrid: int = 1):
    return pl.BlockSpec(
        (1, ctx.num_limbs), lambda *g: (0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.jit, static_argnums=(0,))
def mont_mul_pallas(ctx: FieldCtx, a, b):
    """Elementwise a*b*R^{-1} mod p over (size, N) tables."""
    size, n = a.shape
    tile = min(TILE, size)

    def kernel(p_ref, a_ref, b_ref, o_ref):
        pc = p_ref[...]
        o_ref[...] = _l2t(
            lm.mont_mul(ctx, _t2l(a_ref[...]), _t2l(b_ref[...]), pc)
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((size, n), _U32),
        grid=(size // tile,),
        in_specs=[
            _p_spec(ctx),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(_p_row(ctx), a, b)


# ----------------------------------------------------------------------
# fold (partial_evaluate at variable 0)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def fold_pallas(ctx: FieldCtx, table, value):
    """Fold variable 0 of (..., size, N) tables: out = a + r*(b - a)."""
    *lead, size, n = table.shape
    half = size // 2
    tile = min(TILE, half)
    lead_n = int(np.prod(lead)) if lead else 1
    flat = table.reshape(lead_n, size, n)
    hb = half // tile
    val = jnp.asarray(value, _U32).reshape(1, n)

    def kernel(p_ref, v_ref, a_ref, b_ref, o_ref):
        pc = p_ref[...]
        a = _t2l(a_ref[0])
        b = _t2l(b_ref[0])
        r = [v_ref[0, k] for k in range(n)]
        o_ref[0] = _l2t(
            lm.add(ctx, a, lm.mont_mul_scalar(ctx, r, lm.sub(ctx, b, a, pc), pc), pc)
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((lead_n, half, n), _U32),
        grid=(lead_n, hb),
        in_specs=[
            _p_spec(ctx),
            pl.BlockSpec((1, n), lambda l, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, n), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile, n), lambda l, i: (l, i + hb, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, n), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(_p_row(ctx), val, flat, flat)
    return out.reshape(*lead, half, n)


# ----------------------------------------------------------------------
# half-sums (the plain-sumcheck round polynomial)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def halves_sums_pallas(ctx: FieldCtx, table):
    """Lazy digit rows [sum(first half), sum(second half)] of a (size, N)
    table; reduce with ``lazy_rows_to_ints``."""
    size, n = table.shape
    tile = min(TILE, size // 2)
    nb = size // tile
    hb = nb // 2

    def kernel(t_ref, s_ref):
        i = pl.program_id(0)
        row = lm.lazy_sum(_t2l(t_ref[...]), EXTRA).T  # (1, N+EXTRA)

        @pl.when(i == 0)
        def _():
            s_ref[...] = jnp.zeros((2, n + EXTRA), _U32)

        @pl.when(i < hb)
        def _():
            s_ref[0:1] = s_ref[0:1] + row

        @pl.when(i >= hb)
        def _():
            s_ref[1:2] = s_ref[1:2] + row

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, n + EXTRA), _U32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (2, n + EXTRA), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(table)


# ----------------------------------------------------------------------
# fused fold + next-round half-sums (one HBM pass per sumcheck round)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def fold_and_halves_pallas(ctx: FieldCtx, table, value):
    """Fold (size, N) at r and return (folded, lazy half-sum rows of folded).

    This is one full sumcheck round's device work fused into a single pass:
    read a and b halves once, write the folded table once, and leave the next
    round polynomial as two lazy digit rows.
    """
    size, n = table.shape
    half = size // 2
    tile = min(TILE, half // 2)
    hb = half // tile
    val = jnp.asarray(value, _U32).reshape(1, n)

    def kernel(p_ref, v_ref, a_ref, b_ref, o_ref, s_ref):
        i = pl.program_id(0)
        pc = p_ref[...]
        a = _t2l(a_ref[...])
        b = _t2l(b_ref[...])
        r = [v_ref[0, k] for k in range(n)]
        folded = lm.add(
            ctx, a, lm.mont_mul_scalar(ctx, r, lm.sub(ctx, b, a, pc), pc), pc
        )
        o_ref[...] = _l2t(folded)
        row = lm.lazy_sum(folded, EXTRA).T

        @pl.when(i == 0)
        def _():
            s_ref[...] = jnp.zeros((2, n + EXTRA), _U32)

        @pl.when(i < hb // 2)
        def _():
            s_ref[0:1] = s_ref[0:1] + row

        @pl.when(i >= hb // 2)
        def _():
            s_ref[1:2] = s_ref[1:2] + row

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((half, n), _U32),
            jax.ShapeDtypeStruct((2, n + EXTRA), _U32),
        ),
        grid=(hb,),
        in_specs=[
            _p_spec(ctx),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i + hb, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, n + EXTRA), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=_interpret(),
    )(_p_row(ctx), val, table, table)


# ----------------------------------------------------------------------
# GKR composed-poly round (2 products x 2 factors, degree 2)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def gkr_round_pallas(ctx: FieldCtx, tables, degree: int = 2):
    """Lazy digit rows of the (degree+1) round-poly evaluations for a GKR
    f(b,c) SumPoly: tables (2, 2, size, N) Montgomery.

    y_t = sum over the half-cube of  sum_p prod_f (a + t*(b - a)),
    with t = 0 -> a, t = 1 -> b, t = 2 -> b + (b - a): no Montgomery
    multiplications by t needed for the quadratic GKR case.
    """
    if degree != 2:
        raise NotImplementedError("pallas GKR round kernel is specialized to degree 2")
    P, F, size, n = tables.shape
    assert (P, F) == (2, 2)
    half = size // 2
    # smaller tile than the 1-table kernels: 8 live (N, T)-sized operand sets
    tile = min(TILE // 4, half)
    hb = half // tile
    flat = tables.reshape(P * F, size, n)

    def kernel(p_ref, a_ref, b_ref, s_ref):
        i = pl.program_id(0)
        pc = p_ref[...]
        # (4, T, N) -> (4T, N) -> limb-major (N, 4T): all ops stay 2D
        # (Mosaic cannot shape-cast the modulus row to 3D)
        a = _t2l(a_ref[...].reshape(4 * tile, n))
        b = _t2l(b_ref[...].reshape(4 * tile, n))
        diff = lm.sub(ctx, b, a, pc)
        v2 = lm.add(ctx, b, diff, pc)

        def y_of(v):
            # factor lanes: [p0f0 | p0f1 | p1f0 | p1f1]
            left = jnp.concatenate([v[:, :tile], v[:, 2 * tile : 3 * tile]], axis=1)
            right = jnp.concatenate([v[:, tile : 2 * tile], v[:, 3 * tile :]], axis=1)
            prod = lm.mont_mul(ctx, left, right, pc)  # (N, 2T)
            total = lm.add(ctx, prod[:, :tile], prod[:, tile:], pc)
            return lm.lazy_sum(total, EXTRA).T  # (1, N+EXTRA)

        rows = jnp.concatenate([y_of(a), y_of(b), y_of(v2)], axis=0)

        @pl.when(i == 0)
        def _():
            s_ref[...] = rows

        @pl.when(i != 0)
        def _():
            s_ref[...] = s_ref[...] + rows

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((degree + 1, n + EXTRA), _U32),
        grid=(hb,),
        in_specs=[
            _p_spec(ctx),
            pl.BlockSpec(
                (P * F, tile, n), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P * F, tile, n), lambda i: (0, i + hb, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (degree + 1, n + EXTRA), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(_p_row(ctx), flat, flat)
