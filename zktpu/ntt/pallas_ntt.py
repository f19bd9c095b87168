"""Pallas radix-2 NTT: two-phase butterfly schedule for TPU.

The XLA-path NTT (zktpu/ntt/ntt.py) pays ~20 full HBM passes with the slower
jnp CIOS. Here, after the bit-reversal gather, the log2(n) stages split into:

  * Phase 1 (m <= TILE): ALL small-stride stages run inside one VMEM tile --
    one kernel, one HBM pass for the first log2(TILE) stages. Butterfly data
    movement happens on the sublane (batch) axis in limbs-last layout (the
    reshape Mosaic supports); operands are transposed to limb-major only for
    the CIOS arithmetic.
  * Phase 2 (m > TILE): one fused pass per remaining stage; the u and v
    halves and the twiddle block are addressed purely through BlockSpec index
    maps, so each stage is one read + one write of the table.

Identical field values to ``zktpu.ntt.ntt`` (asserted in tests); used
automatically for large power-of-two tables on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import jnp_backend as fb
from ..field import limb_major as lm
from ..field.jnp_backend import FieldCtx
from ..field.pallas_kernels import _interpret, _p_row, _p_spec
from ..field.spec import FieldSpec

_U32 = jnp.uint32
TILE = 1024


def ntt_pallas_available(n: int, tile: int = TILE) -> bool:
    import os

    if os.environ.get("ZKTPU_PALLAS") == "0":
        return False
    if n < 4 * tile or n % tile:
        return False
    return jax.default_backend() == "tpu" or bool(
        os.environ.get("ZKTPU_PALLAS_INTERPRET")
    )


@functools.lru_cache(maxsize=None)
def _stage_twiddles_np(spec: FieldSpec, log_n: int, inverse: bool):
    """Canonical host twiddle digits per stage: stage s has w_m^j, j < m/2."""
    n = 1 << log_n
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, spec.modulus)
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(omega, n // m, spec.modulus)
        tws, acc = [], 1
        for _ in range(m // 2):
            tws.append(acc)
            acc = acc * w_m % spec.modulus
        out.append(tws)
    return out


@functools.lru_cache(maxsize=None)
def _stage_twiddles_mont_np(spec: FieldSpec, log_n: int, inverse: bool):
    """Montgomery-domain stage twiddles as host ints (value * R mod p):
    pure numpy so jit tracing never captures (or worse, caches) tracers."""
    p = spec.modulus
    R = spec.R % p
    stages = _stage_twiddles_np(spec, log_n, inverse)
    return [[t * R % p for t in s] for s in stages]


@functools.lru_cache(maxsize=None)
def _phase1_twiddles(ctx: FieldCtx, log_n: int, inverse: bool, log_tile: int):
    """Stages 1..log_tile concatenated into one (TILE-1 padded, N) Montgomery
    array; stage s starts at offset 2^(s-1) - 1. Host numpy -- passed to the
    kernel as an ARGUMENT, never embedded as a traced constant."""
    stages = _stage_twiddles_mont_np(ctx.spec, log_n, inverse)
    flat = []
    for s in range(1, log_tile + 1):
        flat.extend(stages[s - 1])
    arr = ctx.pack(flat)
    # pad to a tile-aligned sublane count
    pad = (-len(flat)) % 8 or 8
    return np.concatenate(
        [arr, np.zeros((pad, ctx.num_limbs), np.uint32)], axis=0
    )


@functools.lru_cache(maxsize=None)
def _phase2_twiddles(ctx: FieldCtx, log_n: int, inverse: bool, stage: int, tile: int):
    """Stage twiddles tiled up to at least one tile: (max(m/2, tile), N);
    host numpy (see _phase1_twiddles)."""
    tws = _stage_twiddles_mont_np(ctx.spec, log_n, inverse)[stage - 1]
    reps = max(1, tile // len(tws))
    return ctx.pack(tws * reps)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _phase1_kernel(ctx: FieldCtx, x, tw_all, log_tile: int):
    """All stages with m <= TILE, one VMEM pass per tile."""
    n_limbs = ctx.num_limbs
    size = x.shape[0]
    tile = 1 << log_tile
    tw_rows = tw_all.shape[0]

    def kernel(p_ref, tw_ref, x_ref, o_ref):
        pc = p_ref[...]
        t = x_ref[...]  # (tile, N) limbs-last
        for s in range(1, log_tile + 1):
            m = 1 << s
            half = m // 2
            shaped = t.reshape(tile // m, 2, half, n_limbs)
            u = shaped[:, 0].reshape(tile // 2, n_limbs)
            v = shaped[:, 1].reshape(tile // 2, n_limbs)
            # twiddles for stage s: rows [half-1, m-1), tiled across the tile
            tw = tw_ref[half - 1 : m - 1]
            twb = jnp.broadcast_to(tw[None], (tile // m, half, n_limbs)).reshape(
                tile // 2, n_limbs
            )
            ut = jnp.moveaxis(u, -1, 0)
            tv = lm.mont_mul(ctx, jnp.moveaxis(twb, -1, 0), jnp.moveaxis(v, -1, 0), pc)
            hi = jnp.moveaxis(lm.add(ctx, ut, tv, pc), 0, -1)
            lo = jnp.moveaxis(lm.sub(ctx, ut, tv, pc), 0, -1)
            t = jnp.concatenate(
                [hi.reshape(tile // m, 1, half, n_limbs),
                 lo.reshape(tile // m, 1, half, n_limbs)],
                axis=1,
            ).reshape(tile, n_limbs)
        o_ref[...] = t

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((size, n_limbs), _U32),
        grid=(size // tile,),
        in_specs=[
            _p_spec(ctx),
            pl.BlockSpec((tw_rows, n_limbs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_limbs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n_limbs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(_p_row(ctx), tw_all, x)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _phase2_stage(ctx: FieldCtx, x, tw, stage: int, tile: int):
    """One stage with m >= 2*TILE: u/v/twiddle blocks via index maps."""
    n_limbs = ctx.num_limbs
    size = x.shape[0]
    m = 1 << stage
    half = m // 2
    bpg = half // tile          # u-blocks per butterfly group
    tw_blocks = tw.shape[0] // tile

    def u_index(i):
        return ((i // bpg) * (m // tile) + i % bpg, 0)

    def v_index(i):
        return ((i // bpg) * (m // tile) + i % bpg + bpg, 0)

    def tw_index(i):
        return (i % tw_blocks if tw_blocks > 1 else 0, 0)

    def kernel(p_ref, tw_ref, u_ref, v_ref, hi_ref, lo_ref):
        pc = p_ref[...]
        u = jnp.moveaxis(u_ref[...], -1, 0)
        tv = lm.mont_mul(
            ctx,
            jnp.moveaxis(tw_ref[...], -1, 0),
            jnp.moveaxis(v_ref[...], -1, 0),
            pc,
        )
        hi_ref[...] = jnp.moveaxis(lm.add(ctx, u, tv, pc), 0, -1)
        lo_ref[...] = jnp.moveaxis(lm.sub(ctx, u, tv, pc), 0, -1)

    hi, lo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((size // 2, n_limbs), _U32),
            jax.ShapeDtypeStruct((size // 2, n_limbs), _U32),
        ),
        grid=(size // 2 // tile,),
        in_specs=[
            _p_spec(ctx),
            pl.BlockSpec((tile, n_limbs), tw_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_limbs), u_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_limbs), v_index, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n_limbs), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_limbs), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(_p_row(ctx), tw, x, x)
    # reassemble: group g occupies rows [g*m, (g+1)*m) = hi rows then lo rows
    groups = size // m
    out = jnp.concatenate(
        [hi.reshape(groups, half, n_limbs), lo.reshape(groups, half, n_limbs)],
        axis=1,
    ).reshape(size, n_limbs)
    return out


#: device-resident twiddle cache keyed on (id-stable ctx, log_n, inverse,
#: stage-or-phase1, tile). Populated only from EAGER calls (never caches
#: tracers); holding the uploaded arrays avoids re-shipping ~n*64 B of
#: twiddles through the host link on every transform (the round-4 3.5x
#: regression was exactly that per-call re-upload).
_DEVICE_TW: dict = {}


def _device_tw(key, host_arr):
    arr = _DEVICE_TW.get(key)
    if arr is None:
        arr = jnp.asarray(host_arr)
        if not isinstance(arr, jax.core.Tracer):
            _DEVICE_TW[key] = arr
    return arr


@functools.partial(jax.jit, static_argnums=(0, 5))
def _ntt_pallas_prog(ctx: FieldCtx, x, perm, tw1, tw2s, log_tile: int):
    """Whole transform as ONE program: bitrev gather + phase-1 tile kernel
    + every phase-2 stage. The stages were previously separate dispatches;
    over the axon tunnel each launch costs ~4 ms of command latency (trace:
    45 ms device vs 103 ms wall at 2^20), so an 11-launch transform paid
    ~40 ms of pure dispatch. Pallas calls are opaque custom-calls -- the
    cross-stage mega-fusion pathology of the XLA ladder cannot occur."""
    tile = 1 << log_tile
    x = jnp.take(x, perm, axis=0)
    x = _phase1_kernel(ctx, x, tw1, log_tile)
    for i, tw in enumerate(tw2s):
        x = _phase2_stage(ctx, x, tw, log_tile + 1 + i, tile)
    return x


def ntt_pallas(ctx: FieldCtx, table, inverse: bool = False, tile: int = TILE):
    """Drop-in NTT over a (2^k, N) Montgomery table; values identical to
    ``zktpu.ntt.ntt.ntt`` (without the final iNTT 1/n scale)."""
    from .ntt import _bitrev_perm

    size = table.shape[0]
    log_n = size.bit_length() - 1
    log_tile = tile.bit_length() - 1
    perm = _device_tw(("bitrev", log_n), _bitrev_perm(log_n))
    tw1 = _device_tw(
        (ctx, log_n, inverse, 0, tile),
        _phase1_twiddles(ctx, log_n, inverse, log_tile),
    )
    tw2s = tuple(
        _device_tw(
            (ctx, log_n, inverse, s, tile),
            _phase2_twiddles(ctx, log_n, inverse, s, tile),
        )
        for s in range(log_tile + 1, log_n + 1)
    )
    return _ntt_pallas_prog(ctx, table, perm, tw1, tw2s, log_tile)
