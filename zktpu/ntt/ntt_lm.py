"""Limb-major four-step NTT: full-lane-width butterflies on TPU.

The lanes-last NTT (zktpu/ntt/ntt.py) keeps field elements as (n, 16) uint32
rows; on TPU the 16-wide minor axis occupies 16 of 128 vector lanes, so every
butterfly stage runs at ~1/8 lane utilization -- and the early stages
(butterfly span m < 128) are worse because the reshaped (2, m/2) minor dims
shrink further. Measured at 2^20 this path is ~150x off the chip's
bandwidth/compute ceiling.

This module stores the table limb-MAJOR -- (L, n) with the 2^k batch on the
minor (lane) axis -- and decomposes the transform as the classic four-step
N = R x C (Bailey 1990; the same decomposition ``zktpu.parallel.mesh.
ntt_sharded`` uses across chips, here applied on ONE chip purely for layout):

  1. view x[c*R + r] as A[r, c]  (C-strided columns),
  2. R-point NTTs along the ROW axis  -- every butterfly reshape splits the
     (L, R, C) middle axis, the minor axis stays C >= 1024 lanes wide,
  3. twiddle multiply by w^(r'*c)  (one fused elementwise pass),
  4. transpose to (L, C, R)  (XLA tiled transpose, one pass),
  5. C-point NTTs along the new row axis,
  6. output element k = k2*R + k1 read from B[k2, k1] -> natural order.

Row NTTs recurse: while the row count still exceeds a lane tile the split
repeats, so arbitrarily large tables keep full-width stages. Same DFT values
bit-for-bit as ``zktpu.ntt.ntt`` (tested); the reference semantics are
/root/reference/fft/src/fft.rs:6-29.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field import limb_major as lm
from ..field.jnp_backend import FieldCtx
from ..field.spec import FieldSpec
from .ntt import _bitrev_perm

_U32 = jnp.uint32

#: below this row count a direct (bitrev + stages) ladder runs; above it the
#: four-step split keeps the minor axis wide
_DIRECT_MAX = 1 << 11


@functools.lru_cache(maxsize=None)
def _twiddles_lm(spec: FieldSpec, log_n: int, inverse: bool):
    """Per-stage Montgomery twiddles, limb-major: stage s -> (L, m/2).

    Pure host numpy (Montgomery conversion = *R mod p done in Python ints),
    so the lru_cache never captures tracers when called under jit.
    """
    ctx = fb.get_ctx(spec)
    n = 1 << log_n
    p = spec.modulus
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    R = spec.R
    stages = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(omega, n // m, p)
        tws, acc = [], R % p
        for _ in range(m // 2):
            tws.append(acc)
            acc = acc * w_m % p
        stages.append(np.swapaxes(ctx.pack(tws), 0, 1))  # (L, m/2)
    return tuple(stages)


@functools.lru_cache(maxsize=None)
def _fourstep_twiddle(spec: FieldSpec, rows: int, cols: int, inverse: bool):
    """w^(r*c) matrix, limb-major (L, rows, cols) Montgomery (host numpy)."""
    ctx = fb.get_ctx(spec)
    n = rows * cols
    p = spec.modulus
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    R = spec.R
    tw = np.empty((rows, cols), dtype=object)
    for r in range(rows):
        w_r = pow(omega, r, p)
        acc = R % p
        for c in range(cols):
            tw[r, c] = acc
            acc = acc * w_r % p
    return np.moveaxis(ctx.pack(tw), -1, 0)  # (L, rows, cols)


def _stage_pass(ctx: FieldCtx, x, tw):
    """One butterfly stage along the middle axis of (L, R, C...)."""
    L = x.shape[0]
    rest = x.shape[2:]
    half = tw.shape[1]
    m = 2 * half
    shaped = x.reshape(L, x.shape[1] // m, 2, half, *rest)
    u = shaped[:, :, 0]
    v = shaped[:, :, 1]
    twb = tw.reshape(L, 1, half, *([1] * len(rest)))
    tv = lm.mont_mul(ctx, twb, v)
    hi = lm.add(ctx, u, tv)
    lo = lm.sub(ctx, u, tv)
    return jnp.stack([hi, lo], axis=2).reshape(x.shape)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _direct_ladder_jit(ctx: FieldCtx, x, inverse: bool, log_r: int):
    """Bitrev + full stage ladder along axis 1 as ONE program, with an
    ``optimization_barrier`` between stages.

    Program-granularity notes (measured on v5e at 2^20):
      * one jit per STAGE: 1.8 s (per-stage HBM round trips + dispatch);
      * one jit per LADDER without barriers: XLA mega-fuses the strided u/v
        slices across stages and recomputes upstream butterflies (~200x);
      * one jit per LADDER with barriers: 0.41 s -- the shipped shape.
    The ladder is capped at _DIRECT_MAX rows so its program stays under the
    axon remote-compile size limit; larger transforms recurse four-step
    EAGERLY (see ``_ntt_axis1``), so every compiled unit stays ladder-sized.
    """
    x = jnp.take(x, jnp.asarray(_bitrev_perm(log_r)), axis=1)
    tws = _twiddles_lm(ctx.spec, log_r, inverse)
    for s in range(1, log_r + 1):
        x = jax.lax.optimization_barrier(
            _stage_pass(ctx, x, jnp.asarray(tws[s - 1]))
        )
    return x


@functools.partial(jax.jit, static_argnums=(0,))
def _twiddle_mul(ctx: FieldCtx, tw, x):
    return lm.mont_mul(ctx, tw, x)


def _ntt_axis1(ctx: FieldCtx, x, inverse: bool):
    """NTT along axis 1 of (L, R, C...): direct ladder or four-step recurse.

    Four-step index math mirrors the (tested) ``ntt_sharded`` decomposition
    in zktpu/parallel/mesh.py: A[m1, m2] = x[r1*m2 + m1]; DFT over m2 with
    root w^r1; twiddle w^(m1*k2); DFT over m1; X[k1*r2 + k2] = D[k1, k2].
    The recursion itself is eager -- only ladders and the twiddle pass are
    compiled units.
    """
    r = x.shape[1]
    if r <= _DIRECT_MAX:
        return _direct_ladder_jit(ctx, x, inverse, r.bit_length() - 1)
    log_r = r.bit_length() - 1
    r1 = 1 << (log_r // 2)
    r2 = r // r1
    L = x.shape[0]
    rest = x.shape[2:]
    # a[m2, m1] = x[m2*r1 + m1]; DFT over m2 (axis 1, length r2, root w^r1 =
    # the canonical order-r2 root) with m1 riding along on the lane axis
    a = x.reshape(L, r2, r1, *rest)
    b = _ntt_axis1(ctx, a, inverse)                     # b[k2, m1]
    from .pallas_ntt import _device_tw

    # device-cached: the (L, r2, r1) twiddle matrix is ~n*64 B -- re-uploading
    # it per transform dominated round-4 timings
    tw = _device_tw(
        ("lm4", ctx, r2, r1, inverse),
        _fourstep_twiddle(ctx.spec, r2, r1, inverse),
    )
    c = _twiddle_mul(
        ctx, tw.reshape(L, r2, r1, *([1] * len(rest))), b
    )
    ct = jnp.swapaxes(c, 1, 2)                          # (L, m1, k2, ...)
    d = _ntt_axis1(ctx, ct, inverse)                    # d[k1, k2]
    return d.reshape(L, r, *rest)                       # X[k1*r2 + k2]


def ntt_lm(ctx: FieldCtx, table, inverse: bool = False):
    """NTT of a lanes-last (2^k, L) Montgomery table via the limb-major
    engine; returns lanes-last, values identical to ``zktpu.ntt.ntt.ntt``
    (without the final iNTT 1/n scale, which the caller applies)."""
    x = jnp.swapaxes(table, 0, 1)
    out = _ntt_axis1(ctx, x[:, :, None], inverse)[:, :, 0]
    return jnp.swapaxes(out, 0, 1)
