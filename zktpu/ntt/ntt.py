"""Radix-2 NTT/iNTT over BN254 Fr.

Capability parity with /root/reference/fft/src/fft.rs: ``fft_evaluate``
(:31-41), ``fft_interpolate`` (:43-60), ``split_poly`` (:62-68), with roots
from the field's two-adic generator exactly like arkworks
``Fr::get_root_of_unity`` (spec.root_of_unity).

TPU design: the reference's recursive even/odd DIT (:6-29) becomes an
*iterative* bit-reversal + butterfly ladder -- log2(n) stages, each one fused
reshape/lerp-style kernel over the whole table with precomputed Montgomery
twiddle tables. Same DFT values, compiler-friendly shape. The multi-chip
variant (cross-shard stages via collectives) lives in ``zktpu.parallel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field.spec import BN254_FR, FieldSpec
from ..poly.univariate import UnivariatePoly


@functools.lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        perm[i] = int(format(i, f"0{log_n}b")[::-1], 2) if log_n else 0
    return perm


@functools.lru_cache(maxsize=None)
def _twiddles(spec: FieldSpec, log_n: int, inverse: bool):
    """Per-stage Montgomery twiddle tables w_m^j, j < m/2, m = 2^stage.

    Pure HOST numpy (Montgomery conversion = *R mod p done in Python ints):
    this cache is populated inside jit traces (``_ntt_kernel``), so it must
    never hold device arrays -- a cached tracer outlives its trace and blows
    up the next retrace (the round-4 sharded-NTT failure)."""
    ctx = fb.get_ctx(spec)
    n = 1 << log_n
    p = spec.modulus
    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, p)
    R = spec.R % p
    stages = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(omega, n // m, p)
        tws, acc = [], R
        for _ in range(m // 2):
            tws.append(acc)
            acc = acc * w_m % p
        stages.append(ctx.pack(tws))
    return tuple(stages)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _ntt_kernel(ctx, table, log_n: int, inverse: bool):
    spec = ctx.spec
    perm = jnp.asarray(_bitrev_perm(log_n))
    x = jnp.take(table, perm, axis=0)
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = jnp.asarray(_twiddles(spec, log_n, inverse)[s - 1])  # (m/2, N)
        shaped = x.reshape(-1, 2, m // 2, ctx.num_limbs)
        u = shaped[:, 0]
        v = fb.mont_mul(ctx, tw[None], shaped[:, 1])
        x = jnp.concatenate(
            [fb.add(ctx, u, v), fb.sub(ctx, u, v)], axis=1
        ).reshape(-1, ctx.num_limbs)
    return x


#: four-step limb-major engine takes over above this size (full-lane-width
#: stages; see ntt_lm.py). Overridable via ZKTPU_NTT_ENGINE=xla|pallas|lm.
_LM_MIN = 1 << 14


def select_engine(n: int) -> str:
    """Engine for an n-point transform: 'pallas' | 'lm' | 'xla'.

    Measured on v5e (BENCH_NOTES.md round 5): pallas 71.6 ms (fused single
    program) / lm 379 ms / xla 400 ms at 2^20 -- the two-phase Pallas
    schedule wins wherever it applies; the limb-major four-step engine
    covers large tables when it does not (non-TPU backends, off-tile
    sizes)."""
    import os

    forced = os.environ.get("ZKTPU_NTT_ENGINE", "auto")
    if forced != "auto":
        return forced
    from .pallas_ntt import ntt_pallas_available

    if ntt_pallas_available(n):
        return "pallas"
    if n >= _LM_MIN:
        return "lm"
    return "xla"


def ntt(ctx, table, inverse: bool = False):
    """Device NTT of a Montgomery limb table (2^k, N) -> same shape.

    Forward: values -> evaluations at successive powers of the 2^k-th root
    (natural order), identical to the reference's recursive ``dft``.
    Engine auto-selection: the limb-major four-step engine (``ntt_lm``) for
    large tables, the Pallas two-phase schedule or the XLA ladder below.
    """
    n = table.shape[0]
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("Length must be a power of 2")
    engine = select_engine(n)
    if engine == "lm":
        from .ntt_lm import ntt_lm

        out = ntt_lm(ctx, table, inverse)
    elif engine == "pallas":
        from .pallas_ntt import ntt_pallas

        out = ntt_pallas(ctx, table, inverse)
    else:
        out = _ntt_kernel(ctx, table, log_n, inverse)
    if inverse:
        n_inv = pow(n, -1, ctx.spec.modulus)
        out = fb.mont_mul(ctx, out, fb.to_mont(ctx, jnp.asarray(ctx.pack(n_inv))))
    return out


# ----------------------------------------------------------------------
# reference-shaped API (host ints in/out)
# ----------------------------------------------------------------------

def fft_evaluate(poly: UnivariatePoly) -> list[int]:
    """Evaluate at all n-th roots of unity (reference :31-41)."""
    spec = poly.spec
    ctx = fb.get_ctx(spec)
    table = fb.to_mont(ctx, jnp.asarray(ctx.pack(poly.coefficients)))
    out = fb.from_mont(ctx, ntt(ctx, table))
    return [int(v) for v in ctx.unpack(np.asarray(out))]


def fft_interpolate(spec: FieldSpec, evaluations: list[int]) -> UnivariatePoly:
    """Inverse transform back to coefficients (reference :43-60)."""
    ctx = fb.get_ctx(spec)
    table = fb.to_mont(ctx, jnp.asarray(ctx.pack(evaluations)))
    out = fb.from_mont(ctx, ntt(ctx, table, inverse=True))
    return UnivariatePoly(spec, [int(v) for v in ctx.unpack(np.asarray(out))])


def split_poly(values: list[int]) -> tuple[list[int], list[int]]:
    """Even/odd coefficient split (reference :62-68)."""
    return list(values[0::2]), list(values[1::2])


DEFAULT_SPEC = BN254_FR
