"""Fused lazy-GKR sumcheck phases: Fiat-Shamir ON device, fixed-shape rounds.

The host-loop lazy prover (``zktpu.gkr.lazy.gkr_prove_lazy``) pays, per round,
one device->host trip for the transcript squeeze AND one XLA compile per
distinct (phase, table-size) shape -- a 2^k-gate layer contributes ~2k shapes,
so a full circuit costs O(log^2 n) compiles (measured: a 2^12-input GKR prove
spent ~10 minutes in compiles on v5e). Here each sumcheck PHASE runs as ONE
XLA program per size class, reusing the device-Keccak machinery of
``zktpu.sumcheck.fused``:

  * the phase's composed tables live as a (2, 2, size, N) product stack
    ([[F, G], [H, 1]] for phase 1 -- same trick as the sharded prover in
    zktpu/parallel/mesh.py -- and the ``_phase2_tables_kernel`` layout for
    phase 2);
  * per round: degree-2 evaluations y_0, y_1, y_2 as exact lazy digit rows,
    device Lagrange interpolation to coefficients (c0 = y0,
    c2 = (y0 - 2 y1 + y2)/2, c1 = y1 - y0 - c2), one padded Keccak block
    (digest || 3 coefficients = 128 bytes), fold at the squeezed challenge;
  * small tables switch to a bit-reversed fixed-physical-shape ``lax.scan``
    (the ``zktpu.sumcheck.fused`` trick), so the number of compiled shapes is
    O(log n) for the first large rounds plus ONE scan body -- shared by every
    layer of the circuit, since layer sizes halve into each other.

Transcript bytes are identical to the host path INCLUDING the trim: the
reference absorbs ``interpolate``'s trailing-zero-trimmed coefficient vector
(univariate_polynomial_dense.rs:14-18 semantics), and a vanishing quadratic
coefficient is structural for some layers (e.g. all-ADD wiring), not rare --
so each device round selects its absorb-block layout with a ``lax.switch``
over the trimmed length (0..3 coefficients, each a static one-block layout).

After each device phase the host transcript replays the fetched coefficient
appends/squeezes (a few Keccak blocks), so the surrounding GKR protocol code
(alpha/beta folds, o_1/o_2 absorbs) continues unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field import limb_major as lm
from ..field.jnp_backend import FieldCtx
from ..field.spec import LIMB_MASK
from ..poly.univariate import UnivariatePoly
from ..sumcheck import fused as fp
from ..sumcheck.protocol import GkrSumcheckProof, _encode
from ..transcript import Transcript
from . import lazy as lazy_mod

_U32 = jnp.uint32
EXTRA = fp.EXTRA
#: tables at or below this size run under the one fixed-shape masked scan;
#: larger tables get individual ``_big_round`` programs. Module attribute
#: read at CALL time so tests can force it down (e.g. to 4) and exercise
#: several ``_big_round`` iterations on a small circuit.
SCAN_SIZE = 1 << 14


@functools.lru_cache(maxsize=None)
def _inv2_mont_np(spec) -> np.ndarray:
    """to_mont(1/2) as host digits: mont_mul(x, this) == x/2 for canonical x."""
    p = spec.modulus
    inv2 = pow(2, -1, p)
    from ..field import jnp_backend as _fb

    ctx = _fb.get_ctx(spec)
    return ctx.pack(inv2 * (spec.R % p) % p)


def _lazy_sum_cols(ctx: FieldCtx, x):
    """Exact digit row of a (k, N) lanes-last batch: (N+EXTRA,) uint32."""
    t = jnp.moveaxis(x, -1, 0)
    k = t.shape[1]
    if k <= (1 << 16):
        return lm.lazy_sum(t, EXTRA)[:, 0]
    chunks = t.reshape(ctx.num_limbs, -1, 1 << 16)
    acc = jnp.zeros((ctx.num_limbs + EXTRA,), _U32)
    for c in range(chunks.shape[1]):
        acc = acc + lm.lazy_sum(chunks[:, c], EXTRA)[:, 0]
    return lm.ripple(acc, chunks.shape[1] * LIMB_MASK + 1)


def _ys_rows(ctx: FieldCtx, a, b):
    """(3, N+EXTRA) lazy digit rows of y_t = sum_half sum_p prod_f vals_t.

    a, b: (2, 2, half, N) Montgomery product stacks (the t=0 / t=1
    restrictions); t=2 uses b + (b - a). Same field values as
    ``sumcheck.protocol.gkr_round_kernel`` at degree 2.
    """
    diff = fb.sub(ctx, b, a)
    v2 = fb.add(ctx, b, diff)
    rows = []
    for vals in (a, b, v2):
        prod = fb.mont_mul(ctx, vals[:, 0], vals[:, 1])
        total = fb.add(ctx, prod[0], prod[1])
        rows.append(_lazy_sum_cols(ctx, total))
    return jnp.stack(rows)


def _interp3(ctx: FieldCtx, ys_canon):
    """Canonical (3, N) y-values at t=0,1,2 -> canonical (3, N) coefficients
    [c0, c1, c2] of the unique degree-<=2 interpolant."""
    y0, y1, y2 = ys_canon[0], ys_canon[1], ys_canon[2]
    inv2 = jnp.asarray(_inv2_mont_np(ctx.spec))
    c2 = fb._mont_mul_impl(
        ctx, fb.sub(ctx, fb.sub(ctx, fb.add(ctx, y0, y2), y1), y1), inv2
    )
    c1 = fb.sub(ctx, fb.sub(ctx, y1, y0), c2)
    return jnp.stack([y0, c1, c2])


def _trim_len(coeffs):
    """Traced trimmed length (0..3) of canonical (3, N) coefficient rows."""
    nz = jnp.any(coeffs != 0, axis=1)  # (3,)
    # length = highest index with a nonzero + 1
    idx = jnp.arange(1, 4, dtype=jnp.int32)
    return jnp.max(jnp.where(nz, idx, 0))


def _squeeze_trim(ctx: FieldCtx, digest, coeffs):
    """Squeeze-round absorb of digest || trimmed coefficients: lax.switch
    over the 4 static block layouts."""
    return jax.lax.switch(
        _trim_len(coeffs),
        [lambda d, c, k=k: fp._squeeze_round(ctx, d, c[:k]) for k in range(4)],
        digest, coeffs,
    )


def _absorb_tail_trim(ctx: FieldCtx, state, tail_lanes, tail_len: int, coeffs):
    """Round-0 absorb of prefix tail || trimmed coefficients."""
    return jax.lax.switch(
        _trim_len(coeffs),
        [
            lambda s, t, c, k=k: fp._absorb_tail_block(ctx, s, t, tail_len, c[:k])
            for k in range(4)
        ],
        state, tail_lanes, coeffs,
    )


def _fold_stack(ctx: FieldCtx, tables, r_mont):
    """Fold variable 0 (standard order) of (2, 2, size, N) tables."""
    size = tables.shape[2]
    shaped = tables.reshape(2, 2, 2, size // 2, ctx.num_limbs)
    a, b = shaped[:, :, 0], shaped[:, :, 1]
    return fb.add(ctx, a, fb._mont_mul_impl(ctx, r_mont, fb.sub(ctx, b, a)))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _scan_phase_fixed(ctx: FieldCtx, first_is_tail: bool, tail_len: int,
                      state0, tail_lanes, tables_br, nb, digest0):
    """MAX_STEPS masked rounds on a FIXED (2, 2, SCAN_SIZE, N) bit-reversed
    zero-padded stack; ``nb`` (traced) of them are active.

    One compiled program serves EVERY layer of every circuit: a logical
    2^k-size table bit-reversed at k bits occupies the first 2^k positions
    (k-bit bitrev pairs adjacent entries with their MSB partner regardless of
    the physical size), zeros beyond contribute 0 to every y_t and fold to 0,
    and steps >= nb leave the carry untouched. ``first_is_tail``: step 0
    absorbs the host transcript's pending tail instead of a digest prefix.
    """
    n = ctx.num_limbs
    S = tables_br.shape[2]

    def body(carry, step):
        t, st, dg = carry
        active = step < nb
        pairs = t.reshape(2, 2, S // 2, 2, n)
        a, b = pairs[:, :, :, 0], pairs[:, :, :, 1]
        ys = _ys_rows(ctx, a, b)
        coeffs = _interp3(ctx, fp._canonicalize_rows(ctx, ys))
        if first_is_tail:
            st_new = jax.lax.cond(
                step == 0,
                lambda: _absorb_tail_trim(ctx, st, tail_lanes, tail_len, coeffs),
                lambda: _squeeze_trim(ctx, dg, coeffs),
            )
        else:
            st_new = _squeeze_trim(ctx, dg, coeffs)
        st = jnp.where(active, st_new, st)
        dg = jnp.where(active, st_new[:4], dg)
        r = fp._digest_to_mont(ctx, st_new[:4])
        folded = fb.add(ctx, a, fb._mont_mul_impl(ctx, r, fb.sub(ctx, b, a)))
        t_new = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=2)
        t = jnp.where(active, t_new, t)
        return (t, st, dg), coeffs

    (tbl, state, digest), coeffs = jax.lax.scan(
        body,
        (tables_br, state0, digest0),
        jnp.arange(S.bit_length() - 1, dtype=jnp.int32),
    )
    return coeffs, tbl[0, 0, 0], state


def _bitrev_pad(ctx: FieldCtx, tables):
    """Bit-reverse (2, 2, size, N) at its logical size and zero-pad the size
    axis to SCAN_SIZE."""
    size = tables.shape[2]
    perm = jnp.asarray(fp._bitrev(size.bit_length() - 1))
    tbl = jnp.take(tables, perm, axis=2)
    if size < SCAN_SIZE:
        pad = jnp.zeros(
            (2, 2, SCAN_SIZE - size, ctx.num_limbs), _U32
        )
        tbl = jnp.concatenate([tbl, pad], axis=2)
    return tbl


@functools.partial(jax.jit, static_argnums=(0, 2))
def _big_round(ctx: FieldCtx, tables, tail_len: int,
               state, tail_lanes, digest):
    """One standard-order round at a size > SCAN_SIZE (shapes are shared
    across layers because layer sizes halve into each other).

    ``tail_len >= 0`` marks the first round of a phase: absorb the pending
    host-transcript tail instead of a digest prefix."""
    size = tables.shape[2]
    half = size // 2
    a, b = tables[:, :, :half], tables[:, :, half:]
    ys = _ys_rows(ctx, a, b)
    coeffs = _interp3(ctx, fp._canonicalize_rows(ctx, ys))
    if tail_len >= 0:
        state = _absorb_tail_trim(ctx, state, tail_lanes, tail_len, coeffs)
    else:
        state = _squeeze_trim(ctx, digest, coeffs)
    digest = state[:4]
    r = fp._digest_to_mont(ctx, digest)
    return _fold_stack(ctx, tables, r), state, digest, coeffs


def _device_phase(ctx: FieldCtx, nb: int, tail_len: int, state0, tail_lanes,
                  tables):
    """All ``nb`` rounds of one phase: individual jitted rounds while the
    table exceeds SCAN_SIZE, then the one fixed-shape masked scan.

    Returns ((nb, 3, N) canonical coefficient rows, (N,) folded F entry --
    w(r_b) after phase 1).
    """
    outs = []
    state = jnp.asarray(state0)
    digest = jnp.zeros((4, 2), _U32)
    empty_tail = jnp.zeros((0, 2), _U32)
    k = 0
    while tables.shape[2] > SCAN_SIZE:
        first = k == 0
        tables, state, digest, coeffs = _big_round(
            ctx, tables, tail_len if first else -1, state,
            tail_lanes if first else empty_tail, digest,
        )
        outs.append(coeffs)
        k += 1
    first = k == 0
    coeffs, wb, state = _scan_phase_fixed(
        ctx, first, tail_len if first else -1,
        state, tail_lanes if first else empty_tail, _bitrev_pad(ctx, tables),
        jnp.int32(nb - k), digest,
    )
    if outs:
        return jnp.concatenate([jnp.stack(outs), coeffs], axis=0)[:nb], wb
    return coeffs[:nb], wb


def _run_phase(ctx: FieldCtx, transcript: Transcript, tables):
    """Dispatch one device phase, then replay its appends/squeezes on the
    host transcript. Returns (round polys, challenges, wb device row)."""
    nb = tables.shape[2].bit_length() - 1
    state0, tail = transcript.sponge().state_lanes()
    assert len(tail) % 8 == 0  # all GKR absorbs are 32-byte aligned
    tail_lanes = (
        fp.kd.bytes_to_lanes(tail) if tail else np.zeros((0, 2), np.uint32)
    )
    coeff_rows, wb = _device_phase(
        ctx, nb, len(tail), jnp.asarray(state0), jnp.asarray(tail_lanes), tables
    )
    flat = np.asarray(coeff_rows).reshape(-1, ctx.num_limbs)
    ints = [int(v) for v in ctx.unpack(flat)]
    polys, challenges = [], []
    for k in range(nb):
        poly = UnivariatePoly(ctx.spec, ints[3 * k: 3 * k + 3])
        poly.trim()  # match interpolate's trim (and the device absorb layout)
        transcript.append_field_elements(poly.coefficients)
        polys.append(poly)
        challenges.append(transcript.get_random_challenge())
    return polys, challenges, wb


def gkr_prove_lazy_fused(claimed_sum: int, fbc: "lazy_mod.LazyFbc",
                         transcript: Transcript) -> GkrSumcheckProof:
    """Drop-in replacement for ``lazy.gkr_prove_lazy``: same proof values,
    two device dispatches per layer instead of 2 per ROUND, and an O(log n)
    compiled-shape footprint shared across layers."""
    ctx = fbc.ctx
    nb = fbc.num_rounds // 2

    # ---- phase 1: [[F, G], [H, 1]] ---------------------------------------
    gh = lazy_mod._phase1_tables_kernel(ctx, fbc.coef_a, fbc.coef_m, fbc.w_table)
    ones = jnp.broadcast_to(
        jnp.asarray(ctx.one_mont), fbc.w_table.shape
    ).astype(_U32)
    tables1 = jnp.stack([
        jnp.stack([fbc.w_table, gh[0]]), jnp.stack([gh[1], ones])
    ])
    polys1, challenges1, wb = _run_phase(ctx, transcript, tables1)

    # ---- phase 2 ----------------------------------------------------------
    eqb = lazy_mod.eq_tensor(ctx, [_encode(ctx, r) for r in challenges1])
    tables2 = lazy_mod._phase2_tables_kernel(
        ctx, fbc.coef_a, fbc.coef_m, fbc.w_table, eqb, wb
    )
    polys2, challenges2, _ = _run_phase(ctx, transcript, tables2)

    assert len(polys1) == len(polys2) == nb
    return GkrSumcheckProof(
        polys1 + polys2, claimed_sum, challenges1 + challenges2
    )
