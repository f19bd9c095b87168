"""Lazy f(b,c) sumcheck for GKR: linear-time phase tables instead of dense
wiring tensors.

The reference materializes, per layer, (a) the one-hot wiring MLE add_i/mul_i
over 2^(log n + 2 log n + 2) entries (/root/reference/gkr/src/gkr_circuit.rs:39-52)
and (b) the O(|w|^2) tensor w(b) op w(c)
(/root/reference/multilinear_polynomial/src/multilinear_polynomial_evaluation.rs:99-110).
Both are exponential cliffs: a 2^20-gate layer would need a 2^62-entry table.

This module exploits the structure the reference's own wiring admits (gate a
always reads b = 2a, c = 2a+1): add_i(a,b,c) = sum_{g in add} eq(a, g)
* onehot(b = 2g) * onehot(c = 2g+1). Binding a to the verifier challenges
collapses each gate to a single coefficient, and summing over c (phase 1) or
binding b (phase 2) leaves O(|w|)-size tables:

  phase 1 (binding b):  sum_c f(b,c) = w(b) * G(b) + H(b)
      G[2g] = coefA_g + coefM_g * w[2g+1],  H[2g] = coefA_g * w[2g+1]
      (odd entries 0), where coefA_g / coefM_g are the bound-a wiring
      coefficients per gate.
  phase 2 (binding c, b bound to r_b):  f(r_b, c) = A2(c) * (wb + w(c))
      + (M2(c) * wb) * w(c), with A2[2g+1] = coefA_g * eq(r_b, 2g) and
      M2 likewise (even entries 0).

Summation over the hypercube commutes with partial evaluation, and every step
is exact field arithmetic, so each round polynomial is the *identical field
element sequence* the reference's dense-tensor prover emits -- proof bytes
match bit for bit (tested against the dense path in tests/test_gkr_protocol).
Total prover work per layer drops from O(|w|^2) to O(|w|) field ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field import jnp_backend as fb
from ..field.jnp_backend import FieldCtx
from ..poly.multilinear import MultilinearPoly, tensor_kernel
from ..poly.univariate import UnivariatePoly
from ..sumcheck.protocol import (
    GkrSumcheckProof,
    fold_tables_kernel,
    gkr_round_kernel,
    _encode,
    _to_ints,
)
from ..transcript import Transcript
from .circuit import Layer, ADD


def eq_tensor(ctx: FieldCtx, values_mont):
    """eq(r, x) table over all 2^k MSB-first hypercube vertices x.

    Chain of kron products of (1 - r_i, r_i); challenge 0 lands on the most
    significant index bit, matching the reference's bit packing
    (gkr_circuit.rs:67-104) and ``generate_bhc`` enumeration (kzg.rs:171-181).
    """
    one = fb.to_mont(ctx, jnp.asarray(ctx.pack([1])))
    table = one
    for r in values_mont:
        r_row = jnp.asarray(r)[None]
        pair = jnp.concatenate([fb.sub(ctx, one, r_row), r_row], axis=0)
        table = tensor_kernel(ctx, table, pair, "mul")
    return table  # (2^k, N) Montgomery


@functools.partial(jax.jit, static_argnums=(0,))
def _phase1_tables_kernel(ctx: FieldCtx, coef_a, coef_m, w_table):
    """Interleaved G/H tables over b from per-gate coefficients.

    coef_a/coef_m: (n, N) bound-a wiring coefficients; w_table: (2n, N).
    Returns (2, 2n, N): [G, H] with G[2g] = coefA_g + coefM_g * w[2g+1],
    H[2g] = coefA_g * w[2g+1], odd entries zero.
    """
    n = coef_a.shape[0]
    w_odd = w_table.reshape(n, 2, ctx.num_limbs)[:, 1]
    h_even = fb.mont_mul(ctx, coef_a, w_odd)
    g_even = fb.add(ctx, coef_a, fb.mont_mul(ctx, coef_m, w_odd))
    zeros = jnp.zeros_like(g_even)
    g = jnp.stack([g_even, zeros], axis=1).reshape(2 * n, ctx.num_limbs)
    h = jnp.stack([h_even, zeros], axis=1).reshape(2 * n, ctx.num_limbs)
    return jnp.stack([g, h])


@functools.partial(jax.jit, static_argnums=(0,))
def _phase2_tables_kernel(ctx: FieldCtx, coef_a, coef_m, w_table, eqb, wb):
    """Phase-2 SumPoly tables over c once b is bound to r_b.

    Returns (2, 2, 2n, N) in ``gkr_round_kernel`` layout:
    [[A2, wb + w], [M2 * wb, w]] with A2[2g+1] = coefA_g * eq(r_b, 2g).
    """
    n = coef_a.shape[0]
    eqb_even = eqb.reshape(n, 2, ctx.num_limbs)[:, 0]
    a2_odd = fb.mont_mul(ctx, coef_a, eqb_even)
    m2_odd = fb.mont_mul(ctx, fb.mont_mul(ctx, coef_m, eqb_even), wb)
    zeros = jnp.zeros_like(a2_odd)
    a2 = jnp.stack([zeros, a2_odd], axis=1).reshape(2 * n, ctx.num_limbs)
    m2 = jnp.stack([zeros, m2_odd], axis=1).reshape(2 * n, ctx.num_limbs)
    wb_plus_w = fb.add(ctx, w_table, wb)
    return jnp.stack([jnp.stack([a2, wb_plus_w]), jnp.stack([m2, w_table])])


@functools.partial(jax.jit, static_argnums=(0,))
def _phase1_round_kernel(ctx: FieldCtx, tables):
    """Round-poly evaluations y_t (t = 0,1,2) of sum_rest (F*G + H).

    ``tables``: (3, size, N) Montgomery stack [F, G, H]. Same field values as
    the reference's dense partial_evaluate + reduce + sum at each t.
    """
    _, size, N = tables.shape
    half = size // 2
    shaped = tables.reshape(3, 2, half, N)
    a = shaped[:, 0]
    b = shaped[:, 1]
    diff = fb.sub(ctx, b, a)

    ys = []
    two = fb.add(ctx, jnp.asarray(ctx.one_mont), jnp.asarray(ctx.one_mont))
    for t in range(3):
        if t == 0:
            vals = a
        elif t == 1:
            vals = b
        else:
            vals = fb.add(ctx, a, fb.mont_mul(ctx, two, diff))
        total = fb.add(ctx, fb.mont_mul(ctx, vals[0], vals[1]), vals[2])
        ys.append(fb.field_sum(ctx, total, axis=0))
    return jnp.stack(ys)


class LazyFbc:
    """f(b,c) = add_i(r,b,c)*(w(b)+w(c)) + mul_i(r,b,c)*(w(b)*w(c)) held as
    per-gate coefficients + the w table; materializes only O(|w|) tables."""

    __slots__ = ("ctx", "coef_a", "coef_m", "w_table", "num_rounds")

    def __init__(self, ctx: FieldCtx, coef_a, coef_m, w_poly: MultilinearPoly):
        self.ctx = ctx
        self.coef_a = coef_a
        self.coef_m = coef_m
        self.w_table = w_poly.table
        if w_poly.table.shape[0] != 2 * coef_a.shape[0]:
            raise ValueError("w table must have 2 * n_gates entries")
        # (b, c) each carry log2(|w|) variables
        self.num_rounds = 2 * w_poly.num_vars

    def get_degree(self) -> int:
        return 2


def _gate_masks(ctx: FieldCtx, layer: Layer):
    """Montgomery-domain 0/1 masks for add and mul gates."""
    is_add = jnp.asarray([op == ADD for op in layer.ops])
    one = jnp.asarray(ctx.one_mont)
    zero = jnp.zeros_like(one)
    add_mask = jnp.where(is_add[:, None], one, zero)
    mul_mask = jnp.where(is_add[:, None], zero, one)
    return add_mask, mul_mask


def _require_pow2(layer: Layer):
    n = layer.n_gates
    if n & (n - 1):
        raise ValueError(
            "lazy fbc requires power-of-two layer sizes (the reference's "
            "bit packing is only well-formed there); use the dense path"
        )


def lazy_fbc(ctx: FieldCtx, random_challenge: int, layer: Layer,
             w_poly: MultilinearPoly) -> LazyFbc:
    """Layer-0 fbc (reference get_fbc_poly, gkr_protocol.rs:243-263): the
    gate-index variable a (1 bit; the output layer has 1-2 gates) bound to r."""
    _require_pow2(layer)
    n = layer.n_gates
    r = _encode(ctx, random_challenge)
    # a-width is 1 bit for n in {1, 2}; eq over gate indices 0..n-1
    a_bits = 1
    if n > 2:
        raise ValueError("output layer has more than 2 gates")
    eq_a = eq_tensor(ctx, [r])[:n]
    del a_bits
    add_mask, mul_mask = _gate_masks(ctx, layer)
    coef_a = fb.mont_mul(ctx, eq_a, add_mask)
    coef_m = fb.mont_mul(ctx, eq_a, mul_mask)
    return LazyFbc(ctx, coef_a, coef_m, w_poly)


def lazy_folded_fbc(ctx: FieldCtx, layer: Layer, w_poly: MultilinearPoly,
                    r_b: list[int], r_c: list[int], alpha: int,
                    beta: int) -> LazyFbc:
    """Folded fbc (reference get_folded_fbc_poly, gkr_protocol.rs:265-292):
    coef_g = alpha * eq(r_b, g) + beta * eq(r_c, g), masked per gate type."""
    _require_pow2(layer)
    n = layer.n_gates
    if len(r_b) != max(1, n.bit_length() - 1):
        raise ValueError("r_b width must match the layer's gate-index bits")
    rb = [_encode(ctx, v) for v in r_b]
    rc = [_encode(ctx, v) for v in r_c]
    a = _encode(ctx, alpha)
    b = _encode(ctx, beta)
    eq_rb = eq_tensor(ctx, rb)[:n]
    eq_rc = eq_tensor(ctx, rc)[:n]
    folded = fb.add(
        ctx, fb.mont_mul(ctx, eq_rb, a), fb.mont_mul(ctx, eq_rc, b)
    )
    add_mask, mul_mask = _gate_masks(ctx, layer)
    coef_a = fb.mont_mul(ctx, folded, add_mask)
    coef_m = fb.mont_mul(ctx, folded, mul_mask)
    return LazyFbc(ctx, coef_a, coef_m, w_poly)


def gkr_prove_lazy(claimed_sum: int, fbc: LazyFbc,
                   transcript: Transcript) -> GkrSumcheckProof:
    """Drop-in replacement for ``sumcheck.gkr_prove`` on a LazyFbc: identical
    transcript bytes, O(|w|) work per layer instead of O(|w|^2)."""
    ctx = fbc.ctx
    spec = ctx.spec
    nb = fbc.num_rounds // 2
    proof_polynomials = []
    random_challenges = []

    # ---- phase 1: bind b ------------------------------------------------
    gh = _phase1_tables_kernel(ctx, fbc.coef_a, fbc.coef_m, fbc.w_table)
    tables = jnp.concatenate([fbc.w_table[None], gh])  # (3, 2n, N): F, G, H
    for _ in range(nb):
        ys = _to_ints(ctx, _phase1_round_kernel(ctx, tables))
        round_poly = UnivariatePoly.interpolate(
            spec, [(t, y) for t, y in enumerate(ys)]
        )
        transcript.append_field_elements(round_poly.coefficients)
        proof_polynomials.append(round_poly)

        r = transcript.get_random_challenge()
        random_challenges.append(r)
        tables = fold_tables_kernel(ctx, tables, _encode(ctx, r))

    wb = tables[0, 0]  # w(r_b)

    # ---- phase 2: bind c ------------------------------------------------
    eqb = eq_tensor(ctx, [_encode(ctx, r) for r in random_challenges])
    tables2 = _phase2_tables_kernel(
        ctx, fbc.coef_a, fbc.coef_m, fbc.w_table, eqb, wb
    )
    for _ in range(nb):
        ys = _to_ints(ctx, gkr_round_kernel(ctx, tables2, 2))
        round_poly = UnivariatePoly.interpolate(
            spec, [(t, y) for t, y in enumerate(ys)]
        )
        transcript.append_field_elements(round_poly.coefficients)
        proof_polynomials.append(round_poly)

        r = transcript.get_random_challenge()
        random_challenges.append(r)
        tables2 = fold_tables_kernel(ctx, tables2, _encode(ctx, r))

    return GkrSumcheckProof(proof_polynomials, claimed_sum, random_challenges)


# ----------------------------------------------------------------------
# analytic wiring-predicate evaluations for the verifier
# ----------------------------------------------------------------------

def _wiring_eval(ctx: FieldCtx, layer: Layer, coef_a, coef_m,
                 b_challenges: list[int], c_challenges: list[int]):
    """(add_i, mul_i) evaluated at bound (a -> coefs, b, c): each gate g
    contributes coef_g * eq(r_b, 2g) * eq(r_c, 2g+1)."""
    n = layer.n_gates
    rb = [_encode(ctx, v) for v in b_challenges]
    rc = [_encode(ctx, v) for v in c_challenges]
    eqb_even = eq_tensor(ctx, rb)[: 2 * n].reshape(n, 2, ctx.num_limbs)[:, 0]
    eqc_odd = eq_tensor(ctx, rc)[: 2 * n].reshape(n, 2, ctx.num_limbs)[:, 1]
    weight = fb.mont_mul(ctx, eqb_even, eqc_odd)
    a_val = fb.field_sum(ctx, fb.mont_mul(ctx, coef_a, weight), axis=0)
    m_val = fb.field_sum(ctx, fb.mont_mul(ctx, coef_m, weight), axis=0)
    import numpy as np

    a_int = int(ctx.unpack(np.asarray(fb.from_mont(ctx, a_val))))
    m_int = int(ctx.unpack(np.asarray(fb.from_mont(ctx, m_val))))
    return a_int, m_int


def verifier_claim_lazy(ctx: FieldCtx, layer: Layer, init_random_challenge: int,
                        sumcheck_challenges: list[int], o_1: int,
                        o_2: int) -> int:
    """Analytic get_verifier_claim (reference gkr_protocol.rs:294-314)."""
    _require_pow2(layer)
    n = layer.n_gates
    r = _encode(ctx, init_random_challenge)
    eq_a = eq_tensor(ctx, [r])[:n]
    add_mask, mul_mask = _gate_masks(ctx, layer)
    coef_a = fb.mont_mul(ctx, eq_a, add_mask)
    coef_m = fb.mont_mul(ctx, eq_a, mul_mask)
    mid = len(sumcheck_challenges) // 2
    a_r, m_r = _wiring_eval(
        ctx, layer, coef_a, coef_m,
        list(sumcheck_challenges[:mid]), list(sumcheck_challenges[mid:]),
    )
    p = ctx.spec.modulus
    return (a_r * (o_1 + o_2) + m_r * (o_1 * o_2)) % p


def folded_verifier_claim_lazy(ctx: FieldCtx, layer: Layer,
                               current_challenges: list[int],
                               previous_challenges: list[int], o_1: int,
                               o_2: int, alpha: int, beta: int) -> int:
    """Analytic get_folded_verifier_claim (reference gkr_protocol.rs:316-341)."""
    _require_pow2(layer)
    n = layer.n_gates
    mid = len(previous_challenges) // 2
    rb = [_encode(ctx, v) for v in previous_challenges[:mid]]
    rc = [_encode(ctx, v) for v in previous_challenges[mid:]]
    a = _encode(ctx, alpha)
    b = _encode(ctx, beta)
    eq_rb = eq_tensor(ctx, rb)[:n]
    eq_rc = eq_tensor(ctx, rc)[:n]
    folded = fb.add(ctx, fb.mont_mul(ctx, eq_rb, a), fb.mont_mul(ctx, eq_rc, b))
    add_mask, mul_mask = _gate_masks(ctx, layer)
    coef_a = fb.mont_mul(ctx, folded, add_mask)
    coef_m = fb.mont_mul(ctx, folded, mul_mask)
    cur_mid = len(current_challenges) // 2
    a_r, m_r = _wiring_eval(
        ctx, layer, coef_a, coef_m,
        list(current_challenges[:cur_mid]), list(current_challenges[cur_mid:]),
    )
    p = ctx.spec.modulus
    return (a_r * (o_1 + o_2) + m_r * (o_1 * o_2)) % p
