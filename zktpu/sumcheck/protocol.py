"""Sumcheck protocols: plain (single MLE) and the GKR composed-poly variant.

Capability parity with /root/reference/sum_check/src/sum_check_protocol.rs:
  * ``prove``/``verify``      (:25-84)  -- non-interactive sumcheck, 2-point
    round polys, final oracle evaluation.
  * ``gkr_prove``/``gkr_verify`` (:86-150) -- sumcheck over a SumPoly with an
    externally-owned transcript; degree-d round polys via Lagrange
    interpolation (:152-166).

TPU design: the Fiat-Shamir squeeze makes rounds inherently serial, so the
round loop runs on host while each round's O(2^n) work is one fused jitted
kernel (`gkr_round_kernel`): a single pass computes the (degree+1) round-poly
evaluations from the halved tables, and a second fused pass folds all factor
tables at the challenge. Transcript bytes are identical to the reference
(coefficients / half-sums serialized via fq_vec_to_bytes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field.jnp_backend import FieldCtx
from ..poly.composed import ProductPoly, SumPoly
from ..poly.multilinear import MultilinearPoly
from ..poly.univariate import UnivariatePoly
from ..transcript import Transcript
from ..utils import tracker


@dataclasses.dataclass
class Proof:
    """Plain-sumcheck proof (reference :8-12)."""

    proof_polynomials: list[list[int]]
    claimed_sum: int


@dataclasses.dataclass
class GkrSumcheckProof:
    """Composed-poly sumcheck proof (reference GkrProof, :13-17)."""

    proof_polynomials: list[UnivariatePoly]
    claimed_sum: int
    random_challenges: list[int]


@dataclasses.dataclass
class GkrVerifyResult:
    verified: bool
    final_claimed_sum: int
    random_challenges: list[int]


# ----------------------------------------------------------------------
# fused device kernels
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def gkr_round_kernel(ctx: FieldCtx, tables, degree: int):
    """Round-poly evaluations for a 2-product x 2-factor SumPoly.

    ``tables``: uint32 (P, F, size, N) Montgomery tables (P products, F=2
    factors each, equal sizes -- the GKR f(b,c) shape). Returns ``ys`` of
    shape (degree+1, N): y_t = sum over the half-cube of
    sum_p prod_f (a + t*(b-a)), identical field values to the reference's
    partial_evaluate + reduce + sum at each t (:157-162).
    """
    P, F, size, N = tables.shape
    half = size // 2
    shaped = tables.reshape(P, F, 2, half, N)
    a = shaped[:, :, 0]
    b = shaped[:, :, 1]
    diff = fb.sub(ctx, b, a)

    ys = []
    t_mont = jnp.asarray(ctx.zero)
    one = jnp.asarray(ctx.one_mont)
    for t in range(degree + 1):
        if t == 0:
            vals = a
        elif t == 1:
            vals = b
        else:
            vals = fb.add(ctx, a, fb.mont_mul(ctx, t_mont, diff))
        # product over factors
        prod = vals[:, 0]
        for f in range(1, F):
            prod = fb.mont_mul(ctx, prod, vals[:, f])
        # sum over products, then over the hypercube
        total = prod[0]
        for p in range(1, P):
            total = fb.add(ctx, total, prod[p])
        ys.append(fb.field_sum(ctx, total, axis=0))
        t_mont = fb.add(ctx, t_mont, one)
    return jnp.stack(ys)


@functools.partial(jax.jit, static_argnums=(0,))
def fold_tables_kernel(ctx: FieldCtx, tables, value):
    """Fold variable 0 of every table at once. tables: (..., size, N)."""
    *lead, size, N = tables.shape
    shaped = tables.reshape(*lead, 2, size // 2, N)
    a = shaped[..., 0, :, :]
    b = shaped[..., 1, :, :]
    return fb.add(ctx, a, fb.mont_mul(ctx, value, fb.sub(ctx, b, a)))


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

def _to_int(ctx: FieldCtx, mont_limbs) -> int:
    return int(ctx.unpack(np.asarray(fb.from_mont(ctx, mont_limbs))))


def _to_ints(ctx: FieldCtx, mont_rows) -> list[int]:
    vals = ctx.unpack(np.asarray(fb.from_mont(ctx, mont_rows)))
    return [int(v) for v in np.atleast_1d(vals)]


def _encode(ctx: FieldCtx, value: int):
    return fb.to_mont(ctx, jnp.asarray(ctx.pack(value)))


def _sum_poly_tables(sum_poly: SumPoly):
    return jnp.stack(
        [jnp.stack([f.table for f in p.factors]) for p in sum_poly.products]
    )


# ----------------------------------------------------------------------
# plain sumcheck (reference :25-84)
# ----------------------------------------------------------------------

def prove(poly: MultilinearPoly) -> Proof:
    ctx = poly.ctx
    transcript = Transcript(ctx.spec, seed=poly.transcript_sponge())

    tracker.count("add", max(0, poly.table.shape[0] - 1))
    claimed_sum = _to_int(ctx, poly.sum_mont())
    transcript.append_field_elements([claimed_sum])

    proof_polynomials = []
    table = poly.table
    for _ in range(poly.num_vars):
        halves = _to_ints(ctx, jnp.stack(
            [fb.field_sum(ctx, table[: table.shape[0] // 2], axis=0),
             fb.field_sum(ctx, table[table.shape[0] // 2 :], axis=0)]
        ))
        transcript.append_field_elements(halves)
        proof_polynomials.append(halves)

        r = transcript.get_random_challenge()
        table = fold_tables_kernel(ctx, table, _encode(ctx, r))

    return Proof(proof_polynomials, claimed_sum)


def verify(poly: MultilinearPoly, proof: Proof) -> bool:
    ctx = poly.ctx
    transcript = Transcript(ctx.spec, seed=poly.transcript_sponge())
    transcript.append_field_elements([proof.claimed_sum])

    p = ctx.spec.modulus
    expected_sum = proof.claimed_sum % p
    random_challenges = []
    for round_poly in proof.proof_polynomials:
        if sum(round_poly) % p != expected_sum:
            return False
        transcript.append_field_elements(round_poly)
        r = transcript.get_random_challenge()
        # expected = p0 + r * (p1 - p0)   (reference :73-74)
        expected_sum = (round_poly[0] + r * (round_poly[1] - round_poly[0])) % p
        random_challenges.append(r)

    # final oracle check on the original polynomial (reference :81-83)
    return poly.evaluate_int(random_challenges) == expected_sum


# ----------------------------------------------------------------------
# GKR-variant sumcheck (reference :86-166)
# ----------------------------------------------------------------------

def gkr_prove(
    claimed_sum: int, composed_polynomial: SumPoly, transcript: Transcript
) -> GkrSumcheckProof:
    ctx = composed_polynomial.ctx
    spec = ctx.spec
    num_rounds = composed_polynomial.products[0].factors[0].num_vars
    degree = composed_polynomial.get_degree()

    tables = _sum_poly_tables(composed_polynomial)
    proof_polynomials = []
    random_challenges = []

    from ..field import pallas_kernels as pk

    for _ in range(num_rounds):
        P_, F_, size, _ = tables.shape
        half = size // 2
        # lerp muls for t >= 2, product muls, adds for sums + lerps
        tracker.count("mul", (degree - 1) * P_ * F_ * half + (degree + 1) * (F_ - 1) * P_ * half)
        tracker.count("add", (degree + 1) * P_ * half)
        use_pallas = (
            degree == 2 and (P_, F_) == (2, 2) and pk.pallas_available(size, pk.TILE // 4)
        )
        if use_pallas:
            ys = pk.lazy_rows_to_ints(ctx, pk.gkr_round_pallas(ctx, tables, degree))
        else:
            ys = _to_ints(ctx, gkr_round_kernel(ctx, tables, degree))
        round_poly = UnivariatePoly.interpolate(
            spec, [(t, y) for t, y in enumerate(ys)]
        )
        transcript.append_field_elements(round_poly.coefficients)
        proof_polynomials.append(round_poly)

        r = transcript.get_random_challenge()
        random_challenges.append(r)
        tracker.count("mul", tables.size // tables.shape[-1] // 2)
        r_mont = _encode(ctx, r)
        if use_pallas:
            tables = pk.fold_pallas(ctx, tables, r_mont)
        else:
            tables = fold_tables_kernel(ctx, tables, r_mont)

    return GkrSumcheckProof(proof_polynomials, claimed_sum, random_challenges)


def gkr_verify(
    round_polys: list[UnivariatePoly], claimed_sum: int, transcript: Transcript, spec
) -> GkrVerifyResult:
    p = spec.modulus
    claimed = claimed_sum % p
    random_challenges = []

    for round_poly in round_polys:
        f0 = round_poly.evaluate(0)
        f1 = round_poly.evaluate(1)
        if (f0 + f1) % p != claimed:
            return GkrVerifyResult(False, 0, [0])

        transcript.append_field_elements(round_poly.coefficients)
        r = transcript.get_random_challenge()
        random_challenges.append(r)
        claimed = round_poly.evaluate(r)

    return GkrVerifyResult(True, claimed, random_challenges)
