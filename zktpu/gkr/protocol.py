"""GKR prover/verifier with a multilinear-KZG input commitment.

Capability parity with /root/reference/gkr/src/gkr_protocol.rs (the
reference's crown jewel, SURVEY.md section 3.1/3.2):

  * ``prove`` (:31-126): evaluate the circuit, absorb the output layer,
    then walk layers output -> input; layer 0 uses the f(b,c) polynomial
    f = add_i(r,b,c)*(w(b)+w(c)) + mul_i(r,b,c)*(w(b)*w(c)) (:243-263),
    later layers the alpha/beta-folded variant (:265-292); each layer runs
    the composed-poly sumcheck; the input layer is committed and opened at
    (r_b, r_c) with multilinear KZG (:92-118).
  * ``verify`` (:128-227): re-derives every challenge from the transcript,
    checks each sumcheck, KZG-verifies the input openings, and recomputes
    the layer identity via the wiring predicates (:294-341).

Field: BLS12-381 Fr (reference :3,360). Transcript bytes match the reference
exactly; all O(2^n) steps (circuit eval, wiring tables, tensor w-polys,
sumcheck rounds, MSMs) are device kernels.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..field import jnp_backend as fb
from ..field.spec import BLS12_381_FR
from ..poly.multilinear import MultilinearPoly
from ..poly.composed import ProductPoly, SumPoly
from ..poly.univariate import UnivariatePoly
from ..sumcheck import protocol as sumcheck
from ..transcript import Transcript
from ..pcs.kzg import KZG, random_taus
from .circuit import Circuit, Layer, ADD, MUL
from . import lazy as lazy_mod

FR = BLS12_381_FR


@dataclasses.dataclass
class KzgProof:
    """Reference ``KzgProof`` (:16-21)."""

    kzg_setup: KZG
    commitment: object
    proof: list  # [proof_at_rb, proof_at_rc], each a list of G1 points
    opened_evals: list  # [w(r_b), w(r_c)]


@dataclasses.dataclass
class GkrProof:
    """Reference ``GkrProof`` (:24-29)."""

    output_poly: MultilinearPoly
    proof_polynomials: list  # per layer: list[UnivariatePoly]
    claimed_evaluations: list  # per non-final layer: (o_1, o_2)
    input_proof: KzgProof


def _encode(ctx, value: int):
    return fb.to_mont(ctx, jnp.asarray(ctx.pack(value % FR.modulus)))


def _initiate_protocol(transcript: Transcript, output_poly: MultilinearPoly):
    """Absorb w_0, squeeze r, evaluate m_0 (reference :229-241)."""
    transcript.append(output_poly.to_transcript_bytes())
    random_challenge = transcript.get_random_challenge()
    m_0 = output_poly.evaluate_int([random_challenge])
    transcript.append_field_elements([m_0])
    return m_0, random_challenge


def get_fbc_poly(ctx, random_challenge: int, layer: Layer, w_b: MultilinearPoly,
                 w_c: MultilinearPoly) -> SumPoly:
    """f(b,c) as a SumPoly of two 2-factor products (reference :243-263)."""
    r = _encode(ctx, random_challenge)
    add_i = layer.get_add_mul_i(ctx, ADD).partial_evaluate(0, r)
    mul_i = layer.get_add_mul_i(ctx, MUL).partial_evaluate(0, r)

    summed_w = MultilinearPoly.tensor_add_mul(ctx, w_b, w_c, "add")
    multiplied_w = MultilinearPoly.tensor_add_mul(ctx, w_b, w_c, "mul")

    return SumPoly(ctx, [
        ProductPoly(ctx, [add_i, summed_w]),
        ProductPoly(ctx, [mul_i, multiplied_w]),
    ])


def get_folded_fbc_poly(ctx, layer: Layer, w_b: MultilinearPoly,
                        w_c: MultilinearPoly, r_b: list[int], r_c: list[int],
                        alpha: int, beta: int) -> SumPoly:
    """alpha/beta random-linear-combination fold (reference :265-292)."""
    add_i = layer.get_add_mul_i(ctx, ADD)
    mul_i = layer.get_add_mul_i(ctx, MUL)
    rb = [_encode(ctx, v) for v in r_b]
    rc = [_encode(ctx, v) for v in r_c]
    a = _encode(ctx, alpha)
    b = _encode(ctx, beta)

    def fold_both(poly):
        return (poly.multi_partial_evaluate(rb).scale(a)
                + poly.multi_partial_evaluate(rc).scale(b))

    summed_add_i = fold_both(add_i)
    summed_mul_i = fold_both(mul_i)
    summed_w = MultilinearPoly.tensor_add_mul(ctx, w_b, w_c, "add")
    multiplied_w = MultilinearPoly.tensor_add_mul(ctx, w_b, w_c, "mul")

    return SumPoly(ctx, [
        ProductPoly(ctx, [summed_add_i, summed_w]),
        ProductPoly(ctx, [summed_mul_i, multiplied_w]),
    ])


def get_verifier_claim(ctx, layer: Layer, init_random_challenge: int,
                       sumcheck_challenges: list[int], o_1: int, o_2: int) -> int:
    """Recompute the layer identity at the challenges (reference :294-314)."""
    all_challenges = [init_random_challenge] + list(sumcheck_challenges)
    a_r = layer.get_add_mul_i(ctx, ADD).evaluate_int(all_challenges)
    m_r = layer.get_add_mul_i(ctx, MUL).evaluate_int(all_challenges)
    p = FR.modulus
    return (a_r * (o_1 + o_2) + m_r * (o_1 * o_2)) % p


def get_folded_verifier_claim(ctx, layer: Layer, current_challenges: list[int],
                              previous_challenges: list[int], o_1: int, o_2: int,
                              alpha: int, beta: int) -> int:
    """Folded layer identity (reference :316-341)."""
    mid = len(previous_challenges) // 2
    prev_rb = previous_challenges[:mid]
    prev_rc = previous_challenges[mid:]

    add_i = layer.get_add_mul_i(ctx, ADD)
    mul_i = layer.get_add_mul_i(ctx, MUL)
    rb = [_encode(ctx, v) for v in prev_rb]
    rc = [_encode(ctx, v) for v in prev_rc]
    a = _encode(ctx, alpha)
    b = _encode(ctx, beta)

    summed_add_i = add_i.multi_partial_evaluate(rb).scale(a) + \
        add_i.multi_partial_evaluate(rc).scale(b)
    summed_mul_i = mul_i.multi_partial_evaluate(rb).scale(a) + \
        mul_i.multi_partial_evaluate(rc).scale(b)

    a_r = summed_add_i.evaluate_int(list(current_challenges))
    m_r = summed_mul_i.evaluate_int(list(current_challenges))
    p = FR.modulus
    return (a_r * (o_1 + o_2) + m_r * (o_1 * o_2)) % p


def _lazy_ok(circuit: Circuit) -> bool:
    """The lazy fbc path covers power-of-two layers with <= 2 output gates
    (always true for well-formed reference circuits); anything else falls
    back to the dense tensors."""
    sizes_ok = all((l.n_gates & (l.n_gates - 1)) == 0 for l in circuit.layers)
    return sizes_ok and circuit.layers[-1].n_gates <= 2


def prove(circuit: Circuit, inputs: list[int], taus: list[int] | None = None,
          lazy: bool | None = None, fused: bool | None = None,
          mesh=None) -> GkrProof:
    """Full GKR proof over BLS12-381 Fr (reference :31-126).

    ``lazy``: use the O(|w|) phase-table sumcheck (zktpu/gkr/lazy.py) instead
    of the reference-shaped dense tensors; proof bytes are identical (tested).
    Auto-selected when None. ``fused``: run each lazy phase as one device
    program with on-device Fiat-Shamir (zktpu/gkr/fused_lazy.py); defaults to
    True whenever the lazy path is active. ``mesh``: a jax.sharding.Mesh --
    each layer's sumcheck runs minor-bit sharded across it (parallel/mesh.py)
    and the KZG commitment/quotient MSMs run point-sharded; proof bytes are
    identical to the single-device run (tested on the 8-device CPU mesh)."""
    import os
    import sys
    import time as _time

    from ..parallel import context as pctx

    if mesh is not None:
        with pctx.use_mesh(mesh):
            return prove(circuit, inputs, taus=taus, lazy=lazy, fused=fused)
    mesh = pctx.current_mesh()

    trace = os.environ.get("ZKTPU_TRACE") == "1"
    marks = [("start", _time.time())]

    def mark(label: str) -> None:
        if trace:
            marks.append((label, _time.time()))
            prev = marks[-2][1]
            print(f"    [gkr.prove] {label}: {marks[-1][1]-prev:.2f}s",
                  file=sys.stderr, flush=True)

    ctx = fb.get_ctx(FR)
    transcript = Transcript(FR)
    if lazy is None:
        lazy = _lazy_ok(circuit)
    if fused is None:
        fused = lazy

    input_poly = MultilinearPoly.from_ints(ctx, inputs)
    mark("inputs upload")
    circuit_evaluations = circuit.evaluate(input_poly)
    mark("circuit evaluate")

    w_0 = circuit_evaluations[-1]
    if w_0.table.shape[0] == 1:  # pad single output to a 1-var MLE (:36-38)
        w_0 = MultilinearPoly(
            ctx, jnp.concatenate([w_0.table, jnp.zeros_like(w_0.table)], axis=0)
        )
    output_poly = w_0

    claimed_sum, random_challenge = _initiate_protocol(transcript, output_poly)

    num_layers = circuit.num_layers
    proof_polys = []
    claimed_evaluations = []
    current_rb: list[int] = []
    current_rc: list[int] = []
    alpha = beta = 0

    evals_rev = list(reversed(circuit_evaluations))
    layers_rev = list(reversed(circuit.layers))

    for idx, layer in enumerate(layers_rev):
        w_i = input_poly if idx == num_layers - 1 else evals_rev[idx + 1]

        if lazy:
            if idx == 0:
                fbc_poly = lazy_mod.lazy_fbc(ctx, random_challenge, layer, w_i)
            else:
                fbc_poly = lazy_mod.lazy_folded_fbc(
                    ctx, layer, w_i, current_rb, current_rc, alpha, beta
                )
            from ..parallel import context as _pc

            if mesh is not None and _pc.shardable(
                fbc_poly.w_table.shape[0], mesh, min_rows=1
            ):
                from ..parallel.mesh import gkr_sumcheck_lazy_sharded

                sc_proof = gkr_sumcheck_lazy_sharded(
                    claimed_sum, fbc_poly, transcript, mesh
                )
            elif fused:
                from .fused_lazy import gkr_prove_lazy_fused

                sc_proof = gkr_prove_lazy_fused(claimed_sum, fbc_poly, transcript)
            else:
                sc_proof = lazy_mod.gkr_prove_lazy(claimed_sum, fbc_poly, transcript)
        else:
            if idx == 0:
                fbc_poly = get_fbc_poly(ctx, random_challenge, layer, w_i, w_i)
            else:
                fbc_poly = get_folded_fbc_poly(
                    ctx, layer, w_i, w_i, current_rb, current_rc, alpha, beta
                )
            sc_proof = sumcheck.gkr_prove(claimed_sum, fbc_poly, transcript)
        proof_polys.append(sc_proof.proof_polynomials)

        mid = len(sc_proof.random_challenges) // 2
        current_rb = sc_proof.random_challenges[:mid]
        current_rc = sc_proof.random_challenges[mid:]

        mark(f"layer {idx} sumcheck ({w_i.table.shape[0]} w-entries)")
        o_1 = w_i.evaluate_int(current_rb)
        o_2 = w_i.evaluate_int(current_rc)
        mark(f"layer {idx} o1/o2 evals")

        if idx < num_layers - 1:
            transcript.append_field_elements([o_1])
            alpha = transcript.get_random_challenge()
            transcript.append_field_elements([o_2])
            beta = transcript.get_random_challenge()
            claimed_sum = (alpha * o_1 + beta * o_2) % FR.modulus
            claimed_evaluations.append((o_1, o_2))

    # KZG input commitment (taus from entropy inside prove, reference :92-103)
    if taus is None:
        taus = random_taus(input_poly.num_vars)
    kzg_instance = KZG.for_poly(input_poly, taus)
    mark("KZG setup (SRS comb + g2 taus)")
    w_b_eval = kzg_instance.open(current_rb, input_poly)
    w_c_eval = kzg_instance.open(current_rc, input_poly)
    mark("KZG opens")
    commitment, w_b_proof, w_c_proof = kzg_instance.commit_with_proof_pair(
        (w_b_eval, current_rb), (w_c_eval, current_rc), input_poly
    )
    mark("KZG commit + proofs (batched MSMs)")

    input_proof = KzgProof(
        kzg_setup=kzg_instance,
        commitment=commitment,
        proof=[w_b_proof, w_c_proof],
        opened_evals=[w_b_eval, w_c_eval],
    )

    return GkrProof(output_poly, proof_polys, claimed_evaluations, input_proof)


def verify(proof: GkrProof, circuit: Circuit, lazy: bool | None = None) -> bool:
    """Reference :128-227. ``lazy`` selects the analytic wiring-predicate
    evaluation (same field values as the dense tables; auto when None)."""
    ctx = fb.get_ctx(FR)
    transcript = Transcript(FR)
    if lazy is None:
        lazy = _lazy_ok(circuit)

    current_claim, init_random_challenge = _initiate_protocol(
        transcript, proof.output_poly
    )

    alpha = beta = 0
    prev_challenges: list[int] = []
    layers_rev = list(reversed(circuit.layers))
    num_layers = len(layers_rev)

    for i, layer in enumerate(layers_rev):
        sc_verify = sumcheck.gkr_verify(
            proof.proof_polynomials[i], current_claim, transcript, FR
        )
        if not sc_verify.verified:
            return False

        challenges = sc_verify.random_challenges

        if i == num_layers - 1:
            mid = len(challenges) // 2
            r_b, r_c = challenges[:mid], challenges[mid:]
            kzg = proof.input_proof
            wb_ok = KZG.verify(
                kzg.commitment, kzg.opened_evals[0], kzg.proof[0], r_b,
                kzg.kzg_setup.g2_taus,
            )
            wc_ok = KZG.verify(
                kzg.commitment, kzg.opened_evals[1], kzg.proof[1], r_c,
                kzg.kzg_setup.g2_taus,
            )
            if not (wb_ok and wc_ok):
                return False
            o_1, o_2 = kzg.opened_evals
        else:
            o_1, o_2 = proof.claimed_evaluations[i]

        if i == 0:
            claim_fn = (lazy_mod.verifier_claim_lazy if lazy
                        else get_verifier_claim)
            expected_claim = claim_fn(
                ctx, layer, init_random_challenge, challenges, o_1, o_2
            )
        else:
            claim_fn = (lazy_mod.folded_verifier_claim_lazy if lazy
                        else get_folded_verifier_claim)
            expected_claim = claim_fn(
                ctx, layer, challenges, prev_challenges, o_1, o_2, alpha, beta
            )

        if expected_claim != sc_verify.final_claimed_sum % FR.modulus:
            return False

        prev_challenges = challenges

        transcript.append_field_elements([o_1])
        alpha = transcript.get_random_challenge()
        transcript.append_field_elements([o_2])
        beta = transcript.get_random_challenge()
        current_claim = (alpha * o_1 + beta * o_2) % FR.modulus

    return True
