"""Multilinear KZG polynomial commitment over BLS12-381.

Capability parity with /root/reference/pcs/src/kzg_pcs/kzg.rs:
  * trusted setup: Lagrange-basis SRS {G1 * eq_x(tau)} for every hypercube
    vertex x (:35-49, :183-212) and g2_taus = {G2 * tau_i} (:43-46);
  * ``commit`` = MSM of the evaluation table against the Lagrange basis
    (:51-53, :131-144);
  * ``open`` = plain evaluation (:55-57);
  * ``get_proof``: per variable, quotient q = f|_{x0=1} - f|_{x0=0},
    blown back up to 2^n entries by tensoring with ones (:59-95, :150-169),
    committed against the full basis; then f <- f|_{x0=value};
  * ``verify``: pairing check e(C - v*G1, G2) == prod_i e(Q_i, tau_i*G2 -
    a_i*G2) (:97-128).

TPU design: the eq_x(tau) table is built on device as a chain of tensor
products (one kron per variable, MSB-first to match ``generate_bhc``), the
SRS comes from a fixed-base comb, commitments use the Pippenger MSM
(zktpu/msm/pippenger.py), and only the verifier's pairings run on host.

Collapsed quotient bases: the reference commits each blown-up quotient
against the FULL basis -- n MSMs of 2^n points. Because ``blow_up_poly``
just tiles the quotient, commit(tile(q)) == MSM(q, C_k) where C_k[y] =
sum_j L[j * |q| + y] -- and the C_k form a halving chain of point adds
(C_{k+1} = C_k[:m] + C_k[m:]). get_proof therefore does MSMs of total size
2^n - 1 instead of n * 2^n, with bit-identical commitments.
"""

from __future__ import annotations

import dataclasses
import secrets

import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field.spec import BLS12_381_FR
from ..poly.multilinear import MultilinearPoly, tensor_kernel, fold_kernel
from ..curve import bls12_381 as hc
from ..curve import device as dc
from ..msm import generator_comb_mul, msm_bitsplit
from ..msm.pippenger import msm_pippenger

FR = BLS12_381_FR

#: below this size the bit-split MSM wins (Pippenger's sort/bucket pipeline
#: compiles ~40 point-op sites; bit-split is one fori_loop -- at small n the
#: compile cost dominates any runtime difference)
PIPPENGER_MIN = 4096


def _msm_auto(points, scalars):
    """Single- or multi-chip MSM: when a mesh is active (parallel.context)
    and the batch axis shards cleanly, each device runs the full Pippenger
    pipeline on its point shard and only D partial points cross chips."""
    from ..parallel import context as pctx

    mesh = pctx.current_mesh()
    if mesh is not None and pctx.shardable(scalars.shape[0], mesh):
        from ..parallel.mesh import msm_pippenger_sharded

        return msm_pippenger_sharded(mesh, points, scalars)
    if scalars.shape[0] >= PIPPENGER_MIN:
        return msm_pippenger(points, scalars)
    return msm_bitsplit(points, scalars)


def random_taus(num_vars: int) -> list[int]:
    """Fresh-entropy taus, the reference's StdRng::from_entropy equivalent
    (/root/reference/gkr/src/gkr_protocol.rs:94-101)."""
    return [secrets.randbelow(FR.modulus - 1) + 1 for _ in range(num_vars)]


def eq_table_device(taus: list[int]):
    """Device eq_x(tau) table for all 2^n MSB-first hypercube vertices x:
    a chain of kron products of (1 - tau_i, tau_i), replacing the reference's
    per-vertex product loop (kzg.rs:183-212)."""
    ctx = fb.get_ctx(FR)
    table = fb.to_mont(ctx, jnp.asarray(ctx.pack([1])))
    for tau in taus:
        pair = fb.to_mont(
            ctx, jnp.asarray(ctx.pack([(1 - tau) % FR.modulus, tau % FR.modulus]))
        )
        table = tensor_kernel(ctx, table, pair, "mul")
    return table  # (2^n, 16) Montgomery


@dataclasses.dataclass
class KZG:
    """SRS holder. ``g1_lagrange_basis``: device Jacobian tuple (X, Y, Z);
    ``g2_taus``: host G2 affine points."""

    g1_lagrange_basis: tuple
    g2_taus: list
    num_vars: int
    #: halving chain of collapsed bases for quotient commitments (lazy)
    _collapsed: list | None = dataclasses.field(default=None, repr=False)

    @classmethod
    def setup(cls, num_vars: int, taus: list[int] | None = None) -> "KZG":
        if num_vars < 1:
            raise ValueError("Invalid num of vars for lagrange basis")
        if taus is None:
            taus = random_taus(num_vars)
        if len(taus) != num_vars:
            raise ValueError("invalid taus or polynomials")
        ctx = fb.get_ctx(FR)
        eq_mont = eq_table_device(taus)
        scalars = fb.from_mont(ctx, eq_mont)  # canonical Fr limbs
        # fixed-base comb: ~16x fewer group ops than the reference's
        # per-vertex ladder (kzg.rs:183-212)
        basis = generator_comb_mul(scalars)
        g2_taus = [hc.multiply(hc.G2_GEN, t) for t in taus]
        return cls(basis, g2_taus, num_vars)

    @classmethod
    def for_poly(cls, polynomial: MultilinearPoly, taus: list[int]) -> "KZG":
        """Reference ``KZG::new(poly, taus)`` shape check (:18-33)."""
        if len(taus) != polynomial.num_vars:
            raise ValueError("invalid taus or polynomials")
        return cls.setup(polynomial.num_vars, taus)

    # ------------------------------------------------------------------

    def commit(self, poly: MultilinearPoly):
        """Pippenger MSM of the evaluation table against the Lagrange basis."""
        if poly.table.shape[0] != self.g1_lagrange_basis[0].shape[0]:
            raise ValueError("invalid polynomial or lagrange basis")
        scalars = fb.from_mont(poly.ctx, poly.table)
        jac = _msm_auto(self.g1_lagrange_basis, scalars)
        return dc.unpack_points(tuple(t[None] for t in jac))[0]

    def collapsed_bases(self, upto: int | None = None) -> list:
        """collapsed_bases()[k]: basis folded k+1 times -- the commitment
        basis for the step-k quotient (size 2^(n-1-k)). Built incrementally
        (the batched get_proof needs only step 0), each fold through the
        width-quantized Pallas point kernel (one cached Mosaic program per
        width instead of a giant unrolled XLA site per chain step)."""
        from ..curve import lm_point as lp
        from ..curve.pallas_point import point_add_px

        if upto is None:
            upto = self.num_vars
        chain = self._collapsed if self._collapsed is not None else []
        while len(chain) < upto:
            prev = (
                self.g1_lagrange_basis if not chain else chain[-1]
            )
            cur = lp.to_lm(prev)
            half = cur[0].shape[1] // 2
            cur = point_add_px(
                tuple(v[:, :half] for v in cur),
                tuple(v[:, half:] for v in cur),
            )
            chain.append(lp.from_lm(cur))
        object.__setattr__(self, "_collapsed", chain)
        return self._collapsed

    def open(self, opening_values: list[int], poly: MultilinearPoly) -> int:
        return poly.evaluate_int(list(opening_values))

    def _quotients(self, opened_value: int, opening_values: list[int],
                   poly: MultilinearPoly):
        """(n_vars, 2^(n-1), N) Montgomery stack of all quotient tables,
        each tiled up to half the full size (reference blow_up_poly
        semantics, kzg.rs:163-169: tiling never changes the committed
        element when paired with the once-collapsed basis)."""
        ctx = poly.ctx
        v_mont = fb.to_mont(ctx, jnp.asarray(ctx.pack(opened_value)))
        table = fb.sub(ctx, poly.table, v_mont)
        half0 = max(table.shape[0] // 2, 1)
        quotients = []
        for value in opening_values:
            half = table.shape[0] // 2
            quotient = fb.sub(ctx, table[half:], table[:half])  # f|x0=1 - f|x0=0
            if half < half0:
                quotient = jnp.tile(quotient, (half0 // half, 1))
            quotients.append(quotient)
            # remainder: fold variable 0 at the opening value
            value_mont = fb.to_mont(ctx, jnp.asarray(ctx.pack(value)))
            table = fold_kernel(ctx, table, 0, value_mont)
        return jnp.stack(quotients)

    def _commit_quotients(self, stacked) -> list:
        """Segment-batched commitment of a (S, 2^(n-1), N) Montgomery
        quotient stack against the once-collapsed basis: ONE MSM dispatch
        for all S quotients (round-5 fix: S individual small-MSM ladders
        cost 90 s of a 93 s GKR 2^12 prove)."""
        from ..msm.pippenger import msm_pippenger_multi
        from ..parallel import context as pctx

        ctx = fb.get_ctx(FR)
        scalars = fb.from_mont(ctx, stacked)
        base = self.collapsed_bases(upto=1)[0]
        mesh = pctx.current_mesh()
        if mesh is not None and pctx.shardable(
            scalars.shape[0] * scalars.shape[1], mesh
        ):
            from ..parallel.mesh import msm_pippenger_multi_sharded

            jac = msm_pippenger_multi_sharded(mesh, base, scalars)
        else:
            jac = msm_pippenger_multi(base, scalars)
        return dc.unpack_points(jac)

    def get_proof(
        self, opened_value: int, opening_values: list[int], poly: MultilinearPoly
    ) -> list:
        """One quotient commitment per variable (reference :59-95)."""
        stacked = self._quotients(opened_value, opening_values, poly)
        return self._commit_quotients(stacked)

    def get_proof_pair(self, openings_b, openings_c, poly: MultilinearPoly):
        """Both GKR opening proofs (r_b, r_c) in one batched MSM dispatch:
        2n segments instead of two n-segment calls."""
        (val_b, pts_b), (val_c, pts_c) = openings_b, openings_c
        qb = self._quotients(val_b, pts_b, poly)
        qc = self._quotients(val_c, pts_c, poly)
        both = self._commit_quotients(jnp.concatenate([qb, qc], axis=0))
        return both[: len(pts_b)], both[len(pts_b):]

    def commit_with_proof_pair(self, openings_b, openings_c,
                               poly: MultilinearPoly,
                               _force_batched: bool | None = None):
        """(commitment, proofs_b, proofs_c) -- at small scale ALL the MSMs
        of a GKR input proof run in ONE ladder program: the commitment
        splits into two half-size segments against the basis halves
        (MSM(t, L) = MSM(t[:h], L[:h]) + MSM(t[h:], L[h:])) and rides the
        same batch as the 2n quotient segments. One cold remote-compile
        instead of three (the compile, not the group ops, dominates a cold
        GKR prove -- BENCH_NOTES round 5)."""
        from ..curve import lm_point as lp
        from ..curve.pallas_point import (
            pallas_points_available, point_add_px,
        )
        from ..msm.pippenger import MULTI_LADDER_MAX
        from ..msm.bit_split import msm_bitsplit_multi_px
        from ..parallel import context as pctx

        ctx = poly.ctx
        full = poly.table.shape[0]
        half = max(full // 2, 1)
        (val_b, pts_b), (val_c, pts_c) = openings_b, openings_c
        qb = self._quotients(val_b, pts_b, poly)
        qc = self._quotients(val_c, pts_c, poly)
        nb = qb.shape[0]
        S_total = 2 + qb.shape[0] + qc.shape[0]
        batched = _force_batched
        if batched is None:
            batched = (
                pallas_points_available()
                and full >= 4
                and pctx.current_mesh() is None
                and S_total * half <= MULTI_LADDER_MAX
            )
        if not batched:
            commitment = self.commit(poly)
            both = self._commit_quotients(jnp.concatenate([qb, qc], axis=0))
            return commitment, both[:nb], both[nb:]

        scalars = fb.from_mont(
            ctx,
            jnp.concatenate(
                [poly.table.reshape(2, half, ctx.num_limbs), qb, qc], axis=0
            ),
        )
        base_full = lp.to_lm(self.g1_lagrange_basis)   # (24, full)
        base_halves = tuple(v.reshape(-1, 2, half) for v in base_full)
        base_q = lp.to_lm(self.collapsed_bases(upto=1)[0])  # (24, half)
        bases = tuple(
            jnp.concatenate(
                [bh, jnp.broadcast_to(bq[:, None, :],
                                      (bq.shape[0], S_total - 2, half))],
                axis=1,
            )
            for bh, bq in zip(base_halves, base_q)
        )
        out = msm_bitsplit_multi_px(bases, scalars)   # (24, S_total)
        c_pt = point_add_px(
            tuple(v[:, 0:1] for v in out), tuple(v[:, 1:2] for v in out)
        )
        commitment = dc.unpack_points(
            tuple(jnp.swapaxes(v, 0, 1) for v in c_pt)
        )[0]
        rest = dc.unpack_points(
            tuple(jnp.swapaxes(v[:, 2:], 0, 1) for v in out)
        )
        return commitment, rest[:nb], rest[nb:]

    @staticmethod
    def verify(
        commitment,
        opened_value: int,
        proof: list,
        opening_values: list[int],
        g2_taus: list,
    ) -> bool:
        """Host pairing product check (reference :97-128), with a single
        final exponentiation."""
        if len(proof) != len(opening_values):
            raise ValueError(
                "num of quotients in proof not equal to num of opening values"
            )
        lhs_pt = hc.add(commitment, hc.neg(hc.multiply(hc.G1_GEN, opened_value)))
        lhs = [(lhs_pt, hc.G2_GEN)]
        rhs = []
        for i, a_i in enumerate(opening_values):
            factor = hc.add(g2_taus[i], hc.neg(hc.multiply(hc.G2_GEN, a_i)))
            rhs.append((proof[i], factor))
        return hc.pairing_product_equals(lhs, rhs)
