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
SRS and every commitment MSM run as batched-ladder device kernels
(``zktpu.curve.device``), and only the verifier's pairings run on host.
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
from ..msm import msm_bitsplit, generator_comb_mul

FR = BLS12_381_FR


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
        """MSM of the evaluation table against the Lagrange basis."""
        if poly.table.shape[0] != self.g1_lagrange_basis[0].shape[0]:
            raise ValueError("invalid polynomial or lagrange basis")
        scalars = fb.from_mont(poly.ctx, poly.table)
        jac = msm_bitsplit(self.g1_lagrange_basis, scalars)
        return dc.unpack_points(tuple(t[None] for t in jac))[0]

    def _commit_scalars(self, scalars_canonical):
        jac = msm_bitsplit(self.g1_lagrange_basis, scalars_canonical)
        return dc.unpack_points(tuple(t[None] for t in jac))[0]

    def open(self, opening_values: list[int], poly: MultilinearPoly) -> int:
        return poly.evaluate_int(list(opening_values))

    def get_proof(
        self, opened_value: int, opening_values: list[int], poly: MultilinearPoly
    ) -> list:
        """One quotient commitment per variable (reference :59-95)."""
        ctx = poly.ctx
        full_size = poly.table.shape[0]
        # poly - v
        v_mont = fb.to_mont(ctx, jnp.asarray(ctx.pack(opened_value)))
        table = fb.sub(ctx, poly.table, v_mont)

        proofs = []
        for value in opening_values:
            half = table.shape[0] // 2
            quotient = fb.sub(ctx, table[half:], table[:half])  # f|x0=1 - f|x0=0
            # blow up back to 2^n: tensor(ones, q, mul) == tile (reference :163-169)
            factor = full_size // quotient.shape[0]
            blown = jnp.tile(quotient, (factor, 1))
            proofs.append(self._commit_scalars(fb.from_mont(ctx, blown)))
            # remainder: fold variable 0 at the opening value
            value_mont = fb.to_mont(ctx, jnp.asarray(ctx.pack(value)))
            table = fold_kernel(ctx, table, 0, value_mont)
        return proofs

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
