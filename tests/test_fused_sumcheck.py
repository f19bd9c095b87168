"""Fused (device-side Fiat-Shamir) prover == host-loop prover, bit for bit.

The fused prover derives every challenge through the on-device Keccak sponge
(zktpu/hash/keccak_device.py); any deviation from the reference transcript
protocol (/root/reference/fiat_shamir/src/fiat_shamir_transcript.rs:19-29)
would change the proof bytes, so plain equality is the strongest check.
"""

import numpy as np
import pytest

from zktpu.field.spec import BN254_FQ, BLS12_381_FR
from zktpu.field import jnp_backend as fb
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.sumcheck import protocol as sc
from zktpu.sumcheck import fused


@pytest.mark.parametrize("spec,nv", [(BN254_FQ, 4), (BN254_FQ, 7), (BLS12_381_FR, 9)])
def test_fused_matches_host_loop(spec, nv):
    ctx = fb.get_ctx(spec)
    rng = np.random.default_rng(nv)
    vals = [int(a) * int(b) % spec.modulus for a, b in rng.integers(0, 2**62, size=(1 << nv, 2))]
    poly = MultilinearPoly.from_ints(ctx, vals)
    ref = sc.prove(poly)
    got = fused.prove(poly)
    assert got.claimed_sum == ref.claimed_sum
    assert got.proof_polynomials == ref.proof_polynomials
    assert sc.verify(poly, got)


def test_fused_tampered_proof_rejected():
    ctx = fb.get_ctx(BN254_FQ)
    poly = MultilinearPoly.from_ints(ctx, list(range(1 << 5)))
    proof = fused.prove(poly)
    assert sc.verify(poly, proof)
    proof.proof_polynomials[2][0] = (proof.proof_polynomials[2][0] + 1) % BN254_FQ.modulus
    assert not sc.verify(poly, proof)


def test_fused_uses_pallas_interpret(monkeypatch):
    """Same bits through the Pallas kernel path (interpret mode on CPU)."""
    monkeypatch.setenv("ZKTPU_PALLAS_INTERPRET", "1")
    ctx = fb.get_ctx(BLS12_381_FR)
    rng = np.random.default_rng(0)
    nv = 13  # 8192 >= 4*TILE so pallas_available() holds
    vals = [int(v) for v in rng.integers(0, 1 << 62, size=1 << nv)]
    poly = MultilinearPoly.from_ints(ctx, vals)
    ref = sc.prove(poly)
    got = fused.prove(poly)
    assert got.proof_polynomials == ref.proof_polynomials


def test_host_sum_mod_p():
    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(2)
    vals = [int(a) * int(b) % BN254_FQ.modulus for a, b in rng.integers(0, 2**62, size=(64, 2))]
    canonical = ctx.pack(vals)
    assert fused.host_sum_mod_p(ctx, canonical) == sum(vals) % BN254_FQ.modulus
