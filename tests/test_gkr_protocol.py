"""End-to-end GKR protocol tests (reference gkr_protocol.rs test module)."""

import pytest

from zktpu.field.spec import BLS12_381_FR
from zktpu.field import jnp_backend as fb
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.poly.univariate import UnivariatePoly
from zktpu.gkr.circuit import Circuit, Layer, ADD, MUL
from zktpu.gkr import protocol as gkr
from zktpu.pcs.kzg import KZG
from zktpu.curve import bls12_381 as hc

FR = BLS12_381_FR
ctx = fb.get_ctx(FR)


def test_get_fbc_poly():
    """gkr_protocol.rs:422-452: single add gate, r=5, w=[2,12]."""
    p = FR.modulus
    layer = Layer([ADD])
    w = MultilinearPoly.from_ints(ctx, [2, 12])
    fbc = gkr.get_fbc_poly(ctx, 5, layer, w, w)
    got = [[f.to_ints() for f in pr.factors] for pr in fbc.products]
    add_i_r = [0, (-4) % p, 0, 0]
    assert got[0] == [add_i_r, [4, 14, 14, 24]]
    assert got[1] == [[0, 0, 0, 0], [4, 24, 24, 144]]


def test_prove_verify_roundtrip():
    """gkr_protocol.rs:473-506: 3-layer circuit over BLS12-381 Fr."""
    structure = [[ADD, ADD, ADD, ADD], [MUL, ADD], [ADD]]
    circuit = Circuit(ctx, structure)
    inputs = [5, 2, 2, 4, 10, 0, 3, 3]
    proof = gkr.prove(circuit, inputs, taus=[11, 7, 13])
    assert gkr.verify(proof, circuit)


def test_verify_rejects_invalid_proof():
    """gkr_protocol.rs:508-570: dummy proof must fail."""
    structure = [[MUL, MUL], [ADD]]
    circuit = Circuit(ctx, structure)
    dummy = UnivariatePoly.interpolate(FR, [(0, 10), (1, 5)])
    kzg = KZG.setup(1, [1])
    input_proof = gkr.KzgProof(
        kzg_setup=kzg,
        commitment=hc.G1_GEN,
        proof=[[hc.G1_GEN], [hc.G1_GEN]],
        opened_evals=[1, 2],
    )
    invalid = gkr.GkrProof(
        output_poly=MultilinearPoly.from_ints(ctx, [10, 0]),
        proof_polynomials=[[dummy, dummy], [dummy, dummy, dummy, dummy]],
        claimed_evaluations=[(10, 5)],
        input_proof=input_proof,
    )
    assert not gkr.verify(invalid, circuit)


def test_verify_rejects_tampered_claimed_evaluation():
    structure = [[ADD, ADD], [MUL]]
    circuit = Circuit(ctx, structure)
    proof = gkr.prove(circuit, [1, 2, 3, 4], taus=[3, 9])
    assert gkr.verify(proof, circuit)
    o1, o2 = proof.claimed_evaluations[0]
    proof.claimed_evaluations[0] = ((o1 + 1) % FR.modulus, o2)
    assert not gkr.verify(proof, circuit)


def test_lazy_prover_matches_dense_bytes():
    """zktpu/gkr/lazy.py: the O(|w|) phase-table sumcheck must emit the exact
    round polynomials of the reference-shaped dense tensors."""
    structure = [[ADD, ADD, ADD, ADD], [MUL, ADD], [ADD]]
    circuit = Circuit(ctx, structure)
    inputs = [5, 2, 2, 4, 10, 0, 3, 3]
    dense = gkr.prove(circuit, inputs, taus=[11, 7, 13], lazy=False)
    lazy = gkr.prove(circuit, inputs, taus=[11, 7, 13], lazy=True)
    for layer_d, layer_l in zip(dense.proof_polynomials, lazy.proof_polynomials):
        assert [p.coefficients for p in layer_d] == [p.coefficients for p in layer_l]
    assert dense.claimed_evaluations == lazy.claimed_evaluations
    assert dense.input_proof.opened_evals == lazy.input_proof.opened_evals
    # cross-verification: both verifier paths accept the lazy proof
    assert gkr.verify(lazy, circuit, lazy=True)
    assert gkr.verify(lazy, circuit, lazy=False)


def test_lazy_scale_roundtrip():
    """A 2^5-input (31-gate) circuit: the wiring tables of the dense path
    would be 2^13 x ... per layer; the lazy path stays O(|w|). Mix of ops."""
    import numpy as np

    rng = np.random.default_rng(19)
    structure = []
    n = 16
    while n >= 1:
        structure.append([ADD if rng.integers(2) else MUL for _ in range(n)])
        n //= 2
    circuit = Circuit(ctx, structure)
    inputs = [int(v) for v in rng.integers(0, 1 << 61, size=32)]
    proof = gkr.prove(circuit, inputs, taus=[int(t) for t in rng.integers(2, 1 << 60, size=5)])
    assert gkr.verify(proof, circuit)
    # tamper: flip one claimed evaluation
    o1, o2 = proof.claimed_evaluations[1]
    proof.claimed_evaluations[1] = ((o1 + 1) % FR.modulus, o2)
    assert not gkr.verify(proof, circuit)


def test_single_layer_circuit():
    """Smallest circuit: one gate; output poly padded to 2 entries."""
    circuit = Circuit(ctx, [[MUL]])
    proof = gkr.prove(circuit, [3, 4], taus=[5])
    assert proof.output_poly.to_ints() == [12, 0]
    assert gkr.verify(proof, circuit)


def test_fused_lazy_prover_matches_host_bytes():
    """zktpu/gkr/fused_lazy.py: the single-dispatch device phases (on-device
    Fiat-Shamir, trim-aware absorb blocks) must emit the exact proof of the
    host lazy loop, including structurally-trimmed round polys (the all-ADD
    layer makes a quadratic coefficient vanish)."""
    structure = [[ADD, ADD, ADD, ADD], [MUL, ADD], [ADD]]
    circuit = Circuit(ctx, structure)
    inputs = [5, 2, 2, 4, 10, 0, 3, 3]
    host = gkr.prove(circuit, inputs, taus=[11, 7, 13], lazy=True, fused=False)
    dev = gkr.prove(circuit, inputs, taus=[11, 7, 13], lazy=True, fused=True)
    for lh, ld in zip(host.proof_polynomials, dev.proof_polynomials):
        assert [p.coefficients for p in lh] == [p.coefficients for p in ld]
    assert host.claimed_evaluations == dev.claimed_evaluations
    assert host.input_proof.opened_evals == dev.input_proof.opened_evals
    assert gkr.verify(dev, circuit)


def test_fused_lazy_big_round_path_matches_host_bytes(monkeypatch):
    """Force SCAN_SIZE down to 4 so several ``_big_round`` iterations run
    before the fixed-shape scan (the production path at real scales, where
    phase tables exceed the default SCAN_SIZE) and pin its bytes against the
    host lazy prover: first-round tail absorb, trim switch, and fold ordering
    must all agree."""
    import numpy as np

    from zktpu.gkr import fused_lazy

    monkeypatch.setattr(fused_lazy, "SCAN_SIZE", 4)

    rng = np.random.default_rng(23)
    structure = []
    n = 16
    while n >= 1:
        structure.append([ADD if rng.integers(2) else MUL for _ in range(n)])
        n //= 2
    circuit = Circuit(ctx, structure)
    inputs = [int(v) for v in rng.integers(0, 1 << 61, size=32)]
    taus = [int(t) for t in rng.integers(2, 1 << 60, size=5)]
    host = gkr.prove(circuit, inputs, taus=taus, lazy=True, fused=False)
    dev = gkr.prove(circuit, inputs, taus=taus, lazy=True, fused=True)
    for lh, ld in zip(host.proof_polynomials, dev.proof_polynomials):
        assert [p.coefficients for p in lh] == [p.coefficients for p in ld]
    assert host.claimed_evaluations == dev.claimed_evaluations
    assert host.input_proof.opened_evals == dev.input_proof.opened_evals
    assert gkr.verify(dev, circuit)
