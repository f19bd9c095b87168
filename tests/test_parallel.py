"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The sharded paths must be *byte-identical* to their dense counterparts --
sharding is an execution detail, never a semantic one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zktpu.field.spec import BN254_FQ, BN254_FR, BLS12_381_FR
from zktpu.field import jnp_backend as fb
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.sumcheck import protocol as sc
from zktpu.parallel import mesh as pm
from zktpu.ntt.ntt import ntt


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pm.make_mesh(8)


def test_sharded_fold_and_sums_match_dense(mesh):
    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(0)
    vals = [int(v) for v in rng.integers(0, 1 << 40, size=256)]
    poly = MultilinearPoly.from_ints(ctx, vals)

    sharded = pm.ShardedMLE.shard(poly, mesh)
    dense_sums = sc._to_ints(ctx, poly.halves_sums())
    shard_sums = sc._to_ints(ctx, sharded.halves_sums())
    assert dense_sums == shard_sums

    r = poly.encode_scalar(987654321)
    dense_folded = poly.partial_evaluate(0, r)
    shard_folded = sharded.fold(r).gather()
    assert dense_folded.to_ints() == shard_folded.to_ints()


def test_sharded_sumcheck_prove_matches_dense(mesh):
    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(1)
    vals = [int(v) for v in rng.integers(0, 1 << 40, size=128)]
    poly = MultilinearPoly.from_ints(ctx, vals)

    dense_proof = sc.prove(poly)
    sharded_proof = pm.sumcheck_prove_sharded(poly, mesh)
    assert sharded_proof.claimed_sum == dense_proof.claimed_sum
    assert sharded_proof.proof_polynomials == dense_proof.proof_polynomials
    assert sc.verify(poly, sharded_proof)


def test_sharded_sumcheck_small_table(mesh):
    """Table no bigger than the mesh: every round runs on the gathered path."""
    ctx = fb.get_ctx(BN254_FQ)
    poly = MultilinearPoly.from_ints(ctx, [3, 1, 4, 1, 5, 9, 2, 6])
    dense_proof = sc.prove(poly)
    sharded_proof = pm.sumcheck_prove_sharded(poly, mesh)
    assert sharded_proof.proof_polynomials == dense_proof.proof_polynomials


def test_sharded_ntt_matches_dense(mesh):
    ctx = fb.get_ctx(BN254_FR)
    rng = np.random.default_rng(2)
    vals = [int(v) for v in rng.integers(0, 1 << 40, size=64)]
    table = fb.to_mont(ctx, jnp.asarray(ctx.pack(vals)))

    dense = np.asarray(fb.from_mont(ctx, ntt(ctx, table)))
    sharded = np.asarray(fb.from_mont(ctx, pm.ntt_sharded(ctx, mesh, table)))
    assert (dense == sharded).all()

    inv_dense = np.asarray(fb.from_mont(ctx, ntt(ctx, table, inverse=True)))
    inv_sharded = np.asarray(
        fb.from_mont(ctx, pm.ntt_sharded(ctx, mesh, table, inverse=True))
    )
    assert (inv_dense == inv_sharded).all()


def test_sharded_point_tree_sum(mesh):
    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc

    pts_host = [hc.multiply(hc.G1_GEN, k) for k in range(1, 17)]
    acc = pm.point_tree_sum_sharded(mesh, dc.pack_points(pts_host))
    got = dc.unpack_points(tuple(t[None] for t in acc))[0]
    assert got == hc.multiply(hc.G1_GEN, sum(range(1, 17)))


def test_sharded_lazy_gkr_sumcheck_matches_dense(mesh):
    """gkr_sumcheck_lazy_sharded must emit the exact round polynomials and
    challenges of the single-device lazy prover (zktpu/gkr/lazy.py)."""
    from zktpu.gkr import lazy as lazy_mod
    from zktpu.gkr.circuit import Layer, ADD, MUL
    from zktpu.transcript import Transcript

    ctx = fb.get_ctx(BLS12_381_FR)
    rng = np.random.default_rng(3)
    n_gates = 16
    ops = [ADD if rng.integers(2) else MUL for _ in range(n_gates)]
    layer = Layer(ops)
    w_vals = [int(v) for v in rng.integers(0, 1 << 60, size=2 * n_gates)]
    w = MultilinearPoly.from_ints(ctx, w_vals)
    r_b = [int(v) for v in rng.integers(1, 1 << 60, size=4)]
    r_c = [int(v) for v in rng.integers(1, 1 << 60, size=4)]
    alpha, beta = 12345, 67890

    fbc = lazy_mod.lazy_folded_fbc(ctx, layer, w, r_b, r_c, alpha, beta)
    t_dense = Transcript(BLS12_381_FR)
    dense = lazy_mod.gkr_prove_lazy(777, fbc, t_dense)

    fbc2 = lazy_mod.lazy_folded_fbc(ctx, layer, w, r_b, r_c, alpha, beta)
    t_shard = Transcript(BLS12_381_FR)
    sharded = pm.gkr_sumcheck_lazy_sharded(777, fbc2, t_shard, mesh)

    assert [p.coefficients for p in dense.proof_polynomials] == \
        [p.coefficients for p in sharded.proof_polynomials]
    assert dense.random_challenges == sharded.random_challenges
    assert t_dense.get_random_challenge() == t_shard.get_random_challenge()


def test_sharded_pippenger_matches_host(mesh):
    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc

    rng = np.random.default_rng(5)
    n = 64  # 8 points per device
    base = [hc.multiply(hc.G1_GEN, int(k)) for k in rng.integers(1, 1 << 30, size=8)]
    pts_host = [base[i % 8] for i in range(n)]
    scalars = [int(a) * int(b) % hc.R_ORDER
               for a, b in rng.integers(1, 1 << 62, size=(n, 2))]
    expect = None
    for p, s in zip(pts_host, scalars):
        t = hc.multiply(p, s)
        expect = t if expect is None else hc.add(expect, t)

    pts = dc.pack_points(pts_host)
    sc_packed = dc.pack_scalars(scalars)
    acc = pm.msm_pippenger_sharded(mesh, pts, sc_packed, c=4)
    got = dc.unpack_points(tuple(t[None] for t in acc))[0]
    assert got == expect


def test_sharded_ladder_msm_matches_host(mesh):
    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc

    pts_host = [hc.multiply(hc.G1_GEN, k) for k in range(1, 17)]
    scalars = list(range(3, 19))
    expect = None
    for p, s in zip(pts_host, scalars):
        t = hc.multiply(p, s)
        expect = t if expect is None else hc.add(expect, t)
    acc = pm.msm_sharded(mesh, dc.pack_points(pts_host), dc.pack_scalars(scalars))
    got = dc.unpack_points(tuple(t[None] for t in acc))[0]
    assert got == expect


def test_mesh_gkr_prove_end_to_end_byte_identical(mesh, monkeypatch):
    """End-to-end multi-chip flagship: gkr.prove(mesh=...) -- minor-bit
    sharded layer sumchecks + point-sharded KZG commitment/quotient MSMs --
    must produce the exact proof of the single-device run."""
    from zktpu.gkr.circuit import Circuit, ADD, MUL
    from zktpu.gkr import protocol as gkr
    from zktpu.parallel import context as pctx

    # force the sharded MSM path down to this toy scale
    monkeypatch.setattr(pctx, "MIN_ROWS_PER_DEVICE", 1)

    rng = np.random.default_rng(31)
    structure = []
    n = 16
    while n >= 1:
        structure.append([ADD if rng.integers(2) else MUL for _ in range(n)])
        n //= 2
    ctx = fb.get_ctx(BLS12_381_FR)
    circuit = Circuit(ctx, structure)
    inputs = [int(v) for v in rng.integers(0, 1 << 61, size=32)]
    taus = [int(t) for t in rng.integers(2, 1 << 60, size=5)]

    single = gkr.prove(circuit, inputs, taus=taus)
    multi = gkr.prove(circuit, inputs, taus=taus, mesh=mesh)

    for ls, lm_ in zip(single.proof_polynomials, multi.proof_polynomials):
        assert [p.coefficients for p in ls] == [p.coefficients for p in lm_]
    assert single.claimed_evaluations == multi.claimed_evaluations
    assert single.output_poly.to_ints() == multi.output_poly.to_ints()
    assert single.input_proof.opened_evals == multi.input_proof.opened_evals
    assert single.input_proof.commitment == multi.input_proof.commitment
    assert single.input_proof.proof == multi.input_proof.proof
    assert gkr.verify(multi, circuit)
