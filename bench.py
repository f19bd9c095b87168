#!/usr/bin/env python
"""zktpu benchmark harness.

Runs on the default JAX backend (the real TPU chip under the driver; CPU in
CI). Prints exactly ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

plus a detailed breakdown (criterion-parity micro-benches, MSM/NTT/GKR scale
points, per-kernel rooflines) to stderr.

Primary metric: wall time of sumcheck prove+verify on a 2^20-entry BN254 MLE
-- the reference's flagship scale test
(/root/reference/sum_check/src/sum_check_protocol.rs:193-204). The reference
publishes no numbers (BASELINE.md), so baselines are analytic single-core
estimates derived from exact op counts (BENCH_NOTES.md): sumcheck 2^20 ~0.45s;
the naive per-point MSM of kzg.rs:131-144 ~1e4 pts/s; the reference cannot
run GKR at 2^20 gates at all (its dense wiring table would hold 2^62 entries).
vs_baseline = baseline / measured (>1 = faster than the reference estimate).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zktpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

RUST_SUMCHECK_2E20_BASELINE_S = 0.45  # see BENCH_NOTES.md
#: reference naive MSM (kzg.rs:131-144): ~383 group ops/scalar x ~250ns/op
RUST_NAIVE_MSM_PTS_S = 1.0e4
#: what a user would substitute: arkworks Pippenger, ~2-5e5 pts/s single-core
#: (BENCH_NOTES.md); midpoint used for the honest multiple
ARKWORKS_MSM_PTS_S = 3.5e5

FULL = os.environ.get("ZKTPU_BENCH_FULL") == "1"  # 2^18 GKR stretch

#: total wall-clock budget (s). The driver kills the bench at ~600 s; the
#: primary JSON line prints right after the sumcheck section, and every
#: secondary section first checks it still fits the remaining budget.
T_START = time.time()
BUDGET = float(os.environ.get("ZKTPU_BENCH_BUDGET", "520"))

RESULTS: dict[str, str] = {}


def remaining() -> float:
    return BUDGET - (time.time() - T_START)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def section(name: str, need_s: float, fn, *args, **kwargs):
    """Run one bench section iff it fits the remaining budget; never raise."""
    if remaining() < need_s:
        log(f"  [skip] {name}: {remaining():.0f}s budget left < {need_s:.0f}s needed")
        return None
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # a failed secondary must not kill the metric run
        log(f"  [fail] {name}: {e!r}")
        return None


def bench_sumcheck(n_vars: int = 20):
    """Fused single-dispatch prover (device-side Fiat-Shamir) + verifier.

    Timing note: the axon tunnel makes block_until_ready unreliable, but both
    prove and verify end in a host fetch of transcript/oracle values, so their
    wall times are honest end-to-end measurements.
    """
    from zktpu.field.spec import BN254_FQ
    from zktpu.field import jnp_backend as fb
    from zktpu.poly.multilinear import MultilinearPoly
    from zktpu.sumcheck import protocol as sc
    from zktpu.sumcheck import fused

    ctx = fb.get_ctx(BN254_FQ)
    t0 = time.time()
    rng = np.random.default_rng(0)
    poly = MultilinearPoly.from_ints(
        ctx, [int(v) for v in rng.integers(0, 1 << 62, size=1 << n_vars)]
    )
    jax.block_until_ready(poly.table)
    log(f"  table build+upload: {time.time()-t0:.2f}s")

    t0 = time.time()
    warm_proof = fused.prove(poly)
    log(f"  fused prove warmup (compile): {time.time()-t0:.2f}s")
    t0 = time.time()
    sc.verify(poly, warm_proof)
    log(f"  verify warmup (compile): {time.time()-t0:.2f}s")

    t0 = time.time()
    proof = fused.prove(poly)
    t_prove = time.time() - t0
    assert proof.proof_polynomials == warm_proof.proof_polynomials
    t0 = time.time()
    ok = sc.verify(poly, proof)
    t_verify = time.time() - t0
    assert ok, "sumcheck round-trip failed"
    log(f"  sumcheck 2^{n_vars} fused prove: {t_prove:.3f}s  verify: {t_verify:.3f}s")
    return t_prove, t_verify


def bench_fold_throughput(n_vars: int = 20, iters: int = 10):
    from zktpu.field.spec import BN254_FQ
    from zktpu.field import jnp_backend as fb
    from zktpu.sumcheck.protocol import fold_tables_kernel
    from zktpu.utils import roofline

    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << n_vars, ctx.num_limbs), dtype=np.uint32)
    )
    value = jnp.asarray(ctx.pack(12345))
    from zktpu.field import pallas_kernels as pk

    use_pallas = pk.pallas_available(table.shape[0])
    fold = pk.fold_pallas if use_pallas else fold_tables_kernel
    b, ops = roofline.fold_cost(1 << n_vars, ctx.num_limbs)
    prof = roofline.measure(
        f"MLE fold 2^{n_vars} [{'pallas' if use_pallas else 'xla'}]",
        fold, ctx, table, value,
        bytes_accessed=b, lane_ops=ops, iters=iters,
    )
    log("  " + prof.line())
    RESULTS[f"fold_2^{n_vars}_ms"] = f"{prof.seconds*1e3:.2f}"
    return (1 << (n_vars - 1)) / prof.seconds


def bench_ntt(n_vars: int = 20, iters: int = 3):
    from zktpu.field.spec import BN254_FR
    from zktpu.field import jnp_backend as fb
    from zktpu.ntt.ntt import ntt, select_engine
    from zktpu.utils import roofline

    ctx = fb.get_ctx(BN254_FR)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << n_vars, ctx.num_limbs), dtype=np.uint32)
    )
    engine = select_engine(1 << n_vars)
    layout = "limb_major" if engine == "lm" else "lanes_last"
    b, ops = roofline.ntt_cost(1 << n_vars, ctx.num_limbs, layout)
    prof = roofline.measure(
        f"NTT 2^{n_vars} [{engine}]", ntt, ctx, table,
        bytes_accessed=b, lane_ops=ops, iters=iters,
    )
    log("  " + prof.line())
    RESULTS[f"ntt_2^{n_vars}_ms"] = f"{prof.seconds*1e3:.1f}"
    return prof.seconds


def bench_msm(n_points_log: int = 16):
    """Pippenger MSM (zktpu/msm/pippenger.py) vs the reference's naive
    per-point loop (kzg.rs:131-144, ~1e4 pts/s single-core estimate)."""
    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc
    from zktpu.msm.pippenger import msm_pippenger, pick_window_bits

    n = 1 << n_points_log
    rng = np.random.default_rng(0)
    # distinct pseudo-random points: k*G for small k (cheap to build)
    ks = [int(k) for k in rng.integers(1, 1 << 20, size=min(n, 64))]
    base_pts = [hc.multiply(hc.G1_GEN, k) for k in ks]
    pts_host = [base_pts[i % len(base_pts)] for i in range(n)]
    scalars = [int(a) * int(b) % hc.R_ORDER or 1
               for a, b in rng.integers(1, 1 << 62, size=(n, 2))]

    pts = dc.pack_points(pts_host)
    sc = dc.pack_scalars(scalars)
    c = pick_window_bits(n)
    t0 = time.time()
    jax.device_get(msm_pippenger(pts, sc)[0])  # compile + settle
    log(f"  MSM 2^{n_points_log} warmup (compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    out = msm_pippenger(pts, sc)
    jax.device_get(out[0])  # forced sync (out[0] is one point coord: tiny)
    dt = time.time() - t0
    pts_s = n / dt
    # two baselines (BENCH_NOTES.md): the reference's actual naive per-point
    # loop (~1e4 pts/s) AND the arkworks-Pippenger a user would substitute
    # (~2-5e5 pts/s single-core) -- report against both, the honest way round.
    log(f"  MSM 2^{n_points_log} (Pippenger c={c}): {dt:.2f} s -> "
        f"{pts_s:.0f} pts/s ({pts_s/RUST_NAIVE_MSM_PTS_S:.1f}x ref naive loop, "
        f"{pts_s/ARKWORKS_MSM_PTS_S:.2f}x arkworks-class single core)")
    RESULTS[f"msm_2^{n_points_log}_pts_s"] = f"{pts_s:.0f}"
    return pts_s


def bench_gkr(input_log: int = 12):
    """End-to-end GKR prove+verify on a 2^input_log-input halving circuit
    (lazy O(|w|) prover; the reference's dense wiring tables cap out around
    2^4 inputs -- gkr_protocol.rs:473-506 tests a 8-input circuit)."""
    from zktpu.field.spec import BLS12_381_FR
    from zktpu.field import jnp_backend as fb
    from zktpu.gkr.circuit import Circuit, ADD, MUL
    from zktpu.gkr import protocol as gkr

    ctx = fb.get_ctx(BLS12_381_FR)
    rng = np.random.default_rng(7)
    structure = []
    n = 1 << (input_log - 1)
    total_gates = 0
    while n >= 1:
        structure.append([ADD if rng.integers(2) else MUL for _ in range(n)])
        total_gates += n
        n //= 2
    circuit = Circuit(ctx, structure)
    inputs = [int(v) for v in rng.integers(0, 1 << 61, size=1 << input_log)]
    taus = [int(t) for t in rng.integers(2, 1 << 60, size=input_log)]

    t0 = time.time()
    proof = gkr.prove(circuit, inputs, taus=taus)
    t_prove = time.time() - t0
    log(f"  GKR 2^{input_log}-input ({total_gates} gates) prove: {t_prove:.2f}s"
        f"  (reference: infeasible beyond toy sizes)")
    RESULTS[f"gkr_2^{input_log}_prove_s"] = f"{t_prove:.2f}"
    t0 = time.time()
    ok = gkr.verify(proof, circuit)
    t_verify = time.time() - t0
    assert ok, "GKR round-trip failed"
    log(f"  GKR 2^{input_log} verify: {t_verify:.2f}s ok={ok}")
    RESULTS[f"gkr_2^{input_log}_verify_s"] = f"{t_verify:.2f}"
    return t_prove, t_verify


def bench_micro():
    """Criterion-parity micro-benches (reference component #14):
    MLE evaluate 10 vars (multilinear_poly_benchmark.rs:5-31), univariate
    evaluate 100 coeffs / interpolate 10 pts (univariate_poly_benchmark.rs:
    8-46), sumcheck prove/verify on a 3-var poly (sum_check_benchmark.rs:9-62).
    """
    from zktpu.field.spec import BN254_FQ
    from zktpu.field import jnp_backend as fb
    from zktpu.poly.multilinear import MultilinearPoly
    from zktpu.poly.univariate import UnivariatePoly
    from zktpu.sumcheck import protocol as sc

    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(1)

    # MLE evaluate, 10 vars
    poly10 = MultilinearPoly.from_ints(
        ctx, [int(v) for v in rng.integers(0, 1 << 60, size=1 << 10)]
    )
    point = [int(v) for v in rng.integers(1, 1 << 60, size=10)]
    poly10.evaluate_int(point)  # warm
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        poly10.evaluate_int(point)
    log(f"  MLE evaluate (10 vars): {(time.time()-t0)/iters*1e3:.2f} ms")

    # univariate evaluate (100 coeffs) / interpolate (10 points) -- host path
    coeffs = [int(v) for v in rng.integers(0, 1 << 60, size=100)]
    up = UnivariatePoly(BN254_FQ, coeffs)
    t0 = time.time()
    for _ in range(100):
        up.evaluate(987654321)
    log(f"  univariate evaluate (100 coeffs): {(time.time()-t0)/100*1e6:.1f} us")

    pts = [(int(x), int(y)) for x, y in
           zip(range(1, 11), rng.integers(0, 1 << 60, size=10))]
    t0 = time.time()
    for _ in range(20):
        UnivariatePoly.interpolate(BN254_FQ, pts)
    log(f"  univariate interpolate (10 pts): {(time.time()-t0)/20*1e3:.2f} ms")

    # sumcheck prove/verify, 3-var poly
    poly3 = MultilinearPoly.from_ints(ctx, [1, 2, 3, 4, 5, 6, 7, 8])
    proof = sc.prove(poly3)  # warm
    t0 = time.time()
    for _ in range(5):
        proof = sc.prove(poly3)
    log(f"  sumcheck prove (3 vars): {(time.time()-t0)/5*1e3:.1f} ms")
    t0 = time.time()
    for _ in range(5):
        sc.verify(poly3, proof)
    log(f"  sumcheck verify (3 vars): {(time.time()-t0)/5*1e3:.1f} ms")


def main() -> None:
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()} "
        f"(budget {BUDGET:.0f}s)")
    # transfer warm-up (the axon tunnel has a one-time handshake cost)
    jax.device_get(jnp.zeros(8))

    tpu = jax.default_backend() == "tpu"
    t_prove, t_verify = bench_sumcheck(20)
    total = t_prove + t_verify
    RESULTS["sumcheck_2^20_s"] = f"{total:.3f}"

    # THE primary metric prints before any secondary section can blow the
    # budget (round 4 lost its entire hardware run to a timeout).
    print(
        json.dumps(
            {
                "metric": "sumcheck_2e20_prove_verify",
                "value": round(total, 4),
                "unit": "s",
                "vs_baseline": round(RUST_SUMCHECK_2E20_BASELINE_S / total, 3),
            }
        ),
        flush=True,
    )

    # secondaries in VERDICT priority order, each gated on the remaining
    # wall-clock budget. Need estimates are MEASURED cold times on v5e
    # (BENCH_NOTES round 5); the axon compile service caches nothing across
    # processes, so every driver run pays them fresh.
    section("gkr 2^12", 420, bench_gkr, 12 if tpu else 6)
    section("ntt 2^20", 45, bench_ntt, 20)
    if tpu:
        section("ntt 2^22", 60, bench_ntt, 22)
    section("fold", 15, bench_fold_throughput, 20)
    section("micro", 10, bench_micro)
    section("msm 2^16", 170, bench_msm, 16 if tpu else 10)
    if tpu:
        section("msm 2^20", 210, bench_msm, 20)
        section("gkr 2^16", 820, bench_gkr, 16)
        if FULL:
            section("gkr 2^18", 600, bench_gkr, 18)

    log("  summary: " + " ".join(f"{k}={v}" for k, v in sorted(RESULTS.items())))


if __name__ == "__main__":
    main()
