#!/usr/bin/env python
"""zktpu benchmark harness.

Runs on the default JAX backend (the real TPU chip under the driver; CPU in
CI). Prints exactly ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

plus a detailed breakdown to stderr.

Primary metric: wall time of sumcheck prove+verify on a 2^20-entry BN254 MLE
-- the reference's flagship scale test
(/root/reference/sum_check/src/sum_check_protocol.rs:193-204). The reference
publishes no numbers (BASELINE.md), so the baseline is the single-core Rust
estimate derived in BENCH_NOTES.md (field-op counts x arkworks per-op costs +
Keccak absorption): ~0.45 s. vs_baseline = baseline / measured (>1 = faster
than the reference estimate).
"""

from __future__ import annotations

import json
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


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


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

    ctx = fb.get_ctx(BN254_FQ)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << n_vars, ctx.num_limbs), dtype=np.uint32)
    )
    value = jnp.asarray(ctx.pack(12345))
    from zktpu.field import pallas_kernels as pk

    fold = pk.fold_pallas if pk.pallas_available(table.shape[0]) else fold_tables_kernel
    jax.device_get(fold(ctx, table, value)[0])  # compile + settle
    t0 = time.time()
    out = table
    for _ in range(iters):
        out = fold(ctx, table, value)
    jax.device_get(out[0])  # forced sync (tunnel ~30ms, amortized below)
    dt = (time.time() - t0) / iters
    eps = (1 << (n_vars - 1)) / dt
    log(f"  MLE fold 2^{n_vars}: {dt*1e3:.2f} ms -> {eps/1e6:.1f}M lerp-ops/s")
    return eps


def bench_ntt(n_vars: int = 20):
    from zktpu.field.spec import BN254_FR
    from zktpu.field import jnp_backend as fb
    from zktpu.ntt.ntt import ntt

    ctx = fb.get_ctx(BN254_FR)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << n_vars, ctx.num_limbs), dtype=np.uint32)
    )
    jax.device_get(ntt(ctx, table)[0])  # compile + settle
    t0 = time.time()
    out = ntt(ctx, table)
    jax.device_get(out[0])  # forced sync
    dt = time.time() - t0
    log(f"  NTT 2^{n_vars}: {dt*1e3:.1f} ms")
    return dt


def bench_msm(n_points_log: int = 12):
    from zktpu.curve import bls12_381 as hc
    from zktpu.curve import device as dc
    from zktpu.msm import msm_bitsplit

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
    jax.device_get(msm_bitsplit(pts, sc)[0])  # compile + settle
    t0 = time.time()
    out = msm_bitsplit(pts, sc)
    jax.device_get(out[0])  # forced sync
    dt = time.time() - t0
    log(f"  MSM 2^{n_points_log} (bit-split): {dt:.2f} s -> {n/dt:.0f} pts/s")
    return n / dt


def main() -> None:
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    # transfer warm-up (the axon tunnel has a one-time handshake cost)
    jax.device_get(jnp.zeros(8))

    t_prove, t_verify = bench_sumcheck(20)
    bench_fold_throughput(20)
    bench_ntt(20)
    bench_msm(12)

    total = t_prove + t_verify
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


if __name__ == "__main__":
    main()
