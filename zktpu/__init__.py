"""zktpu -- a TPU-native zero-knowledge primitive framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
obah/zk-research-implementations (Rust + arkworks): univariate & multilinear
polynomials, composed sum-of-products polynomials, Keccak Fiat-Shamir,
sumcheck (plain + GKR variant), layered GKR prover/verifier, multilinear KZG
over BLS12-381, Merkle trees, radix-2 NTT, and Shamir secret sharing.

Architecture (TPU-first, not a port):
  * field elements = 16-bit limb arrays in uint32 lanes; Montgomery CIOS
    multiplication vectorized over the hypercube/batch axis (VPU), with Pallas
    kernels for the hot paths.
  * protocol round loops on host (the Fiat-Shamir squeeze is inherently
    serial); every O(2^n) step is a jitted device kernel.
  * multi-chip scale via jax.sharding.Mesh + shard_map: evaluation tables are
    sharded on their minor index bits so every sumcheck fold stays local and
    only per-round half-sums cross chips (psum).
  * host-side exact Python-int oracle mirrors the reference semantics for
    control-path math and cross-implementation bit-exactness tests; Keccak
    hashing is native C (ctypes).
"""

__version__ = "0.1.0"
