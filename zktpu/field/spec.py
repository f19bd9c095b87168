"""Field specifications for the zktpu framework.

A ``FieldSpec`` carries everything a kernel or host routine needs to do
arithmetic in a prime field: the modulus, the 16-bit limb decomposition used on
device, Montgomery constants, serialization width, and (where present) a
two-adic root of unity for NTTs.

The reference implementation (obah/zk-research-implementations) hard-codes its
fields per crate via arkworks generics:
  - KZG & GKR on BLS12-381 Fr   (/root/reference/pcs/src/kzg_pcs/kzg.rs:3,
                                 /root/reference/gkr/src/gkr_protocol.rs:360)
  - FFT on BN254 Fr             (/root/reference/fft/src/fft.rs:1)
  - Shamir & most tests on BN254 Fq
                                (/root/reference/shamir_secret_sharing/src/shamir_secret_sharing.rs:1)

Here the same choice is a config object threaded through kernels (SURVEY.md
section 5.6), which is the idiomatic JAX equivalent of a Rust type parameter.

Limb layout: LIMB_BITS=16 limbs stored little-endian in uint32 lanes. 16-bit
limbs are chosen so that a limb product fits exactly in a uint32 lane
((2**16-1)**2 < 2**32) -- TPUs have no native 64-bit integer path, so all
carries are handled explicitly in 32-bit arithmetic.
"""

from __future__ import annotations

import dataclasses
import functools

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field."""

    name: str
    modulus: int
    #: number of 16-bit limbs in the device representation
    num_limbs: int
    #: serialized byte width, matching arkworks BigInt::to_bytes_le
    #: (8 * number of 64-bit limbs arkworks uses)
    byte_len: int
    #: largest s such that 2^s | (modulus - 1)
    two_adicity: int = 0
    #: generator of the 2^two_adicity subgroup (arkworks TWO_ADIC_ROOT_OF_UNITY)
    two_adic_root_of_unity: int = 0

    @property
    def bits(self) -> int:
        return self.modulus.bit_length()

    # ------------------------------------------------------------------
    # Montgomery constants (R = 2^(16 * num_limbs))
    # ------------------------------------------------------------------
    @property
    def r_bits(self) -> int:
        return LIMB_BITS * self.num_limbs

    @functools.cached_property
    def R(self) -> int:  # noqa: N802 - Montgomery radix, conventional name
        return (1 << self.r_bits) % self.modulus

    @functools.cached_property
    def R2(self) -> int:  # noqa: N802
        return (1 << (2 * self.r_bits)) % self.modulus

    @functools.cached_property
    def n0_prime(self) -> int:
        """-modulus^{-1} mod 2^LIMB_BITS (the CIOS per-limb factor)."""
        inv = pow(self.modulus, -1, 1 << LIMB_BITS)
        return (-inv) % (1 << LIMB_BITS)

    # ------------------------------------------------------------------
    # host <-> limb conversions
    # ------------------------------------------------------------------
    def to_limbs(self, value: int) -> list[int]:
        value %= self.modulus
        return [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.num_limbs)]

    def from_limbs(self, limbs) -> int:
        acc = 0
        for i, limb in enumerate(limbs):
            acc |= int(limb) << (LIMB_BITS * i)
        return acc

    # ------------------------------------------------------------------
    # byte serialization: little-endian canonical bigint bytes, the exact
    # layout of arkworks `into_bigint().to_bytes_le()` used by
    # fq_vec_to_bytes (/root/reference/fiat_shamir/src/fiat_shamir_transcript.rs:32-37)
    # ------------------------------------------------------------------
    def to_bytes_le(self, value: int) -> bytes:
        return (value % self.modulus).to_bytes(self.byte_len, "little")

    def from_le_bytes_mod_order(self, data: bytes) -> int:
        """arkworks F::from_le_bytes_mod_order semantics."""
        return int.from_bytes(data, "little") % self.modulus

    def root_of_unity(self, n: int) -> int:
        """n-th root of unity, matching arkworks ``F::get_root_of_unity(n)``."""
        if n <= 0 or n & (n - 1):
            raise ValueError("n must be a power of two")
        log_n = n.bit_length() - 1
        if log_n > self.two_adicity:
            raise ValueError(f"field {self.name} has no 2^{log_n}-th root of unity")
        root = self.two_adic_root_of_unity
        for _ in range(self.two_adicity - log_n):
            root = root * root % self.modulus
        return root


# ----------------------------------------------------------------------
# Concrete fields used by the reference workspace
# ----------------------------------------------------------------------

#: BN254 (alt_bn128) base field. Reference: Shamir, Merkle & most poly tests.
BN254_FQ = FieldSpec(
    name="bn254_fq",
    modulus=21888242871839275222246405745257275088696311157297823662689037894645226208583,
    num_limbs=16,
    byte_len=32,
)

#: BN254 scalar field. Reference: FFT crate (/root/reference/fft/src/fft.rs:1).
BN254_FR = FieldSpec(
    name="bn254_fr",
    modulus=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    num_limbs=16,
    byte_len=32,
    two_adicity=28,
    # arkworks ark_bn254::Fr TWO_ADIC_ROOT_OF_UNITY (generator 5)
    two_adic_root_of_unity=pow(
        5,
        (21888242871839275222246405745257275088548364400416034343698204186575808495617 - 1)
        >> 28,
        21888242871839275222246405745257275088548364400416034343698204186575808495617,
    ),
)

#: BLS12-381 scalar field. Reference: KZG & GKR protocol fields.
BLS12_381_FR = FieldSpec(
    name="bls12_381_fr",
    modulus=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    num_limbs=16,
    byte_len=32,
    two_adicity=32,
    # arkworks ark_bls12_381::Fr TWO_ADIC_ROOT_OF_UNITY (generator 7)
    two_adic_root_of_unity=pow(
        7,
        (0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001 - 1) >> 32,
        0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    ),
)

#: BLS12-381 base field (curve coordinates; 48-byte serialization).
BLS12_381_FQ = FieldSpec(
    name="bls12_381_fq",
    modulus=0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    num_limbs=24,
    byte_len=48,
)

ALL_SPECS = (BN254_FQ, BN254_FR, BLS12_381_FR, BLS12_381_FQ)
