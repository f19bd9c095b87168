"""Keccak-f[1600] and the Fiat-Shamir squeeze on device (JAX/XLA).

Why: the transcript squeeze between sumcheck rounds is the serial host
dependency of the whole protocol (SURVEY.md section 3.3). Keeping the sponge
state ON DEVICE removes every per-round host round-trip, so the full
sumcheck prover compiles into a single XLA program (see
``zktpu.sumcheck.fused``).

Representation: 64-bit lanes as uint32 (lo, hi) pairs -- TPUs have no 64-bit
integer datapath. The state is a (25, 2) uint32 array with flat lane index
j = 5*y + x, matching the byte-stream order of the sponge (byte offset of
lane j = 8*j). All rotations/permutations use constant per-lane vectors, so
one keccak-f is a few hundred fused VPU ops on tiny tiles.

Bit-exactness contract: identical output to ``zktpu.hash.keccak.keccak256``
(Rust ``sha3::Keccak256``, legacy 0x01 padding) -- the transcript protocol of
/root/reference/fiat_shamir/src/fiat_shamir_transcript.rs:19-29.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_U32 = jnp.uint32

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
# rotation offsets indexed [x][y] (same table as the host implementation)
_ROT_XY = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

RATE = 136  # Keccak-256 rate in bytes (17 lanes)

# flat-lane (j = 5y + x) constant tables for rho+pi:
#   B[5*y2 + x2] = rotl(S[5*y + x], ROT[x][y])  with x2 = y, y2 = (2x+3y) % 5
_ROTS = np.zeros(25, np.uint32)
_PI_SRC = np.zeros(25, np.int32)
for x in range(5):
    for y in range(5):
        src = 5 * y + x
        dst = 5 * ((2 * x + 3 * y) % 5) + y
        _ROTS[dst] = _ROT_XY[x][y] % 64
        _PI_SRC[dst] = src
_RC_PAIRS = np.asarray(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC], dtype=np.uint32
)  # (24, 2)


def _rotl64(state, rots):
    """Rotate-left each (lo, hi) lane pair by its per-lane amount (0..63)."""
    r = jnp.asarray(rots, _U32)
    lo, hi = state[:, 0], state[:, 1]
    swap = (r >= 32)[:, None]
    st = jnp.where(swap, state[:, ::-1], state)
    a, b = st[:, 0], st[:, 1]
    s = r % 32
    sr = (32 - s) % 32
    zero = jnp.zeros_like(a)
    lo2 = (a << s) | jnp.where(s == 0, zero, b >> sr)
    hi2 = (b << s) | jnp.where(s == 0, zero, a >> sr)
    return jnp.stack([lo2, hi2], axis=1)


def keccak_f(state):
    """One Keccak-f[1600] permutation on a (25, 2) uint32 lane array."""
    s = state
    for rnd in range(24):
        # theta
        grid = s.reshape(5, 5, 2)              # [y, x, pair]
        c = grid[0] ^ grid[1] ^ grid[2] ^ grid[3] ^ grid[4]   # (5(x), 2)
        d = jnp.roll(c, 1, axis=0) ^ _rotl64(jnp.roll(c, -1, axis=0), np.full(5, 1, np.uint32))
        s = (grid ^ d[None]).reshape(25, 2)
        # rho + pi
        b = jnp.take(s, jnp.asarray(_PI_SRC), axis=0)
        b = _rotl64(b, _ROTS)
        # chi
        bg = b.reshape(5, 5, 2)
        s = (bg ^ (~jnp.roll(bg, -1, axis=1) & jnp.roll(bg, -2, axis=1))).reshape(25, 2)
        # iota
        rc = jnp.asarray(_RC_PAIRS[rnd])
        s = jnp.concatenate([s[0:1] ^ rc[None], s[1:]], axis=0)
    return s


def bytes_to_lanes(data: bytes) -> np.ndarray:
    """Static bytes -> (ceil(len/8), 2) uint32 lane pairs (zero padded)."""
    pad = (-len(data)) % 8
    arr = np.frombuffer(data + b"\0" * pad, dtype="<u4").reshape(-1, 2)
    return arr.astype(np.uint32)


def absorb_block(state, block_lanes):
    """XOR one RATE-byte block (17, 2) into the state and permute."""
    mixed = jnp.concatenate([state[:17] ^ block_lanes, state[17:]], axis=0)
    return keccak_f(mixed)


def keccak256_device(data: bytes):
    """Digest of static host bytes, computed on device (for tests)."""
    state = jnp.zeros((25, 2), _U32)
    n_full = len(data) // RATE
    for i in range(n_full):
        state = absorb_block(state, jnp.asarray(bytes_to_lanes(data[i * RATE : (i + 1) * RATE])))
    tail = bytearray(data[n_full * RATE :].ljust(RATE, b"\0"))
    tail[len(data) - n_full * RATE] ^= 0x01
    tail[RATE - 1] ^= 0x80
    state = absorb_block(state, jnp.asarray(bytes_to_lanes(bytes(tail))))
    return state[:4]  # 32-byte digest as (4, 2) lane pairs


def digest_to_bytes(digest_lanes) -> bytes:
    return np.asarray(digest_lanes, dtype="<u4").tobytes()


# ----------------------------------------------------------------------
# limb <-> lane packing (16-bit field digits are little-endian, so 4 digits
# ARE one 64-bit lane -- no byte materialization on device)
# ----------------------------------------------------------------------

def limbs_to_lanes(limbs):
    """(..., 4k) uint32 16-bit digits -> (..., k, 2) uint32 lane pairs."""
    shaped = limbs.reshape(limbs.shape[:-1] + (-1, 4))
    lo = shaped[..., 0] | (shaped[..., 1] << 16)
    hi = shaped[..., 2] | (shaped[..., 3] << 16)
    return jnp.stack([lo, hi], axis=-1)


def lanes_to_limbs(lanes):
    """(..., k, 2) uint32 lane pairs -> (..., 4k) 16-bit digits."""
    lo, hi = lanes[..., 0], lanes[..., 1]
    out = jnp.stack(
        [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16], axis=-1
    )
    return out.reshape(lanes.shape[:-2] + (-1,))
