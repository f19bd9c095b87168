"""Single-dispatch sumcheck prover: Fiat-Shamir runs ON DEVICE.

The host-loop prover (``protocol.prove``) pays one device->host round trip per
round for the transcript squeeze -- the protocol's inherent serial dependency
(SURVEY.md section 3.3). Here the Keccak sponge state lives on device
(``zktpu.hash.keccak_device``), so all n rounds -- half-sums, transcript
absorb, squeeze, fold -- compile into ONE XLA program; the host sees exactly
two device interactions: upload the partially-absorbed sponge state, fetch
the n round polynomials.

Byte/bit-exactness: identical proofs to ``protocol.prove`` (asserted in
tests/test_fused_sumcheck.py). The transcript protocol is the reference's
(/root/reference/fiat_shamir/src/fiat_shamir_transcript.rs:19-29): after each
squeeze the buffered bytes are digest(32) || half_sums(64) = 96 bytes -- one
padded Keccak block -- so every round costs exactly one keccak-f[1600] on
device. Round 0 continues the host-absorbed prefix (table bytes + claimed
sum, hashed at native speed by the C backend) from its exported sponge state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field import limb_major as lm
from ..field import pallas_kernels as pk
from ..field.jnp_backend import FieldCtx
from ..field.host import vec_to_bytes
from ..field.spec import LIMB_BITS, LIMB_MASK
from ..hash import keccak as hk
from ..hash import keccak_device as kd
from ..poly.multilinear import MultilinearPoly
from .protocol import Proof

EXTRA = pk.EXTRA
_U32 = jnp.uint32


def host_sum_mod_p(ctx: FieldCtx, canonical: np.ndarray) -> int:
    """Exact sum of a canonical (size, N) digit table, mod p (numpy columns +
    one Python carry pass -- no device round trip)."""
    cols = np.sum(canonical, axis=0, dtype=np.uint64)
    acc = 0
    for i, c in enumerate(cols):
        acc += int(c) << (LIMB_BITS * i)
    return acc % ctx.spec.modulus


def _canonicalize_rows(ctx: FieldCtx, rows):
    """(k, N+EXTRA) exact digit sums of Montgomery entries -> (k, N) canonical
    digits of the underlying field value.

    The integer row is S = lo + hi*2^(16N) with lo the low N digits, and
    S = (sum x)*R mod p ... well, mod nothing: S is to_mont(sum) as an
    *unreduced* integer. The plain value is S*R^{-1} = lo*R^{-1} + hi, so one
    ``mont_mul(lo, 1)`` (CIOS bound: t < lo/R + p < 2p for any lo < 2^(16N))
    plus ``hi`` (< 2^32 < p, already canonical) and a modular add.
    """
    n = ctx.num_limbs
    lo = rows[:, :n]
    hi = jnp.pad(rows[:, n:], [(0, 0), (0, n - EXTRA)])
    lo_div_r = fb._mont_mul_impl(ctx, lo, jnp.asarray(ctx.one_plain))
    return fb.add(ctx, lo_div_r, hi)


def _digest_to_mont(ctx: FieldCtx, digest_lanes):
    """(4, 2) digest lanes -> Montgomery limbs of from_le_bytes_mod_order."""
    limbs = kd.lanes_to_limbs(digest_lanes[None])[0]  # (16,)
    return fb._mont_mul_impl(ctx, limbs, jnp.asarray(ctx.r2))


def _lazy_halves_jnp(ctx: FieldCtx, table):
    """Plain-XLA half-sums as exact digit rows (2, N+EXTRA): the fallback for
    tables the Pallas kernels don't cover (small sizes / CPU)."""
    t = jnp.moveaxis(table, -1, 0)  # (N, size)
    size = t.shape[1]

    def lazy(seg):
        k = seg.shape[1]
        if k <= (1 << 16):
            return lm.lazy_sum(seg, EXTRA)[:, 0]
        chunks = seg.reshape(ctx.num_limbs, -1, 1 << 16)
        acc = jnp.zeros((ctx.num_limbs + EXTRA,), _U32)
        for c in range(chunks.shape[1]):
            acc = acc + lm.lazy_sum(chunks[:, c], EXTRA)[:, 0]
        return lm.ripple(acc, chunks.shape[1] * LIMB_MASK + 1)

    return jnp.stack([lazy(t[:, : size // 2]), lazy(t[:, size // 2 :])])


def _fold_jnp(ctx: FieldCtx, table, r_mont):
    shaped = table.reshape(2, table.shape[0] // 2, ctx.num_limbs)
    a, b = shaped[0], shaped[1]
    return fb.add(ctx, a, fb._mont_mul_impl(ctx, r_mont, fb.sub(ctx, b, a)))


def _absorb_tail_block(ctx: FieldCtx, state, tail_lanes, tail_len: int, canon):
    """Round-0 absorb: prefix tail || k field elements || padding (static
    layout; ``canon`` is (k, N) canonical digit rows)."""
    total = tail_len + canon.shape[0] * ctx.spec.byte_len
    nblocks = total // kd.RATE + 1
    parts = [tail_lanes.reshape(-1, 2)]
    if canon.shape[0]:
        parts.append(kd.limbs_to_lanes(canon).reshape(-1, 2))
    parts.append(
        jnp.zeros((17 * nblocks - tail_len // 8 - canon.size // 4, 2), _U32)
    )
    content = jnp.concatenate(parts, axis=0)
    pad = np.zeros((17 * nblocks, 2), np.uint32)
    pad[total // 8, 0] ^= 0x01
    pad[17 * nblocks - 1, 1] ^= 0x80000000
    content = content ^ jnp.asarray(pad)
    for b in range(nblocks):
        state = kd.absorb_block(state, content[17 * b : 17 * (b + 1)])
    return state


def _squeeze_round(ctx: FieldCtx, digest, canon):
    """Steady-state round: one padded block = digest(32B) || k elements
    (``canon``: (k, N) canonical rows; 32 + 32k <= 135 bytes, i.e. k <= 3)."""
    if canon.shape[0] == 0:
        lanes = digest
    else:
        lanes = jnp.concatenate(
            [digest, kd.limbs_to_lanes(canon).reshape(-1, 2)], axis=0
        )
    nlanes = lanes.shape[0]  # 4 + 4k
    assert nlanes <= 16, "round content must fit one Keccak block"
    pad = np.zeros((17, 2), np.uint32)
    pad[nlanes, 0] = 0x01
    pad[16, 1] ^= 0x80000000
    block = jnp.concatenate(
        [lanes, jnp.zeros((17 - nlanes, 2), _U32)], axis=0
    ) ^ jnp.asarray(pad)
    return kd.absorb_block(jnp.zeros((25, 2), _U32), block)


#: table size at (and below) which remaining rounds run as one fixed-shape
#: lax.scan in bit-reversed layout -- caps the number of per-shape Pallas
#: compiles at ~5 for any num_vars (VERDICT round 1, item 7: the fully
#: unrolled 20-round program cost ~140 s of cold XLA/Mosaic compile)
SCAN_SIZE = 1 << 16


@functools.lru_cache(maxsize=None)
def _bitrev(log_n: int) -> np.ndarray:
    from ..ntt.ntt import _bitrev_perm

    return _bitrev_perm(log_n)


def _scan_rounds(ctx: FieldCtx, table, state, digest, steps: int):
    """Rounds on a bit-reversed fixed-physical-shape table.

    In bit-reversed layout the MSB fold pairs ADJACENT entries: with
    F[rev_k(i)] = f[i], the folded g[j] = a + r*(b - a) over (f[j], f[j+L/2])
    lands at G[m] = lerp(F[2m], F[2m+1]) -- already in (k-1)-bit bit-reversed
    layout, occupying a prefix. Entries past the logical length are zeros and
    lerp(0, 0) = 0, so no masking is ever needed; the standard-order halves
    [sum first half, sum second half] become the even/odd position sums. One
    compiled scan body serves every remaining round.
    """
    n = ctx.num_limbs
    S = table.shape[0]
    table_br = jnp.take(table, jnp.asarray(_bitrev(S.bit_length() - 1)), axis=0)

    def body(carry, _):
        tbl, st, dg = carry
        r_mont = _digest_to_mont(ctx, dg)
        pairs = tbl.reshape(S // 2, 2, n)
        a, b = pairs[:, 0], pairs[:, 1]
        folded = fb.add(ctx, a, fb._mont_mul_impl(ctx, r_mont, fb.sub(ctx, b, a)))
        rows = jnp.stack([
            lm.lazy_sum(jnp.moveaxis(folded[0::2], -1, 0), EXTRA)[:, 0],
            lm.lazy_sum(jnp.moveaxis(folded[1::2], -1, 0), EXTRA)[:, 0],
        ])
        canon = _canonicalize_rows(ctx, rows)
        st = _squeeze_round(ctx, dg, canon)
        new_tbl = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=0)
        return (new_tbl, st, st[:4]), canon

    (_, state, digest), canons = jax.lax.scan(
        body, (table_br, state, digest), None, length=steps
    )
    return canons, state, digest


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _device_prove(ctx: FieldCtx, num_vars: int, tail_len: int, state0, tail_lanes, table):
    """All rounds in one program. Returns (num_vars, 2, N) canonical digit
    rows of every round polynomial."""
    outs = []
    state = state0
    digest = None
    k = 0
    while k < num_vars:
        size = table.shape[0]
        if k > 0 and size <= SCAN_SIZE and num_vars - k >= 2:
            canons, state, digest = _scan_rounds(
                ctx, table, state, digest, num_vars - k
            )
            return jnp.concatenate([jnp.stack(outs), canons], axis=0)
        if k == 0:
            if pk.pallas_available(size):
                rows = pk.halves_sums_pallas(ctx, table)
            else:
                rows = _lazy_halves_jnp(ctx, table)
        else:
            r_mont = _digest_to_mont(ctx, digest)
            if pk.pallas_available(size):
                table, rows = pk.fold_and_halves_pallas(ctx, table, r_mont)
            else:
                table = _fold_jnp(ctx, table, r_mont)
                rows = _lazy_halves_jnp(ctx, table)
        canon = _canonicalize_rows(ctx, rows)
        outs.append(canon)
        if k == 0:
            state = _absorb_tail_block(ctx, state, tail_lanes, tail_len, canon)
        else:
            state = _squeeze_round(ctx, digest, canon)
        digest = state[:4]
        k += 1
    return jnp.stack(outs)


def prove(poly: MultilinearPoly) -> Proof:
    """Fused prover; proof bytes identical to ``protocol.prove``."""
    ctx = poly.ctx
    spec = ctx.spec
    if spec.byte_len != 2 * ctx.num_limbs:
        raise ValueError("fused prover requires byte_len == 2 * num_limbs")
    canonical = np.asarray(poly.canonical_table())
    claimed_sum = host_sum_mod_p(ctx, canonical)
    sponge = poly.transcript_sponge()
    sponge.absorb(vec_to_bytes(spec, [claimed_sum]))
    state0, tail = sponge.state_lanes()
    assert len(tail) % 8 == 0  # field elements are 8-byte aligned
    tail_lanes = kd.bytes_to_lanes(tail) if tail else np.zeros((0, 2), np.uint32)

    rows = _device_prove(
        ctx, poly.num_vars, len(tail),
        jnp.asarray(state0), jnp.asarray(tail_lanes), poly.table,
    )
    flat = np.asarray(rows).reshape(-1, ctx.num_limbs)
    ints = [int(v) for v in ctx.unpack(flat)]
    proof_polynomials = [
        [ints[2 * k], ints[2 * k + 1]] for k in range(poly.num_vars)
    ]
    return Proof(proof_polynomials, claimed_sum)
