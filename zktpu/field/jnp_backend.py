"""Device (JAX/XLA) field arithmetic over 16-bit limb arrays.

The TPU-native replacement for the arkworks Montgomery bigint layer that every
reference crate leans on (SURVEY.md section 2, "Native components").

Representation
--------------
A field element batch is a uint32 array of shape ``(..., N)`` where ``N =
spec.num_limbs`` and each lane holds a 16-bit little-endian limb. 16-bit limbs
are the widest that keep a limb product exact in a uint32 lane -- TPUs have no
native 64-bit integer datapath, so every carry is explicit 32-bit arithmetic.

Montgomery domain
-----------------
Arrays on device live in the Montgomery domain (x*R mod p, R = 2^(16N)) so
that multiplication is a single CIOS pass (``mont_mul(aR, bR) = abR``).
Addition/subtraction are domain-agnostic. Conversions happen only at
host/serialization boundaries.

Vectorization strategy
----------------------
All inner loops run along the *limb axis* with delayed carries:

  * products are split into 16-bit halves and accumulated into uint32 lanes
    whose slack (< 2^32 after <= num_limbs iterations) absorbs the carries;
  * carry propagation is a fixed number of data-parallel "ripple passes"
    (``value & mask`` + shifted ``value >> 16``) rather than an O(N)
    sequential chain;
  * subtraction/borrow uses two's-complement (a + ~b + 1) so it shares the
    same carry machinery.

This keeps the XLA graph small (~15 vector ops per CIOS iteration), fuses into
a handful of wide VPU kernels, and makes the batch axis (hypercube tables of
2^20 entries) the parallel dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


class FieldCtx:
    """Per-field device constants + packing helpers. Hashable singleton
    (see ``get_ctx``) so it can be a static jit argument."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.num_limbs = spec.num_limbs
        p = spec.modulus
        # NOTE: raw limb split -- spec.to_limbs reduces mod p (would give 0)
        raw = [(p >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.num_limbs)]
        self.p_arr = np.asarray(raw, dtype=np.uint32)
        self.p_not = np.asarray([LIMB_MASK - l for l in raw], dtype=np.uint32)
        self.n0p = np.uint32(spec.n0_prime)
        self.r2 = np.asarray(spec.to_limbs(spec.R2), dtype=np.uint32)
        self.one_plain = np.asarray(spec.to_limbs(1), dtype=np.uint32)
        self.one_mont = np.asarray(spec.to_limbs(spec.R), dtype=np.uint32)
        self.zero = np.zeros(spec.num_limbs, dtype=np.uint32)

    # -- host packing helpers ------------------------------------------------

    def pack(self, values) -> np.ndarray:
        """Python ints (nested lists ok) -> canonical uint32 limb array.

        Fast path: if every value already fits in uint64 (common for test
        vectors and structured inputs) the limb split is pure numpy; otherwise
        each value is serialized to little-endian bytes and viewed as uint16
        limbs -- both avoid the O(n * num_limbs) Python loop."""
        shape = np.shape(values) + (self.num_limbs,)
        flat = np.asarray(values, dtype=object).reshape(-1)
        try:
            small = flat.astype(np.uint64)
            if flat.size and (small.astype(object) != flat).any():
                raise OverflowError
            arr = np.zeros((flat.size, self.num_limbs), dtype=np.uint32)
            for i in range(min(4, self.num_limbs)):
                arr[:, i] = ((small >> np.uint64(LIMB_BITS * i)) & np.uint64(LIMB_MASK)).astype(
                    np.uint32
                )
            return arr.reshape(shape)
        except (OverflowError, TypeError, ValueError):
            pass
        p = self.spec.modulus
        nbytes = 2 * self.num_limbs
        blob = b"".join((int(v) % p).to_bytes(nbytes, "little") for v in flat)
        arr = np.frombuffer(blob, dtype="<u2").astype(np.uint32)
        return arr.reshape(shape)

    def unpack(self, limbs) -> np.ndarray:
        """Canonical limb array -> object array of Python ints."""
        limbs = np.asarray(limbs)
        flat = limbs.reshape(-1, self.num_limbs).astype("<u2")
        blob = flat.tobytes()
        nbytes = 2 * self.num_limbs
        out = np.empty(flat.shape[0], dtype=object)
        for k in range(flat.shape[0]):
            out[k] = int.from_bytes(blob[k * nbytes : (k + 1) * nbytes], "little")
        return out.reshape(limbs.shape[:-1])

    def canonical_to_bytes(self, limbs) -> bytes:
        """Canonical limb array (..., N) -> concatenated arkworks
        ``to_bytes_le`` serialization (2 bytes per limb, element-major)."""
        arr = np.asarray(limbs, dtype=np.uint32)
        assert arr.shape[-1] == self.num_limbs
        assert 2 * self.num_limbs == self.spec.byte_len
        return arr.astype("<u2").tobytes()

    def bytes_to_canonical(self, data: bytes) -> np.ndarray:
        arr = np.frombuffer(data, dtype="<u2").astype(np.uint32)
        return arr.reshape(-1, self.num_limbs)


@functools.lru_cache(maxsize=None)
def get_ctx(spec: FieldSpec) -> FieldCtx:
    return FieldCtx(spec)


# ----------------------------------------------------------------------
# carry machinery (uint32 (..., K) arrays, limbs along the last axis)
# ----------------------------------------------------------------------

def _shift_up(x):
    """Move each lane's value one limb position up (carry direction)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 0)]
    return jnp.pad(x[..., :-1], pad)


def _ripple(x, bound: int):
    """Carry-propagate lanes (< ``bound``) to clean base-2^16 digits.

    Two phases, both data-parallel along the limb axis:
      1. coarse ripple passes until every lane <= 2^16 (carries <= 1);
      2. carry-lookahead: the remaining 0/1 cascading carries form the
         classic (generate, propagate) monoid, resolved in log(N) steps with
         ``lax.associative_scan`` -- no O(N) sequential chain anywhere.

    The carry out of the top lane is DISCARDED -- callers must size the array
    so the true value fits.
    """
    while bound > 2 * LIMB_MASK:
        x = (x & _MASK) + _shift_up(x >> LIMB_BITS)
        bound = LIMB_MASK + (bound >> LIMB_BITS)
    if bound <= LIMB_MASK:
        return x
    # one half-pass: lanes <= mask + 1 (value 2^16 "generates", mask "propagates")
    x = (x & _MASK) + _shift_up(x >> LIMB_BITS)
    g = (x >> LIMB_BITS) > 0
    p = x == _MASK

    def comb(lo_seg, hi_seg):
        g_lo, p_lo = lo_seg
        g_hi, p_hi = hi_seg
        return jnp.logical_or(g_hi, jnp.logical_and(p_hi, g_lo)), jnp.logical_and(p_lo, p_hi)

    g_scan, _ = jax.lax.associative_scan(comb, (g, p), axis=-1)
    carry_in = _shift_up(g_scan.astype(_U32))
    return (x + carry_in) & _MASK


def _twos_complement_sub(a, b, width: int):
    """a - b as (result mod 2^(16*width), borrow_flag).

    a, b: clean (..., width) limb arrays. Uses a + ~b + 1; the top carry lane
    (index width) is 1 iff a >= b.
    """
    pad = [(0, 0)] * (a.ndim - 1) + [(0, 1)]
    s = jnp.pad(a + (_MASK - b), pad)
    s = s.at[..., 0].add(1)
    s = _ripple(s, 2 * LIMB_MASK + 1)
    no_borrow = s[..., width] > 0
    return s[..., :width], jnp.logical_not(no_borrow)


def _cond_sub_p(ctx: FieldCtx, t, extra):
    """Reduce t (< 2p; ``extra`` = the 2^(16N) overflow bit) to [0, p).

    For all supported fields p > 2^(16N-4), so t < 2p means the overflow bit
    implies t >= p.
    """
    diff, borrow = _twos_complement_sub(t, jnp.asarray(ctx.p_arr), ctx.num_limbs)
    take_diff = jnp.logical_or(extra, jnp.logical_not(borrow))
    return jnp.where(take_diff[..., None], diff, t)


# ----------------------------------------------------------------------
# public ops (uint32 (..., N) arrays; Montgomery domain unless noted)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(ctx: FieldCtx, a, b):
    """Modular addition (domain-agnostic)."""
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    pad = [(0, 0)] * (a.ndim - 1) + [(0, 1)]
    s = _ripple(jnp.pad(a + b, pad), 2 * LIMB_MASK)
    return _cond_sub_p(ctx, s[..., : ctx.num_limbs], s[..., ctx.num_limbs] > 0)


@functools.partial(jax.jit, static_argnums=0)
def sub(ctx: FieldCtx, a, b):
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    diff, borrow = _twos_complement_sub(a, b, ctx.num_limbs)
    # where we borrowed, add p back (mod 2^(16N): the wraparounds cancel)
    pad = [(0, 0)] * (a.ndim - 1) + [(0, 1)]
    fixed = _ripple(jnp.pad(diff + jnp.asarray(ctx.p_arr), pad), 2 * LIMB_MASK)
    return jnp.where(borrow[..., None], fixed[..., : ctx.num_limbs], diff)


@functools.partial(jax.jit, static_argnums=0)
def neg(ctx: FieldCtx, a):
    a = jnp.asarray(a, _U32)
    diff, _ = _twos_complement_sub(
        jnp.broadcast_to(jnp.asarray(ctx.p_arr), a.shape).astype(_U32), a, ctx.num_limbs
    )
    is_zero_mask = jnp.all(a == 0, axis=-1)
    return jnp.where(is_zero_mask[..., None], a, diff)


#: widest field that still unrolls its CIOS loop at trace time. Narrow (Fr)
#: fields unroll for maximum fusion (the sumcheck/NTT hot path); wide (Fq
#: curve-coordinate) fields loop via fori so composite point kernels stay
#: compile-tractable (a Pallas kernel owns their speed-of-light path).
UNROLL_LIMB_LIMIT = 16


def _mont_mul_impl(ctx: FieldCtx, a, b):
    """Delayed-carry CIOS. a, b: clean (..., N) limb arrays (broadcastable).

    Accumulator lanes t: per outer iteration each lane gains at most
    4*(2^16-1) from the two product splits plus a shifted-down carry, so
    after N <= 24 iterations every lane is < 24*2^18 + 2^17 << 2^32.
    """
    n = ctx.num_limbs
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (n,))
    p_arr = jnp.asarray(ctx.p_arr)

    def pad_hi(v):  # (..., n) -> (..., n+1) with a one-limb up-shift
        return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(1, 0)])

    def pad_lo(v):  # (..., n) -> (..., n+1)
        return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, 1)])

    def iteration(t, a_i):
        prod = a_i[..., None] * b  # (..., n), exact in uint32
        t = t + pad_lo(prod & _MASK) + pad_hi(prod >> LIMB_BITS)

        m = ((t[..., 0] & _MASK) * ctx.n0p) & _MASK
        prod2 = m[..., None] * p_arr
        t = t + pad_lo(prod2 & _MASK) + pad_hi(prod2 >> LIMB_BITS)

        # divide by 2^16: lane 0 is now 0 mod 2^16; push its carry into lane 1
        carry0 = t[..., 0] >> LIMB_BITS
        return jnp.concatenate(
            [t[..., 1:2] + carry0[..., None], t[..., 2:],
             jnp.zeros(t.shape[:-1] + (1,), _U32)],
            axis=-1,
        )

    # t has n+1 lanes: lane n catches the top product halves / shift carries.
    # Derived from the operands (a & 0) rather than a literal zeros so that
    # under shard_map the carry init has the operands' varying manual axes
    # (lax.fori_loop rejects an unvarying carry with a varying body output).
    t = jnp.broadcast_to((a[..., :1] | b[..., :1]) & _U32(0), shape + (n + 1,))
    if n <= UNROLL_LIMB_LIMIT:
        for i in range(n):
            t = iteration(t, a[..., i])
    else:
        t = jax.lax.fori_loop(
            0, n,
            lambda i, t: iteration(
                t, jax.lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=False)
            ),
            t,
        )

    # lanes < ~n*2^18; ripple down to clean limbs + overflow lane
    t = _ripple(t, ctx.num_limbs * (1 << 18) + (1 << 17))
    return _cond_sub_p(ctx, t[..., :n], t[..., n] > 0)


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(ctx: FieldCtx, a, b):
    """CIOS Montgomery multiplication: a*b*R^{-1} mod p."""
    return _mont_mul_impl(ctx, a, b)


def mont_sqr(ctx: FieldCtx, a):
    return mont_mul(ctx, a, a)


@functools.partial(jax.jit, static_argnums=0)
def to_mont(ctx: FieldCtx, a):
    return _mont_mul_impl(ctx, a, jnp.asarray(ctx.r2))


@functools.partial(jax.jit, static_argnums=0)
def from_mont(ctx: FieldCtx, a):
    return _mont_mul_impl(ctx, a, jnp.asarray(ctx.one_plain))


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_static(ctx: FieldCtx, a, exponent: int):
    """a^exponent (Montgomery in/out) for a *static* exponent.

    Left-to-right binary ladder via ``lax.scan`` over the exponent bits, so
    the XLA graph holds one CIOS body regardless of exponent width.
    """
    a = jnp.asarray(a, _U32)
    one = jnp.broadcast_to(
        jnp.asarray(ctx.one_mont), a.shape[:-1] + (ctx.num_limbs,)
    ).astype(_U32)
    if exponent == 0:
        return one
    bits_arr = jnp.asarray([int(x) for x in bin(exponent)[2:]], dtype=_U32)

    def body(acc, bit):
        acc = _mont_mul_impl(ctx, acc, acc)
        mul_res = _mont_mul_impl(ctx, acc, a)
        acc = jnp.where((bit == 1).reshape((1,) * acc.ndim), mul_res, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, one, bits_arr)
    return acc


def inverse(ctx: FieldCtx, a):
    """Fermat inverse a^(p-2) (Montgomery in/out). inverse(0) returns 0."""
    return pow_static(ctx, a, ctx.spec.modulus - 2)


def field_sum(ctx: FieldCtx, x, axis: int = 0):
    """Modular sum along ``axis`` via a log-depth pairwise modular tree.

    Total work is ~2x one elementwise pass over the data; the per-level
    lazy-carry adds fuse into a handful of VPU kernels.
    """
    x = jnp.asarray(x, _U32)
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        red = add(ctx, x[:half], x[half : 2 * half])
        if n % 2:
            red = jnp.concatenate([red, x[2 * half :]], axis=0)
        x = red
        n = x.shape[0]
    return x[0]


def is_zero(ctx: FieldCtx, a):
    return jnp.all(jnp.asarray(a, _U32) == 0, axis=-1)


def eq(ctx: FieldCtx, a, b):
    a, b = jnp.broadcast_arrays(jnp.asarray(a, _U32), jnp.asarray(b, _U32))
    return jnp.all(a == b, axis=-1)
