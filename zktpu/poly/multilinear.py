"""Multilinear polynomials (MLEs) as device evaluation tables.

Capability parity with /root/reference/multilinear_polynomial/src/
multilinear_polynomial_evaluation.rs. The table over the boolean hypercube is
a uint32 limb array of shape ``(2^n, num_limbs)`` living on device in
Montgomery form; every operation is a jitted vector kernel over the table.

Variable-order contract: variable ``bit`` is counted from the MOST significant
index bit (the reference's ``inverted_index = num_of_vars - bit - 1`` +
``insert_bit`` construction, :39-50,158-164). On an array that means variable
``bit`` is axis ``bit`` of the table viewed as an n-dimensional (2,)*n array,
so ``partial_evaluate`` is a reshape + lerp:

    table.reshape(2^bit, 2, 2^(n-bit-1), N) -> a + v*(b - a)

which XLA fuses into a single elementwise pass -- the "HOT LOOP" fold of
SURVEY.md section 3.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field.jnp_backend import FieldCtx
from ..utils import tracker


# ----------------------------------------------------------------------
# jitted kernels (ctx is a static singleton -> one compile per field/shape)
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def fold_kernel(ctx: FieldCtx, table, bit: int, value):
    """partial_evaluate: fix variable ``bit`` (MSB-first) to ``value``."""
    n_entries = table.shape[0]
    lo = n_entries >> (bit + 1)
    shaped = table.reshape(1 << bit, 2, lo, ctx.num_limbs)
    a = shaped[:, 0]
    b = shaped[:, 1]
    out = fb.add(ctx, a, fb.mont_mul(ctx, value, fb.sub(ctx, b, a)))
    return out.reshape(n_entries // 2, ctx.num_limbs)


@functools.partial(jax.jit, static_argnums=(0, 3))
def tensor_kernel(ctx: FieldCtx, a, b, op: str):
    """tensor_add_mul_polynomials: out[i*|B| + j] = op(a_i, b_j) (:99-110)."""
    a2 = a[:, None, :]
    b2 = b[None, :, :]
    if op == "add":
        out = fb.add(ctx, a2, b2)
    elif op == "mul":
        out = fb.mont_mul(ctx, a2, b2)
    else:
        raise ValueError(op)
    return out.reshape(a.shape[0] * b.shape[0], ctx.num_limbs)


@functools.partial(jax.jit, static_argnums=(0, 3))
def elementwise_kernel(ctx: FieldCtx, a, b, op: str):
    if op == "add":
        return fb.add(ctx, a, b)
    if op == "sub":
        return fb.sub(ctx, a, b)
    if op == "mul":
        return fb.mont_mul(ctx, a, b)
    raise ValueError(op)


@functools.partial(jax.jit, static_argnums=(0,))
def evaluate_all_kernel(ctx: FieldCtx, table, values_mont):
    """Full evaluation at a point: all num_vars folds in ONE program
    (the verifier's final oracle check, sum_check_protocol.rs:81-83, and the
    GKR w-evaluations). ``values_mont``: (num_vars, N) Montgomery limbs."""
    from ..field import pallas_kernels as pk

    num_vars = table.shape[0].bit_length() - 1
    for k in range(num_vars):
        if pk.pallas_available(table.shape[0]):
            table = pk.fold_pallas(ctx, table, values_mont[k])
        else:
            half = table.shape[0] // 2
            shaped = table.reshape(2, half, ctx.num_limbs)
            a, b = shaped[0], shaped[1]
            table = fb.add(
                ctx, a, fb.mont_mul(ctx, values_mont[k], fb.sub(ctx, b, a))
            )
    return table[0]


@functools.partial(jax.jit, static_argnums=(0,))
def scale_kernel(ctx: FieldCtx, table, value):
    return fb.mont_mul(ctx, table, value)


@functools.partial(jax.jit, static_argnums=(0,))
def sum_kernel(ctx: FieldCtx, table):
    return fb.field_sum(ctx, table, axis=0)


@functools.partial(jax.jit, static_argnums=(0,))
def halves_sum_kernel(ctx: FieldCtx, table):
    """[sum of first half, sum of second half] -- the plain-sumcheck round
    polynomial (/root/reference/sum_check/src/sum_check_protocol.rs:168-175)."""
    half = table.shape[0] // 2
    return jnp.stack(
        [fb.field_sum(ctx, table[:half], axis=0), fb.field_sum(ctx, table[half:], axis=0)]
    )


class MultilinearPoly:
    """Evaluation-table MLE. ``table``: uint32 (2^n, N), Montgomery domain."""

    __slots__ = ("ctx", "table", "num_vars", "_canonical_cache", "_bytes_cache",
                 "_sponge_cache")

    def __init__(self, ctx: FieldCtx, table, num_vars: int | None = None):
        self.ctx = ctx
        self.table = table
        self._canonical_cache = None
        self._bytes_cache = None
        self._sponge_cache = None
        n_entries = table.shape[0]
        nv = n_entries.bit_length() - 1
        if (1 << nv) != n_entries:
            raise ValueError("Invalid evaluations: length must be a power of two")
        self.num_vars = nv
        if num_vars is not None and num_vars != nv:
            raise ValueError("num_vars mismatch")

    # -- constructors / host IO -------------------------------------------

    @classmethod
    def from_ints(cls, ctx: FieldCtx, values) -> "MultilinearPoly":
        canonical = ctx.pack(list(values))
        poly = cls(ctx, fb.to_mont(ctx, jnp.asarray(canonical)))
        # host-constructed tables keep their canonical limbs so transcript
        # absorption never pulls the table back across the device boundary
        poly._canonical_cache = canonical
        return poly

    def to_ints(self) -> list[int]:
        canonical = np.asarray(fb.from_mont(self.ctx, self.table))
        return [int(v) for v in self.ctx.unpack(canonical)]

    def canonical_table(self) -> np.ndarray:
        """Canonical (non-Montgomery) limbs on host, for serialization."""
        if self._canonical_cache is not None:
            return self._canonical_cache
        return np.asarray(fb.from_mont(self.ctx, self.table))

    def to_transcript_bytes(self) -> bytes:
        if self._bytes_cache is None:
            self._bytes_cache = self.ctx.canonical_to_bytes(self.canonical_table())
        return self._bytes_cache

    def transcript_sponge(self):
        """Keccak sponge pre-absorbed with this table's transcript bytes
        (cached: prover and verifier share one pass over the table)."""
        from ..hash.keccak import Sponge

        if self._sponge_cache is None:
            sp = Sponge()
            sp.absorb(self.to_transcript_bytes())
            self._sponge_cache = sp
        return self._sponge_cache.copy()

    # -- core ops ----------------------------------------------------------

    def partial_evaluate(self, bit: int, value_mont) -> "MultilinearPoly":
        if self.num_vars == 0:
            raise ValueError("cannot fold a constant")
        half = self.table.shape[0] // 2
        tracker.count("mul", half)
        tracker.count("add", half)
        tracker.count("sub", half)
        return MultilinearPoly(
            self.ctx, fold_kernel(self.ctx, self.table, bit, jnp.asarray(value_mont))
        )

    def multi_partial_evaluate(self, values_mont) -> "MultilinearPoly":
        """Fold variable 0 repeatedly (reference :65-77)."""
        poly = self
        for v in values_mont:
            poly = poly.partial_evaluate(0, v)
        return poly

    def evaluate_mont(self, values_mont):
        """Full evaluation at a point; returns (N,) Montgomery limbs."""
        if len(values_mont) != self.num_vars:
            raise ValueError("Invalid number of values")
        if self.num_vars == 0:
            return self.table[0]
        tracker.count("mul", self.table.shape[0] - 1)
        tracker.count("add", 2 * (self.table.shape[0] - 1))
        stacked = jnp.stack([jnp.asarray(v) for v in values_mont])
        return evaluate_all_kernel(self.ctx, self.table, stacked)

    def evaluate_int(self, values_int: list[int]) -> int:
        vals = [self.encode_scalar(v) for v in values_int]
        out = fb.from_mont(self.ctx, self.evaluate_mont(vals))
        return int(self.ctx.unpack(np.asarray(out)))

    def scale(self, value_mont) -> "MultilinearPoly":
        tracker.count("mul", self.table.shape[0])
        return MultilinearPoly(self.ctx, scale_kernel(self.ctx, self.table, value_mont))

    def sum_mont(self):
        tracker.count("add", max(0, self.table.shape[0] - 1))
        return sum_kernel(self.ctx, self.table)

    def halves_sums(self):
        return halves_sum_kernel(self.ctx, self.table)

    def encode_scalar(self, value: int):
        """Host int -> (N,) Montgomery limbs on device."""
        return fb.to_mont(self.ctx, jnp.asarray(self.ctx.pack(value)))

    # -- elementwise algebra ----------------------------------------------

    def _binop(self, other, op):
        if other.table.shape != self.table.shape:
            raise ValueError("shape mismatch")
        tracker.count("mul" if op == "mul" else "add", self.table.shape[0])
        return MultilinearPoly(
            self.ctx, elementwise_kernel(self.ctx, self.table, other.table, op)
        )

    def __add__(self, other):
        return self._binop(other, "add")

    def __sub__(self, other):
        return self._binop(other, "sub")

    def __mul__(self, other):
        return self._binop(other, "mul")

    @classmethod
    def tensor_add_mul(cls, ctx, a: "MultilinearPoly", b: "MultilinearPoly", op: str):
        """(b,c)-tensor table op(a_i, b_j) of size |A|*|B| (reference :99-110)."""
        tracker.count("mul" if op == "mul" else "add",
                      a.table.shape[0] * b.table.shape[0])
        return cls(ctx, tensor_kernel(ctx, a.table, b.table, op))
