"""Layered arithmetic circuits of fan-in-2 add/mul gates.

Capability parity with /root/reference/gkr/src/gkr_circuit.rs:
  * ``Circuit``/``Layer`` built from a structure of per-layer operations
    (:113-125); ``layers[0]`` is adjacent to the inputs, the last layer is the
    single output gate.
  * ``evaluate`` runs layer by layer, each gate consuming consecutive pairs
    of the previous values, and returns EVERY layer's outputs (:127-143) --
    the prover needs all of them.
  * ``get_add_mul_i`` builds the wiring-predicate MLE add_i/mul_i(a,b,c) as a
    one-hot table (:39-52) with the reference's exact (idiosyncratic) bit
    packing (:54-104): gate index a gets log2(n) bits, inputs b=2a and c=2a+1
    get log2(n)+1 bits each, all concatenated MSB-first; a single-gate layer
    uses 3 one-bit segments.

TPU design: layer evaluation is one fused kernel per layer -- reshape the
input table to (gates, 2), compute both the add and mul of each pair, and
select by a per-gate mask. This is the embarrassingly-parallel gather+select
workload of SURVEY.md section 3.5; for 2^20-gate layers it is a single wide
VPU pass instead of a Rust gate loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import jnp_backend as fb
from ..field.jnp_backend import FieldCtx
from ..poly.multilinear import MultilinearPoly

ADD = "add"
MUL = "mul"


@functools.partial(jax.jit, static_argnums=0)
def layer_eval_kernel(ctx: FieldCtx, table, is_add_mask):
    """One circuit layer: out[g] = op_g(in[2g], in[2g+1])."""
    n_gates = table.shape[0] // 2
    shaped = table.reshape(n_gates, 2, ctx.num_limbs)
    left = shaped[:, 0]
    right = shaped[:, 1]
    added = fb.add(ctx, left, right)
    mulled = fb.mont_mul(ctx, left, right)
    return jnp.where(is_add_mask[:, None], added, mulled)


class Layer:
    __slots__ = ("ops",)

    def __init__(self, ops: list[str]):
        if not ops:
            raise ValueError("There must be at least one gate in the layer.")
        if any(op not in (ADD, MUL) for op in ops):
            raise ValueError("ops must be 'add' or 'mul'")
        self.ops = list(ops)

    @property
    def n_gates(self) -> int:
        return len(self.ops)

    def bits_for_gates(self) -> int:
        """Reference ``get_bits_for_gates`` (:54-65)."""
        n = self.n_gates
        if n == 1:
            return 3
        log_n = n.bit_length() - 1  # floor(log2), matches Rust ilog2
        return log_n + 2 * (log_n + 1)

    def gate_positions(self) -> np.ndarray:
        """One-hot index of each gate in the wiring MLE (reference
        ``gate_to_bits``, :67-104): MSB-first concat of (a | b=2a | c=2a+1)."""
        n = self.n_gates
        if n == 1:
            widths = (1, 1, 1)
        else:
            log_n = n.bit_length() - 1
            widths = (log_n, log_n + 1, log_n + 1)
        out = np.empty(n, dtype=np.int64)
        for idx in range(n):
            acc = 0
            for value, width in zip((idx, 2 * idx, 2 * idx + 1), widths):
                acc = (acc << width) | value
            out[idx] = acc
        return out

    def get_add_mul_i(self, ctx: FieldCtx, op: str) -> MultilinearPoly:
        """One-hot wiring-predicate MLE for gates with operation ``op``."""
        size = 1 << self.bits_for_gates()
        table = np.zeros((size, ctx.num_limbs), dtype=np.uint32)
        positions = self.gate_positions()
        mask = np.asarray([o == op for o in self.ops])
        table[positions[mask]] = ctx.one_mont  # Montgomery 1
        return MultilinearPoly(ctx, jnp.asarray(table))


class Circuit:
    """A stack of layers; built from per-layer op lists like the reference's
    ``Circuit::new(Vec<Vec<Operation>>)`` (:113-125)."""

    def __init__(self, ctx: FieldCtx, structure: list[list[str]]):
        self.ctx = ctx
        self.layers = [Layer(ops) for ops in structure]
        self._masks = [
            jnp.asarray([op == ADD for op in layer.ops]) for layer in self.layers
        ]

    @property
    def num_layers(self) -> int:
        return len(self.layers)

    def evaluate(self, inputs: MultilinearPoly) -> list[MultilinearPoly]:
        """Feed-forward evaluation; returns every layer's outputs in input ->
        output order (reference :127-143)."""
        outputs = []
        current = inputs.table
        for layer, mask in zip(self.layers, self._masks):
            if current.shape[0] != 2 * layer.n_gates:
                raise ValueError(
                    f"layer expects {2 * layer.n_gates} inputs, got {current.shape[0]}"
                )
            current = layer_eval_kernel(self.ctx, current, mask)
            outputs.append(MultilinearPoly(self.ctx, current))
        return outputs

    def evaluate_ints(self, input_values: list[int]) -> list[list[int]]:
        inputs = MultilinearPoly.from_ints(self.ctx, input_values)
        return [layer.to_ints() for layer in self.evaluate(inputs)]
