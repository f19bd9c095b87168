"""GKR circuit tests pinned to /root/reference/gkr/src/gkr_circuit.rs vectors."""

from zktpu.field.spec import BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.gkr.circuit import Circuit, Layer, ADD, MUL

ctx = fb.get_ctx(BN254_FQ)


def test_circuit_evaluates_correctly():
    """gkr_circuit.rs:151-186."""
    structure = [[MUL, MUL, MUL, MUL], [ADD, ADD], [ADD]]
    circuit = Circuit(ctx, structure)
    inputs = [5, 2, 2, 4, 10, 0, 3, 3]
    got = circuit.evaluate_ints(inputs)
    assert got == [[10, 8, 0, 9], [18, 9], [27]]


def test_layer_poly_outputs():
    """gkr_circuit.rs:188-202: w poly = gate outputs."""
    circuit = Circuit(ctx, [[ADD, MUL, ADD, MUL]])
    got = circuit.evaluate_ints([1, 2, 3, 4, 5, 6, 7, 8])
    assert got == [[3, 12, 11, 56]]


def test_add_i_polys():
    """gkr_circuit.rs:204-229: single-gate layers use 3 bits -> size-8 table."""
    add_layer = Layer([ADD])
    mul_layer = Layer([MUL])
    add_1 = add_layer.get_add_mul_i(ctx, ADD).to_ints()
    add_2 = mul_layer.get_add_mul_i(ctx, ADD).to_ints()
    assert add_1 == [0, 1, 0, 0, 0, 0, 0, 0]
    assert add_2 == [0] * 8


def test_mul_i_polys():
    """gkr_circuit.rs:231-256."""
    add_layer = Layer([ADD])
    mul_layer = Layer([MUL])
    assert add_layer.get_add_mul_i(ctx, MUL).to_ints() == [0] * 8
    assert mul_layer.get_add_mul_i(ctx, MUL).to_ints() == [0, 1, 0, 0, 0, 0, 0, 0]


def test_bit_packing_two_gates():
    """2-gate layer: a gets 1 bit, b and c get 2 bits each -> 5-bit index.

    gate 0: a=0, b=0, c=1 -> 0b0_00_01 = 1; gate 1: a=1, b=2=0b10, c=3 -> 0b1_10_11 = 0x1B.
    """
    layer = Layer([ADD, MUL])
    assert layer.bits_for_gates() == 5
    assert list(layer.gate_positions()) == [0b00001, 0b11011]
    add_i = layer.get_add_mul_i(ctx, ADD).to_ints()
    assert add_i[0b00001] == 1 and sum(add_i) == 1
    mul_i = layer.get_add_mul_i(ctx, MUL).to_ints()
    assert mul_i[0b11011] == 1 and sum(mul_i) == 1


def test_invalid_layer_width():
    circuit = Circuit(ctx, [[ADD, ADD]])
    try:
        circuit.evaluate_ints([1, 2])  # needs 4 inputs
        raise AssertionError("should have raised")
    except ValueError:
        pass
