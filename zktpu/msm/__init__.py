"""Multi-scalar multiplication strategies for BLS12-381 G1 on TPU.

Replaces the reference's sequential per-point loop
(/root/reference/pcs/src/kzg_pcs/kzg.rs:131-144) with two device algorithms
chosen by workload:

  * ``fixed_base``  -- comb method for k*G over a FIXED base (the trusted
    setup's Lagrange-SRS builder, kzg.rs:183-212): a one-time (W, 2^c) table
    of d*2^(cw)*G turns every scalar mul into W table gathers + W-1 adds --
    no doublings at all (~16x less group work than a ladder).
  * ``bit_split``   -- general MSM as 255 bit-masked tree reductions with a
    width-1 Horner double chain: sum_b 2^b * tree_sum({P_i : bit b set}).
    Removes the per-lane double chain of the batched ladder (~2x) and runs
    as one compact fori_loop program.

The batched double-and-add ladder lives in ``zktpu.curve.device`` and remains
the fallback for tiny inputs.
"""

from .bit_split import msm_bitsplit
from .fixed_base import generator_comb_mul

__all__ = ["msm_bitsplit", "generator_comb_mul"]
