"""MSM strategies vs the host curve oracle.

bit_split, Pippenger and the fixed-base comb must agree with naive host
scalar-mul/add (zktpu/curve/bls12_381.py, itself pinned to known BLS12-381
vectors).
"""

import numpy as np
import pytest

from zktpu.curve import bls12_381 as hc
from zktpu.curve import device as dc
from zktpu.msm import msm_bitsplit, generator_comb_mul
from zktpu.msm.bit_split import msm_bitsplit_host
from zktpu.msm.pippenger import msm_pippenger_host


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(11)
    n = 8
    ks = [int(k) for k in rng.integers(1, 1 << 40, size=n)]
    pts = [hc.multiply(hc.G1_GEN, k) for k in ks]
    scalars = [int(a) * int(b) % hc.R_ORDER for a, b in rng.integers(1, 1 << 62, size=(n, 2))]
    return pts, scalars


def test_bitsplit_matches_host(sample):
    pts, scalars = sample
    expect = None
    for p, s in zip(pts, scalars):
        t = hc.multiply(p, s)
        expect = t if expect is None else hc.add(expect, t)
    assert msm_bitsplit_host(pts, scalars) == expect


def test_bitsplit_edge_cases():
    pts = [hc.G1_GEN, hc.multiply(hc.G1_GEN, 5), None]
    # zero scalar, order-1 scalar, scalar on infinity point
    scalars = [0, hc.R_ORDER - 1, 7]
    expect = hc.neg(hc.multiply(hc.G1_GEN, 5))
    assert msm_bitsplit_host(pts, scalars) == expect


@pytest.mark.parametrize("c", [4, 8])
def test_pippenger_matches_host(sample, c):
    """c=16 (the large-MSM config) is exercised on TPU by bench.py; its
    32k-bucket reduction is too slow for CPU CI."""
    pts, scalars = sample
    expect = None
    for p, s in zip(pts, scalars):
        t = hc.multiply(p, s)
        expect = t if expect is None else hc.add(expect, t)
    assert msm_pippenger_host(pts, scalars, c=c) == expect


def test_pippenger_edge_cases():
    pts = [hc.G1_GEN, hc.multiply(hc.G1_GEN, 5), None]
    scalars = [0, hc.R_ORDER - 1, 7]
    expect = hc.neg(hc.multiply(hc.G1_GEN, 5))
    assert msm_pippenger_host(pts, scalars, c=4) == expect


def test_pippenger_duplicate_points():
    """Duplicate (point, digit) pairs force the doubling branch inside the
    compaction tree."""
    pts = [hc.G1_GEN] * 4 + [hc.multiply(hc.G1_GEN, 3)] * 3
    scalars = [123456789] * 4 + [987654321] * 3
    expect = hc.add(
        hc.multiply(hc.G1_GEN, 4 * 123456789),
        hc.multiply(hc.G1_GEN, 9 * 987654321),
    )
    assert msm_pippenger_host(pts, scalars, c=4) == expect


def test_pippenger_matches_bitsplit_larger():
    """128-point cross-check of two independent device strategies."""
    rng = np.random.default_rng(7)
    base = [hc.multiply(hc.G1_GEN, int(k)) for k in rng.integers(1, 1 << 30, size=8)]
    pts = [base[i % 8] for i in range(128)]
    scalars = [int(a) * int(b) % hc.R_ORDER for a, b in rng.integers(1, 1 << 62, size=(128, 2))]
    a = msm_pippenger_host(pts, scalars, c=8)
    packed = dc.pack_points(pts)
    sc = dc.pack_scalars(scalars)
    b = dc.unpack_points(tuple(t[None] for t in msm_bitsplit(packed, sc)))[0]
    assert a == b


def test_generator_comb(sample):
    _, scalars = sample
    sc = dc.pack_scalars(scalars + [0, 1, hc.R_ORDER - 1])
    affs = dc.unpack_points(generator_comb_mul(sc))
    for s, a in zip(scalars + [0, 1, hc.R_ORDER - 1], affs):
        assert a == (hc.multiply(hc.G1_GEN, s) if s else None)


def test_comb_matches_ladder(sample):
    _, scalars = sample
    sc = dc.pack_scalars(scalars)
    a = dc.unpack_points(generator_comb_mul(sc))
    b = dc.unpack_points(dc.batch_generator_mul(sc))
    assert a == b


def test_msm_staged_matches_host(sample):
    """The staged per-shape TPU dispatch path (adaptive compaction rounds,
    one jit per stage) must give the exact group element of the host loop,
    including the degenerate all-equal-scalars input whose single bucket run
    forces the worst-case round count."""
    from zktpu.curve import lm_point as lp
    from zktpu.msm import pippenger as pp

    pts, scalars = sample
    packed = dc.pack_points(pts)
    for sc_ints in (scalars, [12345] * len(pts)):
        expect = None
        for p, s in zip(pts, sc_ints):
            t = hc.multiply(p, s)
            expect = t if expect is None else hc.add(expect, t)
        sc = dc.pack_scalars(sc_ints)
        wg = pp._pick_window_group(len(pts), 64)
        out = pp._msm_staged(lp.to_lm(packed), sc, 4, wg)
        got = dc.unpack_points(tuple(t[None] for t in out))[0]
        assert got == expect


def test_msm_multi_matches_individual(sample):
    """Segment-batched MSM (shared base): each segment's result must equal
    its individual MSM."""
    from zktpu.msm.pippenger import msm_pippenger_multi

    pts, scalars = sample
    rng = np.random.default_rng(17)
    packed = dc.pack_points(pts)
    batch = [
        [int(a) for a in rng.integers(1, 1 << 62, size=len(pts))]
        for _ in range(3)
    ]
    sc = np.stack([dc.pack_scalars(s) for s in batch])
    out = msm_pippenger_multi(packed, sc, c=4)
    got = dc.unpack_points(out)
    for seg, sc_ints in zip(got, batch):
        expect = None
        for p, s in zip(pts, sc_ints):
            t = hc.multiply(p, s)
            expect = t if expect is None else hc.add(expect, t)
        assert seg == expect
