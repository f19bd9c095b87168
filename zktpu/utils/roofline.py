"""Per-kernel roofline instrumentation: bytes, lane-ops, achieved vs peak.

The reference's only profiling is the ``field-tracker`` op counter
(/root/reference/sum_check/src/sum_check_protocol.rs:191,203); SURVEY.md
section 5.1 names "JAX profiler traces + per-kernel roofline counters" as the
TPU equivalent. This module supplies both:

  * analytic cost models for the framework's hot kernels (CIOS Montgomery
    multiply, MLE fold, NTT stage) in HBM bytes + 32-bit VPU lane-ops;
  * ``measure`` -- wall-time a kernel with honest device syncs and report
    achieved GB/s and Gop/s against the chip's peaks (the roofline);
  * ``trace`` -- a context manager around ``jax.profiler`` for full XLA
    traces (viewable in TensorBoard / xprof).

Every limb kernel in this framework is integer-elementwise, so the relevant
ceilings are HBM bandwidth (the usual binding constraint -- a 2^20-row fold
moves 3x64 MiB and does ~1k lane-ops per 64 B row, well past the knee) and
u32 VPU throughput, NOT the bf16 MXU peak quoted on spec sheets.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

#: chip peaks by device_kind. HBM numbers are public (v4: 1228, v5e: 819,
#: v5p: 2765, v6e: 1640 GB/s); the u32 VPU ceiling is an estimate (8x128
#: lanes x 4 ALUs x ~clock, with 32-bit multiplies microcoded at roughly
#: half rate) -- treat the Gop/s fraction as indicative, the GB/s fraction
#: as the real roofline.
PEAKS = {
    "v4": {"hbm_gbps": 1228.0, "vpu_gops": 4400.0},
    "v5 lite": {"hbm_gbps": 819.0, "vpu_gops": 3600.0},
    "v5e": {"hbm_gbps": 819.0, "vpu_gops": 3600.0},
    "v5p": {"hbm_gbps": 2765.0, "vpu_gops": 7200.0},
    "v6 lite": {"hbm_gbps": 1640.0, "vpu_gops": 7200.0},
    "v6e": {"hbm_gbps": 1640.0, "vpu_gops": 7200.0},
    "cpu": {"hbm_gbps": 50.0, "vpu_gops": 100.0},
}
_TPU_FALLBACK = PEAKS["v5e"]


def chip_peaks() -> dict:
    if jax.default_backend() != "tpu":
        return PEAKS["cpu"]
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    return _TPU_FALLBACK


@dataclasses.dataclass
class KernelProfile:
    name: str
    seconds: float
    bytes_accessed: int
    lane_ops: int

    @property
    def gbps(self) -> float:
        return self.bytes_accessed / self.seconds / 1e9

    @property
    def gops(self) -> float:
        return self.lane_ops / self.seconds / 1e9

    @property
    def hbm_frac(self) -> float:
        return self.gbps / chip_peaks()["hbm_gbps"]

    @property
    def vpu_frac(self) -> float:
        return self.gops / chip_peaks()["vpu_gops"]

    def line(self) -> str:
        return (
            f"{self.name}: {self.seconds*1e3:.2f} ms | "
            f"{self.gbps:.1f} GB/s ({self.hbm_frac:.0%} of HBM peak) | "
            f"{self.gops:.0f} Gop/s ({self.vpu_frac:.0%} of VPU est.)"
        )


def _sync(out):
    """Force completion of ``out`` by fetching ONE element of its first leaf.

    ``block_until_ready`` returns early under the axon tunnel; fetching the
    full output instead would time the tunnel transfer (tens of MB) rather
    than the kernel -- the round-4 "19x fold regression" was exactly that.
    A 1-element slice depends on the whole computation but moves O(1) bytes.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    sl = leaf[(slice(0, 1),) * leaf.ndim] if leaf.ndim else leaf
    jax.device_get(sl)


def measure(name: str, fn, *args, bytes_accessed: int, lane_ops: int,
            iters: int = 10, **kwargs) -> KernelProfile:
    """Time ``fn(*args)`` with an honest device sync (device_get of a
    1-element slice, which the axon tunnel cannot elide the way
    block_until_ready can, and which does not time the transfer)."""
    import time

    _sync(fn(*args, **kwargs))  # compile + settle
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    dt = (time.time() - t0) / iters
    return KernelProfile(name, dt, bytes_accessed, lane_ops)


# ----------------------------------------------------------------------
# cost models for the framework's hot kernels
# ----------------------------------------------------------------------

#: TPU minor-axis tile width: a lanes-last u32[n, L] table is stored T(8,128)
#: tiled, so the L=16 minor axis pads to 128 lanes -- 8x the compact bytes in
#: HBM *and* on every transfer (measured; see the env notes). Limb-major
#: (L, n) tables put the batch on the minor axis and pay no padding.
_LANE_TILE = 128


def elem_bytes(num_limbs: int, layout: str = "lanes_last") -> int:
    """HBM bytes actually moved per field element for a given layout."""
    if layout == "lanes_last" and jax.default_backend() == "tpu":
        return 4 * max(num_limbs, _LANE_TILE)
    return 4 * num_limbs


def cios_lane_ops(num_limbs: int) -> int:
    """32-bit lane-ops per CIOS Montgomery multiply of one element: the
    t-accumulator pass does ~2 mul + 2 add per (i, j) limb pair, twice
    (a*b and m*p), plus shifts/carries ~ 6 * L^2 total."""
    return 6 * num_limbs * num_limbs


def fold_cost(n_rows: int, num_limbs: int, layout: str = "lanes_last") -> tuple[int, int]:
    """(bytes, lane_ops) for one MLE fold round over n_rows entries:
    read n_rows, write n_rows/2; one mont_mul + add + sub per output."""
    elem_b = elem_bytes(num_limbs, layout)
    bytes_accessed = n_rows * elem_b + (n_rows // 2) * elem_b
    ops = (n_rows // 2) * (cios_lane_ops(num_limbs) + 4 * num_limbs)
    return bytes_accessed, ops


def ntt_cost(n: int, num_limbs: int, layout: str = "lanes_last") -> tuple[int, int]:
    """(bytes, lane_ops) for a full radix-2 NTT: log2(n) stages, each
    reading + writing the table and doing n/2 butterflies (1 mul, 1 add,
    1 sub)."""
    import math

    stages = int(math.log2(n))
    elem_b = elem_bytes(num_limbs, layout)
    bytes_accessed = stages * 2 * n * elem_b
    ops = stages * (n // 2) * (cios_lane_ops(num_limbs) + 4 * num_limbs)
    return bytes_accessed, ops


def mont_mul_cost(n: int, num_limbs: int, layout: str = "lanes_last") -> tuple[int, int]:
    elem_b = elem_bytes(num_limbs, layout)
    return 3 * n * elem_b, n * cios_lane_ops(num_limbs)


def point_add_cost(n: int, num_limbs: int = 24, layout: str = "lanes_last") -> tuple[int, int]:
    """Jacobian add-2007-bl + embedded double: ~16 mont muls and ~14
    add/subs per lane over 3 input + 3 output coords."""
    elem_b = elem_bytes(num_limbs, layout)
    bytes_accessed = 9 * n * elem_b
    ops = n * (16 * cios_lane_ops(num_limbs) + 14 * 2 * num_limbs)
    return bytes_accessed, ops


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/xprof format) around a
    block: ``with roofline.trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
