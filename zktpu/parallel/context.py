"""Active-mesh context: one switch that turns the single-chip protocol code
into its multi-chip form.

The TPU-native scaling recipe (SURVEY.md section 5.8) is *annotate, don't
rewrite*: the same jit programs run under GSPMD with sharded inputs, and XLA
inserts the collectives. ``use_mesh`` makes a mesh visible to the hot paths
(fused lazy-GKR phases, KZG commitment MSMs, circuit layer eval), which then
place their tables with a sharding instead of replicated. Field values -- and
therefore proof bytes -- are unchanged: sharding is an execution detail
(tested byte-identical on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

import contextlib

from jax.sharding import Mesh

_ACTIVE: list[Mesh] = []

#: a sharded MSM / phase table must give each device at least this many rows
#: to be worth the collectives; tests force it down to exercise the path
MIN_ROWS_PER_DEVICE = 256


def current_mesh() -> Mesh | None:
    return _ACTIVE[-1] if _ACTIVE else None


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Activate ``mesh`` for the enclosed protocol code (None = no-op)."""
    if mesh is None:
        yield
        return
    _ACTIVE.append(mesh)
    try:
        yield
    finally:
        _ACTIVE.pop()


def shardable(size: int, mesh: Mesh, min_rows: int | None = None) -> bool:
    """True when a size-``size`` batch axis is worth sharding over ``mesh``."""
    d = mesh.devices.size
    if min_rows is None:
        min_rows = MIN_ROWS_PER_DEVICE
    return size % d == 0 and size // d >= min_rows
