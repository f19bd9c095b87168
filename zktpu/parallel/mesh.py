"""Multi-chip sharding for evaluation tables, sumcheck, MSM, and NTT.

The reference is strictly single-threaded (SURVEY.md section 2: no rayon, no
MPI, no GPU); this module supplies the missing axis of scale, TPU-style:
``jax.sharding.Mesh`` + sharding-annotated jit so XLA/GSPMD compiles the
collectives onto ICI (SURVEY.md section 5.8).

Layout contract for sharded MLEs
--------------------------------
A 2^n-entry table is stored as ``(rows, D, N)`` with the D axis sharded over
the mesh: flat hypercube index = row * D + shard_lane, i.e. each device owns
the entries whose *minor* log2(D) index bits equal its lane. Because sumcheck
always folds variable 0 (the MSB -- reference sum_check_protocol.rs:45), every
fold round is a purely local lerp over the rows axis; only the two per-round
half-sums cross chips (a log-D reduction GSPMD inserts automatically). The
last log2(D) rounds run replicated on a gathered (tiny) table.

MSM sharding: points/scalars are split on the batch axis; the 255-step ladder
is entirely local, and only the final log-depth point-tree crosses chips.

NTT sharding: four-step decomposition N = N1*N2 -- local row NTTs, twiddle,
transpose (the all-to-all), local row NTTs -- so only log2(D) of the log2(N)
stages communicate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import jnp_backend as fb
from ..field.jnp_backend import FieldCtx
from ..poly.multilinear import MultilinearPoly

AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def table_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ----------------------------------------------------------------------
# sharded MLE kernels
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def _sharded_fold(ctx: FieldCtx, table, value):
    """Fold variable 0 of a (rows, D, N) minor-sharded table: local lerp."""
    rows, d, n = table.shape
    shaped = table.reshape(2, rows // 2, d, n)
    a, b = shaped[0], shaped[1]
    return fb.add(ctx, a, fb.mont_mul(ctx, value, fb.sub(ctx, b, a)))


@functools.partial(jax.jit, static_argnums=0)
def _sharded_halves_sums(ctx: FieldCtx, table):
    """[sum of first half, sum of second half] of the flat hypercube.

    Row split is the flat-index split (idx = row*D + lane); the inner
    reductions over rows are local, the final over D is GSPMD's psum.
    """
    rows = table.shape[0]
    lo = fb.field_sum(ctx, table[: rows // 2].reshape(-1, table.shape[-1]), axis=0)
    hi = fb.field_sum(ctx, table[rows // 2 :].reshape(-1, table.shape[-1]), axis=0)
    return jnp.stack([lo, hi])


@functools.partial(jax.jit, static_argnums=0)
def _sharded_total_sum(ctx: FieldCtx, table):
    return fb.field_sum(ctx, table.reshape(-1, table.shape[-1]), axis=0)


class ShardedMLE:
    """A 2^n-entry Montgomery table sharded on its minor index bits."""

    def __init__(self, ctx: FieldCtx, table, mesh: Mesh):
        self.ctx = ctx
        self.mesh = mesh
        self.table = table  # (rows, D, N), D sharded
        self.shards = table.shape[1]

    @classmethod
    def shard(cls, poly: MultilinearPoly, mesh: Mesh) -> "ShardedMLE":
        d = mesh.devices.size
        size = poly.table.shape[0]
        if size % d:
            raise ValueError("table smaller than mesh")
        # flat idx = row * D + lane
        reshaped = poly.table.reshape(size // d, d, poly.ctx.num_limbs)
        placed = jax.device_put(reshaped, table_sharding(mesh))
        return cls(poly.ctx, placed, mesh)

    @property
    def num_entries(self) -> int:
        return self.table.shape[0] * self.table.shape[1]

    def fold(self, value_mont) -> "ShardedMLE":
        return ShardedMLE(self.ctx, _sharded_fold(self.ctx, self.table, value_mont), self.mesh)

    def halves_sums(self):
        return _sharded_halves_sums(self.ctx, self.table)

    def total_sum(self):
        return _sharded_total_sum(self.ctx, self.table)

    def gather(self) -> MultilinearPoly:
        """Replicate and restore the flat (2^k, N) layout."""
        flat = jnp.reshape(
            jax.device_put(self.table, replicated(self.mesh)),
            (-1, self.ctx.num_limbs),
        )
        return MultilinearPoly(self.ctx, flat)


# ----------------------------------------------------------------------
# sharded sumcheck prover (byte-identical to the dense prover)
# ----------------------------------------------------------------------

def sumcheck_prove_sharded(poly: MultilinearPoly, mesh: Mesh):
    """Multi-chip plain-sumcheck prover; transcript bytes identical to
    ``zktpu.sumcheck.protocol.prove``."""
    from ..sumcheck import protocol as sc
    from ..transcript import Transcript

    ctx = poly.ctx
    transcript = Transcript(ctx.spec)
    transcript.append(poly.to_transcript_bytes())

    sharded = ShardedMLE.shard(poly, mesh)
    claimed_sum = sc._to_int(ctx, sharded.total_sum())
    transcript.append_field_elements([claimed_sum])

    proof_polynomials = []
    num_rounds = poly.num_vars
    current: ShardedMLE | None = sharded
    dense_table = None

    for _ in range(num_rounds):
        if current is not None and current.table.shape[0] > 1:
            halves = sc._to_ints(ctx, current.halves_sums())
        else:
            if dense_table is None:
                dense_table = current.gather().table
                current = None
            half = dense_table.shape[0] // 2
            halves = sc._to_ints(ctx, jnp.stack([
                fb.field_sum(ctx, dense_table[:half], axis=0),
                fb.field_sum(ctx, dense_table[half:], axis=0),
            ]))
        transcript.append_field_elements(halves)
        proof_polynomials.append(halves)

        r = transcript.get_random_challenge()
        r_mont = sc._encode(ctx, r)
        if current is not None:
            current = current.fold(r_mont)
        else:
            dense_table = sc.fold_tables_kernel(ctx, dense_table, r_mont)

    return sc.Proof(proof_polynomials, claimed_sum)


# ----------------------------------------------------------------------
# sharded GKR-variant (lazy fbc) sumcheck
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def _sharded_fold_stack(ctx: FieldCtx, tables, value):
    """Fold variable 0 of minor-sharded stacked tables (..., rows, D, N)."""
    *lead, rows, d, n = tables.shape
    shaped = tables.reshape(*lead, 2, rows // 2, d, n)
    a = shaped[..., 0, :, :, :]
    b = shaped[..., 1, :, :, :]
    return fb.add(ctx, a, fb.mont_mul(ctx, value, fb.sub(ctx, b, a)))


@functools.partial(jax.jit, static_argnums=0)
def _sharded_gkr_round(ctx: FieldCtx, tables):
    """Degree-2 round-poly evals for (2, 2, rows, D, N) minor-sharded
    2-product x 2-factor tables; same field values as
    ``zktpu.sumcheck.protocol.gkr_round_kernel``."""
    _, _, rows, d, n = tables.shape
    half = rows // 2
    a = tables[:, :, :half]
    b = tables[:, :, half:]
    diff = fb.sub(ctx, b, a)
    two = fb.add(ctx, jnp.asarray(ctx.one_mont), jnp.asarray(ctx.one_mont))
    ys = []
    for t in range(3):
        if t == 0:
            vals = a
        elif t == 1:
            vals = b
        else:
            vals = fb.add(ctx, a, fb.mont_mul(ctx, two, diff))
        prod = fb.mont_mul(ctx, vals[:, 0], vals[:, 1])
        total = fb.add(ctx, prod[0], prod[1])
        ys.append(fb.field_sum(ctx, total.reshape(-1, n), axis=0))
    return jnp.stack(ys)


def gkr_sumcheck_lazy_sharded(claimed_sum: int, fbc, transcript, mesh: Mesh):
    """Multi-chip lazy-fbc sumcheck (zktpu/gkr/lazy.py): phase tables are
    minor-bit sharded so every fold is local and only the per-round sums
    cross chips; transcript bytes identical to ``gkr_prove_lazy``.

    Both phases run as 2-product/2-factor tables ([[F, G], [H, 1]] for phase
    1 -- multiplying by the constant 1 table changes no field value); the
    last log2(D) rounds of each phase run replicated on the gathered table.
    """
    from ..gkr import lazy as lazy_mod
    from ..poly.univariate import UnivariatePoly
    from ..sumcheck import protocol as sc
    from ..sumcheck.protocol import GkrSumcheckProof

    ctx = fbc.ctx
    spec = ctx.spec
    nb = fbc.num_rounds // 2
    d = mesh.devices.size
    proof_polynomials = []
    random_challenges = []

    def shard_stack(tables):
        *lead, size, n = tables.shape
        reshaped = tables.reshape(*lead, size // d, d, n)
        spec_axes = P(*([None] * len(lead)), None, AXIS, None)
        return jax.device_put(reshaped, NamedSharding(mesh, spec_axes))

    def run_phase(tables):
        """tables: (2, 2, size, N) dense -> appends nb round polys."""
        size = tables.shape[2]
        sharded = shard_stack(tables) if size > d else None
        dense = tables if sharded is None else None
        rounds = size.bit_length() - 1  # == nb
        for _ in range(rounds):
            if sharded is not None and sharded.shape[2] > 1:
                ys = sc._to_ints(ctx, _sharded_gkr_round(ctx, sharded))
            else:
                if dense is None:
                    gathered = jax.device_put(sharded, replicated(mesh))
                    dense = gathered.reshape(2, 2, -1, ctx.num_limbs)
                    sharded = None
                ys = sc._to_ints(ctx, sc.gkr_round_kernel(ctx, dense, 2))
            round_poly = UnivariatePoly.interpolate(
                spec, [(t, y) for t, y in enumerate(ys)]
            )
            transcript.append_field_elements(round_poly.coefficients)
            proof_polynomials.append(round_poly)
            r = transcript.get_random_challenge()
            random_challenges.append(r)
            r_mont = sc._encode(ctx, r)
            if sharded is not None:
                sharded = _sharded_fold_stack(ctx, sharded, r_mont)
            else:
                dense = sc.fold_tables_kernel(ctx, dense, r_mont)
        final = dense if dense is not None else jax.device_put(
            sharded, replicated(mesh)
        ).reshape(2, 2, -1, ctx.num_limbs)
        return final

    # ---- phase 1: bind b (tables [[F, G], [H, 1]]) -----------------------
    gh = lazy_mod._phase1_tables_kernel(ctx, fbc.coef_a, fbc.coef_m, fbc.w_table)
    ones = jnp.broadcast_to(
        jnp.asarray(ctx.one_mont), fbc.w_table.shape
    ).astype(jnp.uint32)
    tables1 = jnp.stack([
        jnp.stack([fbc.w_table, gh[0]]), jnp.stack([gh[1], ones])
    ])
    final1 = run_phase(tables1)
    wb = final1[0, 0, 0]  # folded F = w(r_b)

    # ---- phase 2: bind c --------------------------------------------------
    eqb = lazy_mod.eq_tensor(ctx, [sc._encode(ctx, r) for r in random_challenges[:nb]])
    tables2 = lazy_mod._phase2_tables_kernel(
        ctx, fbc.coef_a, fbc.coef_m, fbc.w_table, eqb, wb
    )
    run_phase(tables2)

    return GkrSumcheckProof(proof_polynomials, claimed_sum, random_challenges)


# ----------------------------------------------------------------------
# sharded MSM
# ----------------------------------------------------------------------

def msm_sharded(mesh: Mesh, points, scalars):
    """MSM with points/scalars sharded on the batch axis: local ladders +
    local partial tree, then a log(D) cross-chip point reduction."""
    from ..curve import device as dc

    pts = tuple(
        jax.device_put(t, NamedSharding(mesh, P(AXIS, None))) for t in points
    )
    sc = jax.device_put(scalars, NamedSharding(mesh, P(AXIS, None)))

    @jax.jit
    def run(pts, sc):
        return dc.msm(pts, sc)

    return run(pts, sc)


def msm_pippenger_sharded(mesh: Mesh, points, scalars, c: int | None = None):
    """Multi-chip Pippenger: MSM is linear in the point set, so each device
    runs the full windowed pipeline on its batch shard (digits, sort,
    compaction tree, bucket reduction -- zktpu/msm/pippenger.py) and only the
    D per-device results cross chips (one all_gather of 3 coordinates + a
    log(D) point tree). Exact same group element as the single-chip MSM."""
    from functools import partial

    from jax import shard_map

    from ..curve import device as dc
    from ..msm import pippenger as pp

    d = mesh.devices.size
    n = scalars.shape[0]
    if n % d:
        raise ValueError("point count must divide the mesh")
    if c is None:
        c = pp.pick_window_bits(n // d)
    wg = pp._pick_window_group(n // d, 256 // c)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=((P(AXIS, None),) * 3, P(AXIS, None)),
        # each device emits its LOCAL partial point; the cross-chip tree-sum
        # runs outside the shard_map (GSPMD inserts the gather). check_vma
        # must stay off in this JAX version: pallas_call outputs carry no
        # vma type (TPU path) and the adaptive while_loop's carry fails vma
        # inference (CPU path) -- both are checker limitations, not sharding
        # bugs; the tree-sum reduction itself now runs under a checked jit.
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    def run(pts, sc):
        from ..curve import lm_point as lp

        local = pp._msm_impl.__wrapped__(lp.to_lm(pts), sc, c, wg)
        return tuple(v[None] for v in local)  # (1, 24) per device -> (D, 24)

    @jax.jit
    def run_and_reduce(pts, sc):
        return dc.tree_sum_points(run(pts, sc))

    pts = tuple(
        jax.device_put(t, NamedSharding(mesh, P(AXIS, None))) for t in points
    )
    sc = jax.device_put(scalars, NamedSharding(mesh, P(AXIS, None)))
    return run_and_reduce(pts, sc)


def msm_pippenger_multi_sharded(mesh: Mesh, points, scalars_batch):
    """Segment-sharded batched MSM: S same-size MSMs of one shared base,
    segments split across the mesh (each device runs the full windowed
    pipeline on its segment subset -- zero cross-chip traffic until the
    tiny (S, 24) result gathers). Segments pad to a mesh multiple with zero
    scalars (whose MSM is the identity); pads are dropped before return."""
    from functools import partial

    from jax import shard_map

    from ..curve import lm_point as lp
    from ..msm import pippenger as pp

    S, m = scalars_batch.shape[:2]
    d = mesh.devices.size
    pad = (-S) % d
    if pad:
        scalars_batch = jnp.concatenate(
            [scalars_batch, jnp.zeros((pad, m, scalars_batch.shape[2]),
                                      scalars_batch.dtype)], axis=0
        )
    s_loc = (S + pad) // d
    c = pp.pick_window_bits_multi(s_loc, m)
    wg = pp._pick_window_group(m, s_loc * (256 // c))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=((P(None, None),) * 3, P(AXIS, None, None)),
        out_specs=(P(AXIS, None),) * 3,
        # see msm_pippenger_sharded: checker limitations around pallas_call
        # outputs and while_loop carries in this JAX version
        check_vma=False,
    )
    def run(pts, sc):
        out = pp._msm_multi_impl.__wrapped__(lp.to_lm(pts), sc, s_loc, c, wg)
        return tuple(jnp.swapaxes(v, 0, 1) for v in out)

    pts = tuple(jax.device_put(t, replicated(mesh)) for t in points)
    sc = jax.device_put(
        scalars_batch, NamedSharding(mesh, P(AXIS, None, None))
    )
    out = jax.jit(run)(pts, sc)
    return tuple(v[:S] for v in out)


def point_tree_sum_sharded(mesh: Mesh, points):
    """Cross-chip point reduction only (the communication pattern of the
    sharded MSM without its 255-step ladder) -- used by fast dry runs."""
    from ..curve import device as dc

    pts = tuple(
        jax.device_put(t, NamedSharding(mesh, P(AXIS, None))) for t in points
    )

    @jax.jit
    def run(pts):
        return dc.tree_sum_points(pts)

    return run(pts)


# ----------------------------------------------------------------------
# sharded NTT (four-step)
# ----------------------------------------------------------------------

def ntt_sharded(ctx: FieldCtx, mesh: Mesh, table, inverse: bool = False):
    """Four-step NTT of a (2^k, N) Montgomery table across the mesh.

    Only the two transposes communicate (GSPMD all-to-all); both butterfly
    phases run on local rows. Result is in natural order, identical values to
    ``zktpu.ntt.ntt``.
    """
    from ..ntt.ntt import _ntt_kernel, _twiddles

    spec = ctx.spec
    n = table.shape[0]
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = n // n1

    omega = spec.root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, spec.modulus)
    # twiddle matrix w^(m1*k2), shape (n1, n2)
    tw_host = np.empty((n1, n2), dtype=object)
    for m1 in range(n1):
        w_m1 = pow(omega, m1, spec.modulus)
        acc = 1
        for k2 in range(n2):
            tw_host[m1, k2] = acc
            acc = acc * w_m1 % spec.modulus
    tw = fb.to_mont(ctx, jnp.asarray(ctx.pack(tw_host)))

    row_shard = NamedSharding(mesh, P(AXIS, None, None))

    @functools.partial(jax.jit, static_argnums=())
    def run(x, tw):
        # A[m1, m2] = x[n1*m2 + m1]
        a = jnp.transpose(x.reshape(n2, n1, ctx.num_limbs), (1, 0, 2))
        a = jax.lax.with_sharding_constraint(a, row_shard)
        # local row DFTs over m2 with root w^n1
        b = jax.vmap(lambda row: _ntt_kernel(ctx, row, n2.bit_length() - 1, inverse))(a)
        c = fb.mont_mul(ctx, b, tw)
        # transpose (the all-to-all), then local row DFTs over m1
        ct = jnp.transpose(c, (1, 0, 2))
        ct = jax.lax.with_sharding_constraint(ct, row_shard)
        d = jax.vmap(lambda row: _ntt_kernel(ctx, row, n1.bit_length() - 1, inverse))(ct)
        # D[k2, k1] -> X[n2*k1 + k2]
        out = jnp.transpose(d, (1, 0, 2)).reshape(n, ctx.num_limbs)
        return out

    out = run(jax.device_put(table, replicated(mesh)), tw)
    if inverse:
        n_inv = pow(n, -1, spec.modulus)
        out = fb.mont_mul(ctx, out, fb.to_mont(ctx, jnp.asarray(ctx.pack(n_inv))))
    return out
