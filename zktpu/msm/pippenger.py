"""Pippenger MSM on TPU: sort-by-digit bucket accumulation + suffix-scan
bucket reduction, with every group operation running as a Pallas point kernel
over limb-major tiles.

Replaces the reference's naive per-point MSM loop
(/root/reference/pcs/src/kzg_pcs/kzg.rs:131-144) (SURVEY.md section 7.6:
"Pippenger MSM (window buckets per chip, bucket reduction via collectives)").

Why this shape on a TPU
-----------------------
Classic GPU Pippenger scatters points into buckets -- TPUs have no fast
scatter, and a naive masked alternative costs ``n * log n`` group adds. This
implementation keeps the total group-op count at ~``2.2 * W * n`` adds
(W = number of windows) using only wide, static-shape vector steps:

1. **Digits**: c-bit windows (c | 16) sliced out of the 16-bit limb layout.
   Signed recoding (digit in [-2^(c-1), 2^(c-1)]) halves the bucket count;
   a negative digit just negates Y (one modular sub).
2. **Sort**: one ``argsort`` of ``window * NBUCK + |digit|`` keys groups equal
   buckets into contiguous runs -- data movement, no group math.
3. **Compaction tree**: ceil(log2(L)) rounds; each round pairs rank-even run
   elements with their right neighbour (one Jacobian add at the *compacted*
   width) and compacts survivors by gather (`cumsum` + `searchsorted`, no
   scatter). Every run halves every round and the array physically shrinks,
   so total add work is a small constant times the input size.
4. **Densify**: merge the per-key survivors with one dummy infinity per
   bucket, sort, one more pair round -> a dense (W, NBUCK) bucket table.
5. **Bucket reduction**: suffix sums T_j = sum_{k>=j} B_k by Kogge-Stone
   shifts, then sum_j T_j = sum_k k*B_k by a pairwise tree.
6. **Window combine**: c-double Horner chain over the W windows.

Performance architecture: an XLA point-add call site inlines ~24 CIOS muls
(~25k HLO ops) and costs minutes of XLA optimization PER SITE -- round 2's
version spent 400-950 s compiling. Every group op here goes through
``zktpu.curve.pallas_point`` instead: ONE Mosaic kernel per batch width,
compiled in seconds and shared by all call sites of that width (compaction
widths are quantized to the kernel tile to keep the set of widths small).
Points stay limb-major (24, B) end to end -- full 128-lane utilization and
5.3x less HBM traffic than the lanes-last (B, 24) layout, whose 24-wide minor
axis pads to 128 lanes in both VMEM and HBM tiles.

Infinity is Z == 0 throughout, so masked-out lanes are free and the add
kernel handles every edge case branchlessly (doubling, P == -Q, infinity).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..curve import device as dc
from ..curve import lm_point as lp
from ..curve.pallas_point import TILE, point_add_px, point_double_px
from ..field import limb_major as lm
from ..field.spec import LIMB_BITS

FQ_CTX = dc.FQ_CTX

_MAXKEY = jnp.int32(2**30)
_U32 = jnp.uint32
#: bucket-tree widths at or below this use the single masked-fori site
_TREE_DIRECT = 4096
#: batched MSMs with S*m at or below this run as a bit-split ladder (cheap
#: cold compile) instead of the windowed Pippenger monolith
MULTI_LADDER_MAX = 1 << 17


def pick_window_bits(n: int) -> int:
    """Window width minimizing total group adds for an n-point MSM.

    Model: accumulation ~2.2*W*n (compaction tree), densify 2*W*K,
    Kogge-Stone suffix sums W*K*log2(K), pairwise tree 2*W*K, Horner 256.
    (Round 2's model omitted the K*log2(K) suffix term, mis-picking c=16
    at 2^16 where the 32k-bucket reduction dominates.)
    """
    best, best_cost = 4, None
    for c in (4, 8, 16):
        w = 256 // c
        k = 1 << (c - 1)
        cost = 2.2 * w * n + 2 * w * k + w * k * max(1, math.ceil(math.log2(k))) + 2 * w * k
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def pick_window_bits_multi(S: int, m: int) -> int:
    """Window width for an S-segment batched MSM of m points each.

    Unlike the single-MSM picker, the reduction terms AND the dense bucket
    table scale with S*W: at S=32, m=2^15, c=16 the (24, S*W, NBUCK) table
    would be 64 GB -- a guaranteed HBM OOM (observed as a TPU kernel fault).
    Windows whose bucket table exceeds ~2 GB are excluded outright."""
    best, best_cost = 4, None
    for c in (4, 8, 16):
        w = 256 // c
        k = 1 << (c - 1)
        if S * w * (k + 1) * 96 > 2e9:
            continue
        cost = (2.2 * w * S * m + 2 * S * w * k
                + S * w * k * max(1, math.ceil(math.log2(k))) + 2 * S * w * k)
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def _recode_signed(scalars, c: int):
    """Canonical (n, 16) Fr limbs -> (W, n) |digit| uint32 + (W, n) sign bool.

    scalar = sum_w d_w * 2^(cw) with d_w in [-2^(c-1), 2^(c-1)]; a digit
    > 2^(c-1) borrows: use d - 2^c and carry 1 into the next window. W*c =
    256 > 255 scalar bits, so the top window never overflows.
    """
    n = scalars.shape[0]
    W = 256 // c
    per_limb = LIMB_BITS // c
    carry = jnp.zeros((n,), _U32)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    mask = jnp.uint32((1 << c) - 1)
    abs_digits, signs = [], []
    for w in range(W):
        u = (scalars[:, w // per_limb] >> ((w % per_limb) * c)) & mask
        d = u + carry
        neg = d > half
        abs_digits.append(jnp.where(neg, full - d, d))
        signs.append(neg)
        carry = neg.astype(_U32)
    return jnp.stack(abs_digits), jnp.stack(signs)


def _gather_pt(pt, idx):
    return tuple(v[:, idx] for v in pt)


def _where_pt(mask, a, b):
    m = mask[None]
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _quantize(width: int) -> int:
    """Round a compaction width up to the Pallas tile (or a pow2 below it)
    so every round reuses one of a handful of kernel widths."""
    if width >= TILE:
        return -(-width // TILE) * TILE
    w = 128
    while w < width:
        w *= 2
    return w


def _compact_round(key, pt, l_next: int):
    """One compaction-tree round: pair rank-even elements with their right
    neighbour when keys match, then compact survivors to ``l_next`` slots.

    ``key``: (L,) int32 sorted; ``pt``: limb-major Jacobian (24, L) triple.
    Padding slots get key MAXKEY / value infinity.
    """
    L = key.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    head = jnp.concatenate([jnp.ones((1,), bool), key[1:] != key[:-1]])
    run_start = jax.lax.cummax(jnp.where(head, pos, 0))
    rank = pos - run_start
    is_left = (rank & 1) == 0
    next_same = jnp.concatenate([key[1:] == key[:-1], jnp.zeros((1,), bool)])
    has_partner = jnp.logical_and(is_left, next_same)

    # survivor j (0-based) lives at the position of the (j+1)-th is_left
    csum = jnp.cumsum(is_left.astype(jnp.int32))
    total = csum[-1]
    wanted = jax.lax.broadcasted_iota(jnp.int32, (l_next,), 0) + 1
    srcpos = jnp.searchsorted(csum, wanted, side="left")
    valid = wanted <= total
    srcpos = jnp.clip(srcpos, 0, L - 1)

    left = _gather_pt(pt, srcpos)
    right = _gather_pt(pt, jnp.clip(srcpos + 1, 0, L - 1))
    merged = point_add_px(left, right)
    take_merge = jnp.logical_and(has_partner[srcpos], valid)
    out = _where_pt(take_merge, merged, left)
    out = _where_pt(valid, out, lp.infinity_lm(FQ_CTX, l_next))
    new_key = jnp.where(valid, key[srcpos], _MAXKEY)
    return new_key, out


def _compaction_schedule(l0: int, max_segments: int) -> tuple[list[int], int]:
    """(shrinking sizes, fixed-size round count): survivors <= (L+#runs)/2,
    ceil(log2(l0)) total rounds guarantee every run reaches length 1. Once
    the size stops shrinking meaningfully (<= 2*max_segments) the remaining
    rounds run at one fixed size under a single lax.scan. Sizes are
    tile-quantized so the Pallas add kernel compiles once per distinct width."""
    rounds = max(1, math.ceil(math.log2(max(2, l0))))
    sizes, L = [], l0
    floor = _quantize(2 * max_segments)
    while L > floor and len(sizes) < rounds:
        L = _quantize(min(L, (L + max_segments + 1) // 2 + 1))
        sizes.append(L)
    return sizes, rounds - len(sizes)


def _presort(points, abs_d, signs, nbuck: int):
    """Sort a window group by (window, |digit|) key; negate Y on negative
    digits, mask digit-0 lanes to infinity. Returns (sorted key, pt)."""
    Xp, Yp, Zp = points
    Wg, n = abs_d.shape
    L0 = Wg * n

    key = (abs_d.astype(jnp.int32)
           + (jax.lax.broadcasted_iota(jnp.int32, (Wg, 1), 0) * nbuck)).reshape(L0)
    order = jnp.argsort(key)
    skey = key[order]
    src = order % n
    sgn = signs.reshape(L0)[order]

    X = Xp[:, src]
    Z = Zp[:, src]
    Y = Yp[:, src]
    y_neg = lm.sub(FQ_CTX, jnp.zeros_like(Y), Y)
    Y = jnp.where(sgn[None], y_neg, Y)
    # digit 0 contributes nothing: mask those lanes to infinity
    Z = jnp.where((skey % nbuck == 0)[None], jnp.zeros_like(Z), Z)
    return skey, (X, Y, Z)


def _fixed_rounds(skey, pt, rounds: int):
    """Up to ``rounds`` fixed-width compaction rounds with device-side early
    exit: every round halves every run, so the loop stops as soon as no
    adjacent equal (non-sentinel) keys remain. Random scalars leave runs of
    ~n/NBUCK -> a handful of iterations; only degenerate inputs (all scalars
    equal) walk the full worst-case count. One program either way."""
    L = skey.shape[0]

    def cond(state):
        k, _, i = state
        dup = jnp.any(jnp.logical_and(k[1:] == k[:-1], k[1:] != _MAXKEY))
        return jnp.logical_and(dup, i < rounds)

    def body(state):
        k, p, i = state
        k2, p2 = _compact_round(k, p, L)
        return (k2, p2, i + 1)

    skey, pt, _ = jax.lax.while_loop(cond, body, (skey, pt, jnp.int32(0)))
    return skey, pt


def _densify(skey, pt, Wg: int, nbuck: int):
    """One dummy infinity per (window, bucket) key, sort, one more pair
    round -> a dense (24, Wg, nbuck) bucket table in key order."""
    n_keys = Wg * nbuck
    dummy_key = jax.lax.broadcasted_iota(jnp.int32, (n_keys,), 0)
    all_key = jnp.concatenate([skey, dummy_key])
    order2 = jnp.argsort(all_key)
    skey2 = all_key[order2]
    inf = lp.infinity_lm(FQ_CTX, n_keys)
    pt2 = tuple(jnp.concatenate([a, b], axis=1)[:, order2] for a, b in zip(pt, inf))
    _, dense = _compact_round(skey2, pt2, _quantize(n_keys))
    return tuple(v[:, :n_keys].reshape(-1, Wg, nbuck) for v in dense)


def _group_bucket_sums(points, abs_d, signs, nbuck: int):
    """Dense (24, Wg, nbuck) limb-major bucket table for a group of windows
    (bucket 0 holds junk and is dropped by the reduction)."""
    Wg, n = abs_d.shape
    skey, pt = _presort(points, abs_d, signs, nbuck)
    shrink_sizes, fixed_rounds = _compaction_schedule(Wg * n, Wg * nbuck + 1)
    for l_next in shrink_sizes:
        skey, pt = _compact_round(skey, pt, l_next)
    if fixed_rounds > 0:
        skey, pt = _fixed_rounds(skey, pt, fixed_rounds)
    return _densify(skey, pt, Wg, nbuck)


# ---- staged dispatch: one jit per stage, per-shape programs reused -------
#
# A monolithic _msm_impl jit inlines every compaction round, Kogge-Stone
# step and tree level into ONE program: ~40 Pallas point-kernel sites whose
# compiles are NOT cached across processes by the axon remote-compile
# service (measured: 252 s cold at 2^16 on a shape already compiled the
# previous day). Staging compiles one small program per (stage, shape) --
# widths are quantized, so compaction rounds and tree levels REUSE the same
# few programs -- and the dispatch count stays ~30 per MSM (microseconds of
# overhead against a ~1 s runtime).

_digits_jit = jax.jit(_recode_signed, static_argnums=(1,))
_presort_jit = jax.jit(_presort, static_argnums=(3,))
_compact_round_jit = jax.jit(_compact_round, static_argnums=(2,))
_fixed_rounds_jit = jax.jit(_fixed_rounds, static_argnums=(2,))
_densify_jit = jax.jit(_densify, static_argnums=(2, 3))


@jax.jit
def _max_run(skey):
    """Longest equal-key run of a sorted key vector (uint32 scalar)."""
    L = skey.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    head = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_start = jax.lax.cummax(jnp.where(head, pos, 0))
    return jnp.max(pos - run_start) + 1


def _bucket_pipeline_staged(points, abs_g, sgn_g, nbuck: int):
    """Staged _group_bucket_sums over (G, Wg, n) digit groups ->
    (24, G*Wg, nbuck) bucket table.

    Data-adaptive round count: every compaction round halves every run, so
    ceil(log2(longest run)) rounds suffice -- for random scalars the longest
    bucket run is ~n/NBUCK + O(sqrt), typically 2-3 fixed rounds instead of
    the worst-case ~16 (which only degenerate inputs -- e.g. all scalars
    equal -- actually need). One O(1)-byte host fetch per group buys a ~40%
    cut of total group adds at 2^20."""
    G, Wg, n = abs_g.shape
    parts = []
    for g in range(G):
        skey, pt = _presort_jit(points, abs_g[g], sgn_g[g], nbuck)
        rounds_needed = math.ceil(
            math.log2(max(2, int(jax.device_get(_max_run(skey)))))
        )
        shrink_sizes, _ = _compaction_schedule(Wg * n, Wg * nbuck + 1)
        shrink_sizes = shrink_sizes[:rounds_needed]
        for l_next in shrink_sizes:
            skey, pt = _compact_round_jit(skey, pt, l_next)
        for _ in range(rounds_needed - len(shrink_sizes)):
            skey, pt = _compact_round_jit(skey, pt, skey.shape[0])
        parts.append(_densify_jit(skey, pt, Wg, nbuck))
    if G == 1:
        return parts[0]
    return tuple(
        jnp.concatenate([p[i] for p in parts], axis=1) for i in range(3)
    )


def _flat_add(a, b):
    N = a[0].shape[0]
    out = point_add_px(
        tuple(v.reshape(N, -1) for v in a),
        tuple(v.reshape(N, -1) for v in b),
    )
    return tuple(v.reshape(a[0].shape) for v in out)


def _ks_step(vals, d: int):
    """One Kogge-Stone suffix-sum step at shift ``d``."""
    N, W, _ = vals[0].shape
    inf = tuple(v.reshape(N, W, -1) for v in lp.infinity_lm(FQ_CTX, W * d))
    shifted = tuple(
        jnp.concatenate([v[:, :, d:], pad], axis=2)
        for v, pad in zip(vals, inf)
    )
    return _flat_add(vals, shifted)


def _pair_step(vals):
    """One halving level of the pairwise bucket-sum tree."""
    k = vals[0].shape[2]
    half = k // 2
    lo = tuple(v[:, :, :half] for v in vals)
    hi = tuple(v[:, :, half: 2 * half] for v in vals)
    red = _flat_add(lo, hi)
    if k % 2:
        red = tuple(
            jnp.concatenate([r, v[:, :, 2 * half:]], axis=2)
            for r, v in zip(red, vals)
        )
    return red


def _weighted_bucket_reduce(buckets):
    """(24, W, NBUCK) bucket table -> (24, W) per-window sums sum_k k*B_k.

    Kogge-Stone suffix sums T_j = sum_{k>=j} B_k, then sum_{j>=1} T_j by a
    fixed-width halving tree; bucket 0 is dropped. Both loops run as
    ``fori_loop`` with DYNAMIC shifts (roll + infinity masking) so each
    contributes ONE Pallas add site to the program instead of log2(K) --
    program count is what the axon remote-compile service bills for.
    """
    vals = tuple(v[:, :, 1:] for v in buckets)  # k = 1 .. NBUCK-1
    K = vals[0].shape[2]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    ks_steps = max(1, (K - 1).bit_length())

    def ks_body(i, vals):
        d = jnp.left_shift(jnp.int32(1), i)
        x, y, z = (jnp.roll(v, -d, axis=2) for v in vals)
        z = jnp.where(idx + d < K, z, 0)  # rolled-past lanes -> infinity
        return _flat_add(vals, (x, y, z))

    vals = jax.lax.fori_loop(0, ks_steps, ks_body, vals)

    # sum_j T_j: REAL halving levels while wide (each slice halves the add
    # width -- O(K) total work), then one masked fixed-width fori for the
    # narrow tail (lanes >= stride hold garbage no smaller-stride pair ever
    # reads; lane 0 is the sum). Keeps the level count off the program's
    # Pallas-site bill without paying full-width adds at 2^15 buckets.
    while vals[0].shape[2] > _TREE_DIRECT:
        vals = _pair_step(vals)
    K2 = vals[0].shape[2]
    if K2 > 1:
        idx2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K2), 2)
        tree_steps = (K2 - 1).bit_length()
        kp = 1 << tree_steps  # K2 rounded up to a power of two

        def tree_body(i, vals):
            s = jnp.right_shift(jnp.int32(kp), i + 1)
            x, y, z = (jnp.roll(v, -s, axis=2) for v in vals)
            z = jnp.where(idx2 + s < K2, z, 0)
            return _flat_add(vals, (x, y, z))

        vals = jax.lax.fori_loop(0, tree_steps, tree_body, vals)
    return tuple(v[:, :, 0] for v in vals)


_ks_step_jit = jax.jit(_ks_step, static_argnums=(1,))
_pair_step_jit = jax.jit(_pair_step)


def _weighted_reduce_staged(buckets):
    vals = tuple(v[:, :, 1:] for v in buckets)
    K = vals[0].shape[2]
    d = 1
    while d < K:
        vals = _ks_step_jit(vals, d)
        d *= 2
    while vals[0].shape[2] > 1:
        vals = _pair_step_jit(vals)
    return tuple(v[:, :, 0] for v in vals)


def _horner_single(per_window, c: int):
    """Window combine: acc = ((R_{W-1} * 2^c + R_{W-2}) * 2^c + ...)."""
    num_windows = per_window[0].shape[1]
    acc0 = tuple(v[:, num_windows - 1: num_windows] for v in per_window)

    def horner(i, acc):
        w = num_windows - 2 - i
        acc = jax.lax.fori_loop(0, c, lambda _, a: point_double_px(a), acc)
        pw = tuple(
            jax.lax.dynamic_slice_in_dim(v, w, 1, axis=1) for v in per_window
        )
        return point_add_px(acc, pw)

    out = jax.lax.fori_loop(0, num_windows - 1, horner, acc0)
    return tuple(v[:, 0] for v in out)


def _horner_multi(per_window, c: int):
    """Batched window combine over (24, S, W) per-segment tables -> (24, S)."""
    num_windows = per_window[0].shape[2]
    acc0 = tuple(v[:, :, num_windows - 1] for v in per_window)

    def horner(i, acc):
        w = num_windows - 2 - i
        acc = jax.lax.fori_loop(0, c, lambda _, a: point_double_px(a), acc)
        pw = tuple(
            jax.lax.dynamic_slice_in_dim(v, w, 1, axis=2)[:, :, 0]
            for v in per_window
        )
        return point_add_px(acc, pw)

    return jax.lax.fori_loop(0, num_windows - 1, horner, acc0)


_horner_single_jit = jax.jit(_horner_single, static_argnums=(1,))
_horner_multi_jit = jax.jit(_horner_multi, static_argnums=(1,))


def _pick_window_group(n: int, num_windows: int) -> int:
    """Windows per sort pass (must divide W), capping the sort+gather peak
    memory (~4 live limb-major copies at 288 B/entry) at ~4 GB."""
    budget = int(4e9)
    per_window = max(1, n) * 288 * 4
    cap = max(1, budget // per_window)
    wg = num_windows
    while wg > cap:
        wg //= 2
    return max(1, wg)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _msm_impl(points, scalars, c: int, window_group: int):
    num_windows = 256 // c
    nbuck = (1 << (c - 1)) + 1
    abs_d, signs = _recode_signed(scalars, c)
    n_groups = num_windows // window_group
    abs_g = abs_d.reshape(n_groups, window_group, -1)
    sgn_g = signs.reshape(n_groups, window_group, -1)

    if n_groups == 1:
        buckets = _group_bucket_sums(points, abs_g[0], sgn_g[0], nbuck)
    else:
        def body(_, inp):
            a, s = inp
            return None, _group_bucket_sums(points, a, s, nbuck)

        _, stacked = jax.lax.scan(body, None, (abs_g, sgn_g))
        # (G, 24, Wg, nbuck) -> (24, W, nbuck)
        buckets = tuple(
            jnp.moveaxis(v, 0, 1).reshape(-1, num_windows, nbuck) for v in stacked
        )

    per_window = _weighted_bucket_reduce(buckets)  # (24, W)
    return _horner_single(per_window, c)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _msm_multi_impl(points, scalars, S: int, c: int, window_group: int):
    """Segmented MSM against ONE shared base: scalars (S, m, 16) canonical,
    points limb-major (24, m) -> (24, S) per-segment Jacobian results.

    The S segments ride the existing windowed pipeline as S*W independent
    'windows' over the same point set -- one sort/compaction pass per window
    group and ONE program for all segments, replacing S separate MSM
    dispatches (the KZG get_proof hot path: 12 quotient MSMs cost 90 s as
    individual ladders at 2^12, ~0.5 s batched)."""
    m = scalars.shape[1]
    num_windows = 256 // c
    SW = S * num_windows
    nbuck = (1 << (c - 1)) + 1
    abs_d, signs = _recode_signed(scalars.reshape(S * m, -1), c)  # (W, S*m)
    # (W, S, m) -> (S*W, m): segment-major window slots
    abs_d = jnp.moveaxis(abs_d.reshape(num_windows, S, m), 1, 0).reshape(SW, m)
    signs = jnp.moveaxis(signs.reshape(num_windows, S, m), 1, 0).reshape(SW, m)

    n_groups = SW // window_group
    abs_g = abs_d.reshape(n_groups, window_group, m)
    sgn_g = signs.reshape(n_groups, window_group, m)

    if n_groups == 1:
        buckets = _group_bucket_sums(points, abs_g[0], sgn_g[0], nbuck)
    else:
        def body(_, inp):
            a, s = inp
            return None, _group_bucket_sums(points, a, s, nbuck)

        _, stacked = jax.lax.scan(body, None, (abs_g, sgn_g))
        buckets = tuple(
            jnp.moveaxis(v, 0, 1).reshape(-1, SW, nbuck) for v in stacked
        )

    per_window = _weighted_bucket_reduce(buckets)  # (24, S*W)
    per_window = tuple(v.reshape(-1, S, num_windows) for v in per_window)
    return _horner_multi(per_window, c)


def _msm_staged(points_lm, scalars, c: int, wg: int):
    """Single-result MSM via staged per-shape programs (TPU path)."""
    num_windows = 256 // c
    nbuck = (1 << (c - 1)) + 1
    abs_d, signs = _digits_jit(scalars, c)
    n_groups = num_windows // wg
    abs_g = abs_d.reshape(n_groups, wg, -1)
    sgn_g = signs.reshape(n_groups, wg, -1)
    buckets = _bucket_pipeline_staged(points_lm, abs_g, sgn_g, nbuck)
    per_window = _weighted_reduce_staged(buckets)
    return _horner_single_jit(per_window, c)


def _msm_multi_staged(points_lm, scalars_batch, S: int, c: int, wg: int):
    """Segment-batched MSM via staged per-shape programs (TPU path)."""
    m = scalars_batch.shape[1]
    num_windows = 256 // c
    SW = S * num_windows
    nbuck = (1 << (c - 1)) + 1
    abs_d, signs = _digits_jit(scalars_batch.reshape(S * m, -1), c)
    abs_d = jnp.moveaxis(abs_d.reshape(num_windows, S, m), 1, 0).reshape(SW, m)
    signs = jnp.moveaxis(signs.reshape(num_windows, S, m), 1, 0).reshape(SW, m)
    n_groups = SW // wg
    abs_g = abs_d.reshape(n_groups, wg, m)
    sgn_g = signs.reshape(n_groups, wg, m)
    buckets = _bucket_pipeline_staged(points_lm, abs_g, sgn_g, nbuck)
    per_window = _weighted_reduce_staged(buckets)
    per_window = tuple(v.reshape(-1, S, num_windows) for v in per_window)
    return _horner_multi_jit(per_window, c)


def msm_pippenger_multi(points, scalars_batch, c: int | None = None):
    """S same-size MSMs of one shared base in a single dispatch.

    ``points``: lanes-last Jacobian triple ((m, 24) arrays); ``scalars_batch``:
    canonical (S, m, 16) Fr limbs. Returns a lanes-last ((S, 24) arrays)
    Jacobian triple of the S results."""
    from ..curve.pallas_point import pallas_points_available

    S, m = scalars_batch.shape[:2]
    if c is None:
        c = pick_window_bits_multi(S, m)
    wg = _pick_window_group(m, S * (256 // c))
    pts_lm = lp.to_lm(points)
    if pallas_points_available():
        if S * m <= MULTI_LADDER_MAX:
            # small batched MSMs are compile-bound, not work-bound: the
            # bit-split ladder is ONE ~log2(m)-site program (cold compile
            # far under the ~250 s Pippenger monolith) and its 255*S*m tree
            # adds cost ~1-2 s at this scale
            from .bit_split import msm_bitsplit_multi_px

            out = msm_bitsplit_multi_px(pts_lm, scalars_batch)
        else:
            # ONE program: the axon compile service bills ~19 s per program
            # and caches nothing across processes, so a monolithic jit
            # (~250 s cold, sites amortized) beats staged per-stage
            # programs (measured 767 s)
            out = _msm_multi_impl(pts_lm, scalars_batch, S, c, wg)
    else:
        out = _msm_multi_impl.__wrapped__(pts_lm, scalars_batch, S, c, wg)
    return tuple(jnp.swapaxes(v, 0, 1) for v in out)


def msm_pippenger(points, scalars, c: int | None = None):
    """MSM over Jacobian limb points ((n, 24) lanes-last triple, the
    ``device.pack_points`` layout) and canonical (n, 16) Fr scalars; returns
    a single Jacobian point as a lanes-last ((24,) arrays) triple.

    ``c``: window bit-width (4, 8 or 16); picked by input size when None.
    """
    from ..curve.pallas_point import pallas_points_available

    n = scalars.shape[0]
    if c is None:
        c = pick_window_bits(n)
    pts_lm = lp.to_lm(points)
    wg = _pick_window_group(n, 256 // c)
    if pallas_points_available():
        # one monolithic program per (n, c): the axon compile service bills
        # ~19 s per program and caches nothing across processes, so a single
        # jit (~250 s cold, Pallas sites amortized) beats staged per-stage
        # programs (measured 767 s cold for the same MSM). The fixed-round
        # while_loop inside gives the data-adaptive round count with no
        # extra programs.
        return _msm_impl(pts_lm, scalars, c, wg)
    # CPU/test path: run eagerly so each point-op width compiles once (via
    # the jitted loop-CIOS fallbacks) instead of inlining ~12 call sites
    # into one giant XLA program
    return _msm_impl.__wrapped__(pts_lm, scalars, c, wg)


def msm_pippenger_host(affine_points, scalar_ints, c: int | None = None):
    """Host points/ints in, host affine point out (test convenience)."""
    pts = dc.pack_points(affine_points)
    sc = dc.pack_scalars(scalar_ints)
    out = msm_pippenger(pts, sc, c)
    return dc.unpack_points(tuple(t[None] for t in out))[0]
