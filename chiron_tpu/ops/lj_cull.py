"""Culled tile-pair fused LJ MD kernel (the N~4000 flagship engine).

The dense triangle kernel (ops/lj_dense.py) evaluates every (row-tile,
col-tile) pair; at N=4000 / rho*=0.8 only ~half of those tile pairs can
contain any in-cutoff particle pair.  This module adds the spatial hierarchy:

* particles are kept sorted by an ``(x-slab, y)`` key, so a tile of
  consecutive ranks occupies a thin x-slab and a compact y-window (z spans
  the box) -- the TPU-friendly cell-list analogue at a granularity the VPU
  likes (row tiles of TM ranks x col tiles of 128 lanes);
* per tile, a circular bounding box (center, half-extent per axis) is
  computed in XLA from offsets relative to the tile's first particle --
  exact whenever the tile extent < L/2, conservative otherwise;
* a tile-pair Verlet list keeps only (row, col) tiles with bbox min-image
  distance < cutoff + slack; it stays valid while every particle drifts
  less than slack/2 (the classic skin argument, applied at tile level);
* for listed pairs the x periodic image is resolved by folding both x
  vectors into a common per-pair frame (bbox centers + one constant
  image shift): exact whenever ``h_i + h_j + drift <= L/2 - cutoff`` on
  x, which the runner guarantees by slab sizing (and checks at every
  rebuild).  y/z keep per-pair minimum-image math -- ~4 VPU ops/pair
  saved on the axis the sort makes predictable;
* the whole BAOAB step (merged kicks, in-kernel splitmix32/Box-Muller
  noise, drift, wrap) fuses into the same Pallas call, S steps per launch:
  state resident in VMEM, zero XLA glue per step (same scheme and noise
  stream construction as ops/lj_md_fused.py).

Reference parity: this is the TPU-native replacement for the reference's
Verlet neighbor list + per-step Python loop (reference
chiron/neighbors.py:378-908, chiron/integrators.py:174-205); the jnp dense
path remains the semantic oracle (tests/test_lj_cull.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.2831853071795864

# above this (entries x capacity) element count the list builder switches
# from the one-hot-matmul placement to an XLA scatter (see build_tile_pairs)
_ONEHOT_LIMIT = 64 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Spatial sort + tile bboxes + tile-pair list (XLA host-of-kernel stage)
# ---------------------------------------------------------------------------


def slab_y_key(pos3: jnp.ndarray, n: int, nslab: int, L: float,
               Ly: float = None):
    """Monotone spatial sort key.

    ``nslab == 0``: pure x sort (best tile-pair culling at tm=tn=128 --
    thin x-slab tiles, the banded-kernel ordering).  ``nslab >= 1``:
    (x-slab index, y) lexicographic, with the slab separation scaled by
    the Y box length so keys from adjacent slabs can never interleave in
    a non-cubic box.  Padding columns get +inf-like sentinels so they
    stay at the end.
    """
    n_pad = pos3.shape[1]
    if nslab == 0:
        key = pos3[0]
    else:
        if Ly is None:
            Ly = L
        slab_w = L / nslab
        slab = jnp.clip(jnp.floor(pos3[0] / slab_w), 0, nslab - 1)
        key = slab * (2.0 * Ly) + pos3[1]
    return jnp.where(jnp.arange(n_pad) < n, key, jnp.float32(3.0e38))


def sort_by_key(key, pos3: jnp.ndarray, payloads: Tuple[jnp.ndarray, ...]):
    """Sort the (3, n_pad) layout (and payload rows) by ``key``."""
    operands = [key, pos3[0], pos3[1], pos3[2]] + list(payloads)
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    pos3_sorted = jnp.stack(sorted_ops[1:4])
    return pos3_sorted, tuple(sorted_ops[4:])


def tile_bboxes(pos3: jnp.ndarray, n: int, tile: int, box_diag: jnp.ndarray):
    """Circular per-tile bounding boxes: (centers, halves), each (3, n_tiles).

    Offsets are taken relative to the tile's first particle and min-imaged:
    exact when the tile's true extent < L/2 (always for culling purposes --
    a fatter tile folds to half-extent <= L/2, which only makes the bbox
    distance a smaller, still-valid lower bound).  Padding columns must
    carry a real particle's coordinates (the caller replicates column n-1).
    """
    n_pad = pos3.shape[1]
    n_tiles = n_pad // tile
    L = box_diag.reshape(3, 1, 1)
    p = pos3.reshape(3, n_tiles, tile)
    ref = p[:, :, :1]
    d = p - ref
    d = d - L * jnp.round(d / L)
    lo = jnp.min(d, axis=2)
    hi = jnp.max(d, axis=2)
    centers = ref[:, :, 0] + 0.5 * (lo + hi)
    halves = 0.5 * (hi - lo)
    return centers, halves


class TilePairList(NamedTuple):
    """Capacity-padded tile-pair Verlet list (all leaves device arrays).

    ``rowcx`` is the row tile's bbox x-center and ``ccx`` the col tile's
    x-center pre-shifted by the pair's periodic image: the kernel folds both
    x-coordinate vectors into this common frame (within L/2 of the center)
    and subtracts raw -- exact minimum-image x for every in-cutoff pair
    under the hsum_x bound (checked at every build).  y and z use per-pair
    minimum image (their tile extents are density-dependent and cannot be
    bounded a priori).

    Entries are sorted by (row tile, general-before-fast, col tile);
    ``ptr2`` holds the 2*nr+1 segment boundaries: row i's general entries
    live in [ptr2[2i], ptr2[2i+1]) (rank-overlap or padding-tile rects --
    they need the full ``col>row & col<n`` mask) and its fast entries in
    [ptr2[2i+1], ptr2[2i+2]) (cutoff mask only).

    rows/cols index tiles; ``rowcx`` is per ROW TILE (indexable by i).
    """

    rows: jnp.ndarray      # (1, capacity) int32 row-tile index (nr = pad)
    cols: jnp.ndarray      # (1, capacity) int32 col-tile index
    ccx: jnp.ndarray       # (1, capacity) f32 image-shifted col x-center
    ptr2: jnp.ndarray      # (1, 2*nr+1) int32 segment boundaries
    rowcx: jnp.ndarray     # (1, nr) f32 row bbox x-centers
    count: jnp.ndarray     # (1, 1) int32 live entries
    overflowed: jnp.ndarray  # () bool: capacity exceeded or shift bound broken


def build_tile_pairs(
    pos3: jnp.ndarray,
    n: int,
    tm: int,
    tn: int,
    box_diag: jnp.ndarray,
    cutoff: float,
    slack: float,
    capacity: int,
) -> TilePairList:
    """Build the tile-pair list + constant shifts from current positions.

    Keeps ordered rectangles (row tile i of TM ranks, col tile c of TN
    ranks) whose bbox min-image distance < cutoff + slack and that can hold
    a slot with col rank > row rank (the kernel's single-count mask).
    Entries appear row-major (grouped by row tile).
    """
    n_pad = pos3.shape[1]
    # pin padding columns to the last real particle so tile bboxes stay
    # tight no matter where integration drifted the pad slots
    pad_mask = jnp.arange(n_pad) < n
    pos3 = jnp.where(pad_mask, pos3, pos3[:, n - 1:n])
    nr, nc = n_pad // tm, n_pad // tn
    rcen, rhal = tile_bboxes(pos3, n, tm, box_diag)
    ccen, chal = tile_bboxes(pos3, n, tn, box_diag)
    L = box_diag.reshape(3, 1, 1)
    dc = rcen[:, :, None] - ccen[:, None, :]
    dc = dc - L * jnp.round(dc / L)
    hsum = rhal[:, :, None] + chal[:, None, :]
    dmin = jnp.maximum(0.0, jnp.abs(dc) - hsum)
    reach = cutoff + slack
    near = jnp.sum(dmin * dmin, axis=0) < reach * reach
    ri = jnp.arange(nr)[:, None]
    ci = jnp.arange(nc)[None, :]
    # a rectangle can contribute only if some col rank exceeds some row rank
    # and both tiles contain real particles
    useful = (
        (ci * tn + (tn - 1) > ri * tm)
        & (ri * tm < n)
        & (ci * tn < n)
    )
    keep = near & useful
    # image-shifted col x-centers: ccx' = ccx + Lx*round((rcx - ccx)/Lx)
    # brings the col frame within Lx/2 of the row frame; the kernel folds
    # raw x into these frames, making the x displacement exact minimum-
    # image for every in-cutoff pair (under the hsum_x bound below).  y/z
    # stay per-pair min-image in the kernel.
    dcx_raw = rcen[0][:, None] - ccen[0][None, :]
    Lx = box_diag[0]
    ccx_sh = ccen[0][None, :] + jnp.round(dcx_raw / Lx) * Lx
    # validity of the constant-frame convention for x: the runner sizes
    # slabs so this never trips for homogeneous systems; flag regardless
    bound_x = 0.5 * Lx - cutoff - slack
    shift_bad = jnp.any(keep & (hsum[0] > bound_x))

    # general rects need the full (col>row & col<n) mask: rank overlap
    # with the row tile, or rects touching the padding (tail) tiles
    last_real_col = (n - 1) // tn
    last_real_row = (n - 1) // tm
    general = (
        (ci * tn < ri * tm + tm)      # some col rank <= some row rank
        | (ci >= last_real_col)       # tail col tile holds padding slots
        | (ri >= last_real_row)       # tail row tile holds padding slots
    )

    # ---- ordered placement without sorts (sort/argsort/searchsorted cost
    # hundreds of us on TPU; cumsums + one one-hot matmul are ~free) ----
    kg = keep & general
    kf = keep & ~general
    gen_cnt = jnp.sum(kg, axis=1).astype(jnp.int32)            # (nr,)
    fast_cnt = jnp.sum(kf, axis=1).astype(jnp.int32)
    seg = jnp.stack([gen_cnt, fast_cnt], axis=1).reshape(-1)   # (2nr,)
    ptr2 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seg).astype(jnp.int32)]
    )
    total = ptr2[-1]
    # within-row, within-segment ranks (entries ordered by col index)
    gen_rank = jnp.cumsum(kg, axis=1).astype(jnp.int32) - 1
    fast_rank = jnp.cumsum(kf, axis=1).astype(jnp.int32) - 1
    base_gen = ptr2[0:2 * nr:2][:, None]
    base_fast = ptr2[1:2 * nr:2][:, None]
    slot = jnp.where(kg, base_gen + gen_rank, base_fast + fast_rank)
    slot = jnp.where(keep, slot, capacity)  # dropped entries -> no slot
    # ordered placement: one-hot matmul (MXU, ~free) while the (entries x
    # capacity) matrix stays small; XLA scatter beyond that -- at N=65k the
    # one-hot would be (131k x 13k) = 6.8 GB, while scatter is O(entries)
    use_scatter = nr * nc * capacity > _ONEHOT_LIMIT
    if use_scatter:
        sl = slot.reshape(-1)

        def place(vals_flat):
            return jnp.zeros((capacity,), jnp.float32).at[sl].set(
                vals_flat.astype(jnp.float32), mode="drop"
            )
    else:
        T = (
            slot.reshape(-1)[:, None] == jnp.arange(capacity)[None, :]
        ).astype(jnp.float32)

        def place(vals_flat):
            return jnp.dot(vals_flat.astype(jnp.float32), T,
                           preferred_element_type=jnp.float32)

    ci_flat = jnp.broadcast_to(ci, (nr, nc)).reshape(-1)
    ri_flat = jnp.broadcast_to(ri, (nr, nc)).reshape(-1)
    ccx_flat = jnp.broadcast_to(ccx_sh, (nr, nc)).reshape(-1)
    cols = jnp.round(place(ci_flat)).astype(jnp.int32)
    rows = jnp.round(place(ri_flat)).astype(jnp.int32)
    ccx = place(ccx_flat)
    rowcx = rcen[0].astype(jnp.float32)
    return TilePairList(
        rows=rows.reshape(1, -1),
        cols=cols.reshape(1, -1),
        ccx=ccx.reshape(1, -1),
        ptr2=jnp.minimum(ptr2, capacity).reshape(1, -1),
        rowcx=rowcx.reshape(1, -1),
        count=jnp.minimum(total, capacity).reshape(1, 1),
        overflowed=(total > capacity) | shift_bad,
    )


def tile_frame_scale_floor(pos3, n, tm, tn, box_diag, cutoff, slack):
    """Minimal admissible cumulative box-scale factor for the CURRENT
    tile layout's constant-x-frame convention (scalar f32).

    ``build_tile_pairs`` validates ``hsum_x <= 0.5*Lx - reach`` at build
    time, but under a cumulative isotropic NpT rescale by ``s`` both
    ``hsum_x`` and ``Lx`` scale by ``s`` while ``reach`` stays fixed, so
    the bound tightens:  ``s*hsum_x <= 0.5*s*Lx - reach``  <=>
    ``s >= reach / (0.5*Lx - hsum_x)``.  The culled NpT runner computes
    this floor at every rebuild and rejects volume proposals that would
    take the cumulative scale below it (runtime.py); without it an
    accepted shrink in the final segment of a ``run()`` could leave the
    x-fold non-minimum-image with nothing latching.

    Mirrors the kept-rect selection of :func:`build_tile_pairs` exactly;
    kept deliberately separate so the NVT build's jaxpr (and its
    persistent compile-cache entries) stay untouched.
    """
    n_pad = pos3.shape[1]
    pad_mask = jnp.arange(n_pad) < n
    pos3 = jnp.where(pad_mask, pos3, pos3[:, n - 1:n])
    nr, nc = n_pad // tm, n_pad // tn
    rcen, rhal = tile_bboxes(pos3, n, tm, box_diag)
    ccen, chal = tile_bboxes(pos3, n, tn, box_diag)
    L = box_diag.reshape(3, 1, 1)
    dc = rcen[:, :, None] - ccen[:, None, :]
    dc = dc - L * jnp.round(dc / L)
    hsum = rhal[:, :, None] + chal[:, None, :]
    dmin = jnp.maximum(0.0, jnp.abs(dc) - hsum)
    reach = cutoff + slack
    near = jnp.sum(dmin * dmin, axis=0) < reach * reach
    ri = jnp.arange(nr)[:, None]
    ci = jnp.arange(nc)[None, :]
    useful = (
        (ci * tn + (tn - 1) > ri * tm)
        & (ri * tm < n)
        & (ci * tn < n)
    )
    keep = near & useful
    hx_max = jnp.max(jnp.where(keep, hsum[0], 0.0))
    denom = 0.5 * box_diag[0] - hx_max
    # denom <= 0 means the layout is already frame-invalid (shift_bad has
    # latched at the build); +inf then rejects every shrink
    return jnp.where(
        denom > 0.0, reach / denom, jnp.float32(jnp.inf)
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _row_force_pass(x_ref, f_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
                    n, n_pad, tm, tn,
                    Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
                    inv_sigma, eps_scale, cutoff2_s, approx_recip,
                    unroll, mxu_reduce=False, prefetch=False, e_ref=None,
                    exact_energy=False):
    """Row-grouped culled force pass: for each row tile, the row coordinate
    vectors are loaded/canonicalized once and the row accumulator carried
    across that row's list entries (single row RMW at the end); each entry
    RMWs only the col force slice.  General entries (rank overlap/padding)
    run a specialized inner loop with the full mask; fast entries use the
    cutoff mask alone.

    Per-pair math runs in sigma-prescaled coordinates (x/sigma): the
    (sigma^2/r^2) factor becomes the raw reciprocal, saving one
    (tm, tn)-shaped multiply per pair; the per-axis prescale multiplies are
    (tm, 1)/(1, tn)-shaped and amortize away.  y/z minimum image uses
    trunc(2d/L) instead of floor(d/L + 1/2) -- one fewer vector op per
    axis, valid because wrapped per-pair displacements lie in (-L, L)."""
    nr = n_pad // tm
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    Lys = Ly * inv_sigma
    Lzs = Lz * inv_sigma
    two_inv_Lys = 2.0 * inv_Ly * (1.0 / inv_sigma)
    two_inv_Lzs = 2.0 * inv_Lz * (1.0 / inv_sigma)
    ones_row = jnp.ones((1, tm), jnp.float32)
    ones_col = jnp.ones((tn, 1), jnp.float32)

    def _sum0(t):
        # (tm, tn) -> (1, tn): on the MXU when requested (it idles under
        # this VPU-bound kernel, so the reduction overlaps the pair math)
        if mxu_reduce:
            return jax.lax.dot_general(
                ones_row, t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(t, axis=0, keepdims=True)

    def _sum1(t):
        # (tm, tn) -> (tm, 1)
        if mxu_reduce:
            return jax.lax.dot_general(
                t, ones_col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(t, axis=1, keepdims=True)

    def row_body(i, _):
        row0 = pl.multiple_of(i * tm, tm)
        rcx = rowcx_ref[0, i]
        ri3 = x_ref[:, pl.ds(row0, tm)]          # ONE (3, tm) slice
        xi = ri3[0].reshape(tm, 1)
        yi = ri3[1].reshape(tm, 1)
        zi = ri3[2].reshape(tm, 1)
        # canonicalize row x into the row frame, prescale (per-row,
        # amortized)
        xi = (xi - Lx * jnp.floor((xi - rcx) * inv_Lx + 0.5)) * inv_sigma
        yi = yi * inv_sigma
        zi = zi * inv_sigma
        rid = row0 + iota_r

        def load_col(k):
            """Load + canonicalize one entry's (3, tn) col slice.

            Factored out of the pair math so the prefetch path can issue
            the NEXT group's loads while the current group computes (the
            load->use dependency otherwise serializes each entry behind
            its VMEM dynamic-slice latency)."""
            c = cols_ref[0, k]
            col0 = pl.multiple_of(c * tn, tn)
            ccx = ccx_ref[0, k]
            cj3 = x_ref[:, pl.ds(col0, tn)]  # ONE (3, tn) slice
            xj = cj3[0].reshape(1, tn)
            yj = cj3[1].reshape(1, tn)
            zj = cj3[2].reshape(1, tn)
            xj = (
                xj - Lx * jnp.floor((xj - ccx) * inv_Lx + 0.5)
            ) * inv_sigma
            return col0, xj, yj, zj

        def make_inner(general: bool):
            def compute(col0, xj, yj, zj, acc):
                if e_ref is None:
                    fx, fy, fz = acc
                else:
                    fx, fy, fz, ea = acc
                col0 = pl.multiple_of(col0, tn)
                # x via the common frame; y/z per-pair minimum image
                dx = xi - xj
                dy = yi - yj * inv_sigma
                dy = dy - Lys * jnp.trunc(dy * two_inv_Lys)
                dz = zi - zj * inv_sigma
                dz = dz - Lzs * jnp.trunc(dz * two_inv_Lzs)
                r2 = dx * dx + dy * dy + dz * dz
                m = r2 < cutoff2_s
                if general:
                    cid = col0 + iota_c
                    m = m & (cid > rid) & (cid < n)
                if general:
                    # self-pairs sit at r2 == 0: clamp before the
                    # reciprocal (they are masked, but inf*0 would NaN)
                    r2s = jnp.maximum(r2, 1e-4)
                else:
                    # fast rects hold no self-pairs; a genuinely
                    # coincident pair would produce inf/NaN forces and
                    # trip the runner's NaN latch, which is the correct
                    # outcome for a collapsed configuration
                    r2s = r2
                if approx_recip:
                    inv = pl.reciprocal(r2s, approx=True)
                else:
                    # f32-exact reciprocal at near-approx cost: Newton
                    # steps square the fast reciprocal's relative error
                    # (~6e-5 on TPU, ~6e-3 in interpret mode), so two
                    # steps land below the f32 ulp from either seed --
                    # the result matches the rounded true reciprocal
                    # within 1 ulp at 4 extra ops instead of the VPU's
                    # long-latency divide
                    inv = pl.reciprocal(r2s, approx=True)
                    inv = inv * (2.0 - r2s * inv)
                    inv = inv * (2.0 - r2s * inv)
                i6 = inv * inv * inv
                # coef = (2 i6^2 - i6) inv, factored as (i6 - 1/2) i6 inv
                # (one fewer multiply); the 2x lives in eps_scale, applied
                # once per pass on the result together with 24*eps/sigma
                coef = jnp.where(m, (i6 - 0.5) * i6 * inv, 0.0)
                tx = coef * dx
                ty = coef * dy
                tz = coef * dz
                # single fused reaction RMW on the (3, tn) col slice
                re3 = jnp.concatenate(
                    [_sum0(tx), _sum0(ty), _sum0(tz)], axis=0,
                )
                f_ref[:, pl.ds(col0, tn)] = f_ref[:, pl.ds(col0, tn)] - re3
                fx = fx + _sum1(tx)
                fy = fy + _sum1(ty)
                fz = fz + _sum1(tz)
                if e_ref is None:
                    return fx, fy, fz
                # pair energy 4 eps (s12 - s6) = 4 eps i6 (i6 - 1);
                # accumulate the raw i6 (i6 - 1) sum, scaled once at the
                # end of the pass (each ordered pair appears exactly once
                # across the whole list, so this is the full potential)
                if exact_energy and approx_recip:
                    # forces keep the fast reciprocal, but the energy
                    # feeds a Metropolis ratio (NpT carried-U): refine to
                    # the f32-exact reciprocal for the energy term only
                    inv_e = inv * (2.0 - r2s * inv)
                    inv_e = inv_e * (2.0 - r2s * inv_e)
                    i6_e = inv_e * inv_e * inv_e
                else:
                    i6_e = i6
                ea = ea + _sum1(jnp.where(m, (i6_e - 1.0) * i6_e, 0.0))
                return fx, fy, fz, ea

            def inner(k, acc):
                return compute(*load_col(k), acc)

            return inner, compute

        z = jnp.zeros((tm, 1), jnp.float32)
        g0 = ptr2_ref[0, 2 * i]
        g1 = ptr2_ref[0, 2 * i + 1]
        g2 = ptr2_ref[0, 2 * i + 2]
        inner_gen = make_inner(True)[0]
        acc0 = (z, z, z) if e_ref is None else (z, z, z, z)
        acc = jax.lax.fori_loop(g0, g1, inner_gen, acc0)
        # fast segment: several entries per iteration cuts loop overhead
        # and multiplies the independent instruction streams in flight;
        # the remainder runs in a plain tail loop (no null-entry padding:
        # a padded entry would cost a FULL masked tile visit)
        inner_fast, compute_fast = make_inner(False)
        n_fast = g2 - g1
        n_grp = n_fast // unroll
        g_tail = g1 + n_grp * unroll

        if prefetch:
            # software pipeline at group granularity: iteration k2 computes
            # the group loaded by iteration k2-1 (or the prologue) while
            # issuing the NEXT group's col-slice loads -- the loads carry
            # no dependency on the current group's math, so the scheduler
            # can overlap them instead of stalling each entry behind its
            # dynamic-slice latency.  Out-of-range indices clamp to the
            # last fast entry (any live list slot is safe to read; the
            # clamped group is never computed).
            def load_grp(base):
                # upper clamp floored at g0 so a degenerate empty segment
                # (g0 == g2 == 0) can never index below g0 (ADVICE r3)
                hi = jnp.maximum(g2 - 1, g0)
                return tuple(
                    load_col(jnp.clip(base + u, g0, hi))
                    for u in range(unroll)
                )

            def inner_u_pf(k2, carry):
                acc, pre = carry
                nxt = load_grp(g1 + (k2 + 1) * unroll)
                for u in range(unroll):
                    acc = compute_fast(*pre[u], acc)
                return acc, nxt

            acc = jax.lax.fori_loop(
                0, n_grp, inner_u_pf, (acc, load_grp(g1))
            )[0]
        else:
            def inner_u(k2, acc):
                for u in range(unroll):
                    acc = inner_fast(g1 + unroll * k2 + u, acc)
                return acc

            acc = jax.lax.fori_loop(0, n_grp, inner_u, acc)
        acc = jax.lax.fori_loop(g_tail, g2, inner_fast, acc)
        if e_ref is None:
            fx, fy, fz = acc
        else:
            fx, fy, fz, ea = acc
            e_ref[0, 0] = e_ref[0, 0] + jnp.sum(ea)
        fi3 = jnp.concatenate(
            [fx.reshape(1, tm), fy.reshape(1, tm), fz.reshape(1, tm)],
            axis=0,
        )
        f_ref[:, pl.ds(row0, tm)] = f_ref[:, pl.ds(row0, tm)] + fi3
        return _

    jax.lax.fori_loop(0, nr, row_body, 0)
    f_ref[...] = eps_scale * f_ref[...]


def _baoab_phase(x_ref, v_ref, f_ref, minv_ref, sigv_ref, seed_ref,
                 off_ref, s, n_pad, dt, a_coef, b_coef,
                 Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz):
    """In-kernel BAOAB step: merged kick, counter-based O-noise, drifts,
    periodic wrap.  Writes the advanced (x, v) back and zeroes ``f_ref``
    for the force pass that follows.  Shared verbatim by the classic MD
    kernel and the megakernel (``ops/lj_mega.py``) so the noise stream
    and step semantics can never diverge between them.
    """
    x = x_ref[...]
    v = v_ref[...]
    F = f_ref[...]
    v = v + dt * F * minv_ref[...]
    x = x + (dt * 0.5) * v
    # Both Box-Muller outputs are used (r cos, r sin are INDEPENDENT
    # standard normals from one uniform pair), so the splitmix32
    # counters, log and sqrt run on HALF the lanes: the first
    # n_pad/2 lanes of each row take the cos branch, the second half
    # the sin branch.  Same counter space as the one-output scheme
    # (lane ids over (3, n_pad/2)); the jnp step oracle in
    # tests/test_lj_cull.py mirrors this stream exactly.
    half = n_pad // 2
    lane = (
        jax.lax.broadcasted_iota(jnp.uint32, (3, half), 0)
        * jnp.uint32(half)
        + jax.lax.broadcasted_iota(jnp.uint32, (3, half), 1)
    )
    step = jnp.uint32(s) + off_ref[0, 0].astype(jnp.uint32)
    base = (
        seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + step * jnp.uint32(0x85EBCA6B)
    )

    def mix(z):
        z = z ^ (z >> 16)
        z = z * jnp.uint32(0x85EBCA6B)
        z = z ^ (z >> 13)
        z = z * jnp.uint32(0xC2B2AE35)
        z = z ^ (z >> 16)
        return z

    c1 = (lane * jnp.uint32(2)) * jnp.uint32(0x9E3779B9) + base
    c2 = (lane * jnp.uint32(2) + jnp.uint32(1)) * jnp.uint32(
        0x9E3779B9
    ) + base
    u1 = (
        (mix(c1) >> 8).astype(jnp.int32).astype(jnp.float32)
        * (1.0 / 16777216.0)
    )
    u2 = (
        (mix(c2) >> 8).astype(jnp.int32).astype(jnp.float32)
        * (1.0 / 16777216.0)
    )
    u1 = jnp.maximum(u1, 1e-7)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    noise = jnp.concatenate(
        [r * jnp.cos(theta), r * jnp.sin(theta)], axis=1
    )
    v = a_coef * v + b_coef * sigv_ref[...] * noise
    x = x + (dt * 0.5) * v
    # wrap with (3, 1) per-axis constants (broadcast beats materializing
    # three full (1, n_pad) rows) and a multiply instead of the divide
    Lcol = jnp.concatenate(
        [jnp.full((1, 1), Lx), jnp.full((1, 1), Ly),
         jnp.full((1, 1), Lz)], axis=0
    )
    inv_Lcol = jnp.concatenate(
        [jnp.full((1, 1), inv_Lx), jnp.full((1, 1), inv_Ly),
         jnp.full((1, 1), inv_Lz)], axis=0
    )
    x = x - jnp.floor(x * inv_Lcol) * Lcol
    x_ref[...] = x
    v_ref[...] = v
    f_ref[...] = jnp.zeros((3, n_pad), jnp.float32)


def _tile_skin_drift_bad(x_ref, anchor_ref, n, n_pad, slack,
                         Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz):
    """Tile-skin invariant: returns the boolean latch condition -- the
    top-2 joint min-image drift from the segment anchor exceeds
    ``slack``, or any live coordinate is non-finite.  Shared by the
    classic MD kernel and the megakernel (callers decide how the result
    combines with their flag register).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    valid = lane < n
    d2 = jnp.zeros((1, n_pad), jnp.float32)
    finite_ok = jnp.float32(1.0)
    for ax, (L, invL) in enumerate(
        ((Lx, inv_Lx), (Ly, inv_Ly), (Lz, inv_Lz))
    ):
        dxa = (x_ref[ax, :] - anchor_ref[ax, :]).reshape(1, n_pad)
        dxa = dxa - L * jnp.floor(dxa * invL + 0.5)
        d2 = d2 + dxa * dxa
        xa = jnp.where(valid, x_ref[ax, :].reshape(1, n_pad), 0.0)
        # NaN fails the comparison too (NaN < y is False)
        finite_ok = finite_ok * jnp.where(
            jnp.all(jnp.abs(xa) < jnp.float32(3.0e38)), 1.0, 0.0,
        )
    d = jnp.sqrt(jnp.where(valid, d2, 0.0))
    m1 = jnp.max(d)
    others = jnp.where(d == m1, jnp.float32(-1.0), d)
    m2 = jnp.maximum(jnp.max(others), 0.0)
    # two lanes tied at the max -> the second drift IS m1
    tied = jnp.sum(jnp.where(d == m1, 1.0, 0.0)) > 1.5
    top2 = m1 + jnp.where(tied, m1, m2)
    return (top2 > slack) | (finite_ok < 0.5)


def _make_force_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                       approx_recip, unroll, mxu_reduce=False,
                       prefetch=False):
    inv_sigma = 1.0 / sigma
    eps_scale = 48.0 * epsilon / sigma  # 2x from the factored coef
    cutoff2_s = (cutoff / sigma) ** 2

    def kernel(box_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
               pos_ref, force_ref):
        force_ref[...] = jnp.zeros((3, n_pad), jnp.float32)
        Lx, Ly, Lz = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
        _row_force_pass(
            pos_ref, force_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
            n, n_pad, tm, tn,
            Lx, 1.0 / Lx, Ly, 1.0 / Ly, Lz, 1.0 / Lz,
            inv_sigma, eps_scale, cutoff2_s, approx_recip, unroll,
            mxu_reduce, prefetch,
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "tm", "tn", "sigma", "epsilon", "cutoff",
                     "approx_recip", "interpret", "unroll", "mxu_reduce",
                     "prefetch"),
)
def culled_force_raw(pos3, box_diag, pairs: TilePairList, n: int, tm: int,
                     tn: int, sigma: float, epsilon: float, cutoff: float,
                     approx_recip: bool, interpret: bool, unroll: int = 2,
                     mxu_reduce: bool = False, prefetch: bool = False):
    """Standalone culled force (oracle-parity surface; the fused MD kernel
    below is the production path).

    Positions must be wrapped into [0, L) per axis: the trunc-based y/z
    minimum image is exact only for displacements in (-L, L).  The fused
    MD path wraps every step; callers of this standalone surface own the
    precondition (wrap with ``x - L*floor(x/L)`` first if unsure)."""
    n_pad = pos3.shape[1]
    capacity = pairs.cols.shape[1]
    nr = n_pad // tm
    kernel = _make_force_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                                approx_recip, unroll, mxu_reduce, prefetch)
    smem = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[
            smem((1, 3)),
            smem((1, capacity)),      # cols
            smem((1, capacity)),      # ccx
            smem((1, 2 * nr + 1)),    # ptr2
            smem((1, nr)),            # rowcx
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(box_diag.reshape(1, 3), pairs.cols, pairs.ccx, pairs.ptr2,
      pairs.rowcx, pos3)


def _make_force_energy_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                              approx_recip, unroll, prefetch=False):
    inv_sigma = 1.0 / sigma
    eps_scale = 48.0 * epsilon / sigma  # 2x from the factored coef
    e_scale = 4.0 * epsilon
    cutoff2_s = (cutoff / sigma) ** 2

    def kernel(box_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
               pos_ref, force_ref, e_ref):
        force_ref[...] = jnp.zeros((3, n_pad), jnp.float32)
        e_ref[0, 0] = 0.0
        Lx, Ly, Lz = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
        _row_force_pass(
            pos_ref, force_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
            n, n_pad, tm, tn,
            Lx, 1.0 / Lx, Ly, 1.0 / Ly, Lz, 1.0 / Lz,
            inv_sigma, eps_scale, cutoff2_s, approx_recip, unroll,
            False, prefetch, e_ref=e_ref,
        )
        e_ref[0, 0] = e_scale * e_ref[0, 0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "tm", "tn", "sigma", "epsilon", "cutoff",
                     "approx_recip", "interpret", "unroll", "prefetch"),
)
def culled_force_energy_raw(pos3, box_diag, pairs: TilePairList, n: int,
                            tm: int, tn: int, sigma: float, epsilon: float,
                            cutoff: float, approx_recip: bool,
                            interpret: bool, unroll: int = 2,
                            prefetch: bool = False):
    """Culled force AND total potential energy in one pass.

    Each ordered tile-pair entry is visited once, so the accumulated pair
    energy is the full truncated-LJ potential (same convention as the
    dense kernel's energy; oracle-parity test in tests/test_lj_cull.py).
    Used by the culled NpT runner's barostat (chiron_tpu/runtime.py).
    Positions must be wrapped into [0, L) (the fused MD path wraps every
    step; the standalone surface inherits that precondition)."""
    n_pad = pos3.shape[1]
    capacity = pairs.cols.shape[1]
    nr = n_pad // tm
    kernel = _make_force_energy_kernel(n, n_pad, tm, tn, sigma, epsilon,
                                       cutoff, approx_recip, unroll,
                                       prefetch)
    smem = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    F, e = pl.pallas_call(
        kernel,
        in_specs=[
            smem((1, 3)),
            smem((1, capacity)),      # cols
            smem((1, capacity)),      # ccx
            smem((1, 2 * nr + 1)),    # ptr2
            smem((1, nr)),            # rowcx
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            smem((1, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(box_diag.reshape(1, 3), pairs.cols, pairs.ccx, pairs.ptr2,
      pairs.rowcx, pos3)
    return F, e[0, 0]


def _make_md_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                    dt, a_coef, b_coef, approx_recip, unroll,
                    mxu_reduce=False, prefetch=False, n_steps=None,
                    slack=None, final_energy=False, anchor_input=False):
    inv_sigma = 1.0 / sigma
    eps_scale = 48.0 * epsilon / sigma  # 2x from the factored coef
    e_scale = 4.0 * epsilon
    cutoff2_s = (cutoff / sigma) ** 2
    check_drift = slack is not None or anchor_input

    def kernel(box_ref, seed_ref, off_ref, cols_ref, ccx_ref, ptr2_ref,
               rowcx_ref, minv_ref, sigv_ref,
               x_in, v_in, f_in, *rest):
        rest = list(rest)
        # anchor-input mode (NpT): the rebuild anchor and the remaining
        # drift budget (slack - consumed volume-scaling slack) arrive as
        # DATA, so one compiled program serves every sub-segment and the
        # budget shrinks as the barostat accepts moves.
        anchor_in = rest.pop(0) if anchor_input else None
        budget_ref = rest.pop(0) if anchor_input else None
        x_ref, v_ref, f_ref = rest.pop(0), rest.pop(0), rest.pop(0)
        flag_ref = rest.pop(0) if check_drift else None
        e_ref = rest.pop(0) if final_energy else None
        anchor_ref = (
            anchor_in if anchor_input
            else (rest.pop(0) if check_drift else None)
        )
        s = pl.program_id(0)
        Lx = box_ref[0, 0]
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]
        inv_Lx, inv_Ly, inv_Lz = 1.0 / Lx, 1.0 / Ly, 1.0 / Lz

        @pl.when(s == 0)
        def _seed_state():
            # output VMEM blocks are not pre-filled from aliased inputs on
            # hardware; copy once (same scheme as ops/lj_md_fused.py)
            x_ref[...] = x_in[...]
            v_ref[...] = v_in[...]
            f_ref[...] = f_in[...]
            if check_drift:
                if not anchor_input:
                    # segment anchor: the (sorted) entry positions the
                    # live tile-pair list was built from
                    anchor_ref[...] = x_in[...]
                flag_ref[0, 0] = 0.0

        # ---- BAOAB phase: merged kick, O-noise, drifts, wrap ----
        _baoab_phase(
            x_ref, v_ref, f_ref, minv_ref, sigv_ref, seed_ref, off_ref,
            s, n_pad, dt, a_coef, b_coef,
            Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
        )

        # ---- culled tile-pair force pass ----
        if final_energy:
            # the LAST step's pass additionally accumulates the total
            # potential with the exact reciprocal (carried-U for the NpT
            # barostat: saves one standalone culled pass per attempt);
            # earlier steps run the plain force pass
            @pl.when(s != n_steps - 1)
            def _force_only():
                _row_force_pass(
                    x_ref, f_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
                    n, n_pad, tm, tn,
                    Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
                    inv_sigma, eps_scale, cutoff2_s, approx_recip, unroll,
                    mxu_reduce, prefetch,
                )

            @pl.when(s == n_steps - 1)
            def _force_energy():
                e_ref[0, 0] = 0.0
                _row_force_pass(
                    x_ref, f_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
                    n, n_pad, tm, tn,
                    Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
                    inv_sigma, eps_scale, cutoff2_s, approx_recip, unroll,
                    mxu_reduce, prefetch, e_ref=e_ref, exact_energy=True,
                )
                e_ref[0, 0] = e_scale * e_ref[0, 0]
        else:
            _row_force_pass(
                x_ref, f_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
                n, n_pad, tm, tn,
                Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
                inv_sigma, eps_scale, cutoff2_s, approx_recip, unroll,
                mxu_reduce, prefetch,
            )

        if check_drift:
            # ---- in-kernel tile-skin invariant (replaces the runner's
            # XLA drift check, which measured 145 us/segment of small-
            # fusion launches -- 2.9 us/step at S=50) ----
            @pl.when(s == n_steps - 1)
            def _drift_check():
                thresh = (
                    budget_ref[0, 0] if anchor_input else slack
                )
                bad = _tile_skin_drift_bad(
                    x_ref, anchor_ref, n, n_pad, thresh,
                    Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
                )
                flag_ref[0, 0] = jnp.where(bad, 1.0, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_steps", "tm", "tn", "sigma", "epsilon",
                     "cutoff", "dt", "a_coef", "b_coef", "approx_recip",
                     "interpret", "unroll", "mxu_reduce", "prefetch",
                     "slack", "final_energy"),
)
def culled_md_raw(x3, v3, f3, box_diag, seed, step_offset, pairs: TilePairList,
                  minv, sigv, n: int, n_steps: int, tm: int, tn: int,
                  sigma: float, epsilon: float, cutoff: float, dt: float,
                  a_coef: float, b_coef: float, approx_recip: bool,
                  interpret: bool, unroll: int = 2, mxu_reduce: bool = False,
                  prefetch: bool = False, slack: float = None,
                  final_energy: bool = False, anchor3=None, budget=None):
    """S-step fused BAOAB+force segment.

    With ``slack`` set, the kernel also evaluates the tile-skin
    invariant in its final grid step (top-2 joint drift from the entry
    positions vs ``slack``, plus a non-finiteness latch) and returns an
    extra output: a (1, 1) f32 flag (>0.5 means the pair list may have
    gone stale).  This replaces the runner's XLA drift check, whose
    small-fusion launches measured 145 us/segment on hardware.

    With ``anchor3``/``budget`` (the NpT mode), the drift anchor and the
    threshold arrive as DATA instead: ``anchor3`` is the (3, n_pad)
    rebuild-time configuration (rescaled alongside accepted volume
    moves) and ``budget`` the remaining slack after the accepted
    scalings' consumption -- so the in-kernel check spans barostat
    sub-segments exactly like the runner's former XLA end-of-segment
    check, while every sub-segment shares ONE compiled program.

    With ``final_energy`` the last step's force pass also accumulates
    the total truncated-LJ potential of the FINAL configuration with the
    exact (Newton-refined) reciprocal, appended as another (1, 1)
    output -- the NpT runner's carried U (one fewer standalone culled
    pass per barostat attempt, ADVICE r3).
    """
    n_pad = x3.shape[1]
    capacity = pairs.rows.shape[1]
    anchor_input = anchor3 is not None
    check_drift = slack is not None or anchor_input
    kernel = _make_md_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                             dt, a_coef, b_coef, approx_recip, unroll,
                             mxu_reduce, prefetch, n_steps=n_steps,
                             slack=slack, final_energy=final_energy,
                             anchor_input=anchor_input)
    full = lambda s: (0, 0)
    smem = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.VMEM)
    in_specs = [
        smem((1, 3)),            # box
        smem((1, 1)),            # seed
        smem((1, 1)),            # step offset
        smem((1, capacity)),     # cols
        smem((1, capacity)),     # ccx (image-shifted)
        smem((1, 2 * (n_pad // tm) + 1)),  # ptr2
        smem((1, n_pad // tm)),  # rowcx
        vmem((1, n_pad)),        # 1/m
        vmem((1, n_pad)),        # sigma_v
        vmem((3, n_pad)),        # x
        vmem((3, n_pad)),        # v (half-kick convention)
        vmem((3, n_pad)),        # F
    ]
    inputs = [box_diag.reshape(1, 3), seed, step_offset, pairs.cols,
              pairs.ccx, pairs.ptr2, pairs.rowcx, minv, sigv, x3, v3, f3]
    if anchor_input:
        in_specs.append(vmem((3, n_pad)))   # drift anchor
        in_specs.append(smem((1, 1)))       # remaining drift budget
        inputs.append(anchor3)
        inputs.append(jnp.asarray(budget, jnp.float32).reshape(1, 1))
    out_specs = [vmem((3, n_pad)), vmem((3, n_pad)), vmem((3, n_pad))]
    out_shape = [
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
    ]
    scratch = []
    if check_drift:
        out_specs.append(smem((1, 1)))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    if final_energy:
        out_specs.append(smem((1, 1)))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    if check_drift and not anchor_input:
        scratch.append(pltpu.VMEM((3, n_pad), jnp.float32))
    alias_base = 9  # x3's position in `inputs`
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={alias_base: 0, alias_base + 1: 1,
                              alias_base + 2: 2},
        interpret=interpret,
    )(*inputs)
    return outs


class CulledLJMD:
    """S-step fused BAOAB segments on the culled tile-pair LJ kernel.

    Same half-kick (w = v - dt/2 F/m) convention and noise-stream scheme as
    ops/lj_md_fused.FusedLJMD; the caller owns sorting and list rebuilds
    (chiron_tpu.runtime.make_culled_lj_runner wires the full loop).
    """

    def __init__(self, n, sigma, epsilon, cutoff, masses_lane, dt, gamma, kT,
                 tm: int = 128, tn: int = 128, nslab: int = None,
                 slack: float = 0.2, n_pad: int = None, interpret=None,
                 unroll: int = 4, mxu_reduce: bool = False,
                 prefetch: bool = False):
        self.n = n
        self.sigma, self.epsilon, self.cutoff = (
            float(sigma), float(epsilon), float(cutoff)
        )
        self.dt = float(dt)
        self.a = float(jnp.exp(-gamma * dt))
        self.b = float(jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt)))
        self.kT = float(kT)
        self.slack = float(slack)
        self.unroll = int(unroll)
        self.mxu_reduce = bool(mxu_reduce)
        self.prefetch = bool(prefetch)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        if not interpret:
            # Mosaic requires dynamic lane-dim slices at 128-multiples
            tn = max(tn, 128)
            tm = max(tm, 128)
        self.tm, self.tn = tm, tn
        self.n_pad = _round_up(
            n_pad if n_pad is not None else n, math.lcm(tm, tn)
        )
        self.nslab = nslab  # resolved by the runner from the box
        m = jnp.asarray(masses_lane, dtype=jnp.float32).reshape(1, -1)
        if m.shape[1] != self.n_pad:
            mm = jnp.ones((1, self.n_pad), jnp.float32)
            m = mm.at[0, :m.shape[1]].set(m[0])
        self.minv = 1.0 / m
        self.sigv = jnp.sqrt(self.kT / m)

    def build_pairs(self, pos3, box_diag, capacity: int) -> TilePairList:
        return build_tile_pairs(
            pos3, self.n, self.tm, self.tn, box_diag, self.cutoff,
            self.slack, capacity,
        )

    def force(self, pos3, box_diag, pairs: TilePairList,
              approx_recip: bool = True):
        """Culled force of ``pos3`` (WRAPPED positions in [0, L) -- see
        culled_force_raw's precondition) under the given pair list."""
        return culled_force_raw(
            pos3, box_diag, pairs, self.n, self.tm, self.tn, self.sigma,
            self.epsilon, self.cutoff, approx_recip, self.interpret,
            unroll=self.unroll, mxu_reduce=self.mxu_reduce,
            prefetch=self.prefetch,
        )

    def force_energy(self, pos3, box_diag, pairs: TilePairList,
                     approx_recip: bool = False):
        """Force and total truncated-LJ potential in one culled pass
        (exact reciprocal by default: the energy feeds Metropolis
        acceptance ratios in the NpT runner)."""
        return culled_force_energy_raw(
            pos3, box_diag, pairs, self.n, self.tm, self.tn, self.sigma,
            self.epsilon, self.cutoff, approx_recip, self.interpret,
            unroll=self.unroll, prefetch=self.prefetch,
        )

    def energy_differentiable(self, pos3, box_diag, pairs: TilePairList):
        """Total truncated-LJ energy over the tile-pair list as a
        DIFFERENTIABLE function of positions: ``jax.grad`` of this is
        exactly the negative of the kernel's analytic culled force (the
        CLAUDE.md ``grad(energy) == -force`` invariant on the flagship
        path, not just the dense one -- VERDICT r3 item 5; reference
        chiron/potential.py:21-24 establishes the grad-force contract).

        Implemented as a ``jax.custom_vjp`` over one fused
        force+energy pass with the exact (Newton-refined) reciprocal, so
        the gradient costs nothing beyond the forward pass.  The pair
        list is treated as constant data (no gradient into the spatial
        hierarchy -- it is a piecewise-constant function of positions
        with zero derivative wherever it is valid)."""
        from .diff import energy_with_force_gradient

        return energy_with_force_gradient(
            lambda p: self.force_energy(p, box_diag, pairs,
                                        approx_recip=False),
            pos3,
        )

    def run_segment(self, x3, v3, f3, box_diag, pairs: TilePairList,
                    seed, step_offset, n_steps: int,
                    approx_recip: bool = True, drift_slack: float = None,
                    final_energy: bool = False, drift_anchor=None,
                    drift_budget=None):
        """Advance ``n_steps`` with a fixed pair list; standard (x, v, F)
        convention at both ends (half-kick conversion inside).

        With ``drift_slack`` the kernel also evaluates the tile-skin
        invariant in its final grid step and an extra return value (a
        scalar bool: stale/non-finite) is appended.  Alternatively
        ``drift_anchor``/``drift_budget`` supply the anchor and the
        threshold as DATA (the NpT mode: anchor = rescaled rebuild
        configuration, budget = slack minus consumed volume-scaling
        slack -- see culled_md_raw).  With ``final_energy`` the
        exact-reciprocal potential of the final configuration is
        appended as a further scalar."""
        w_in = v3 - (0.5 * self.dt) * f3 * self.minv
        outs = culled_md_raw(
            x3, w_in, f3, box_diag,
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            jnp.asarray(step_offset, jnp.int32).reshape(1, 1),
            pairs, self.minv, self.sigv,
            self.n, n_steps, self.tm, self.tn, self.sigma, self.epsilon,
            self.cutoff, self.dt, self.a, self.b, approx_recip,
            self.interpret, unroll=self.unroll, mxu_reduce=self.mxu_reduce,
            prefetch=self.prefetch, slack=drift_slack,
            final_energy=final_energy, anchor3=drift_anchor,
            budget=drift_budget,
        )
        x3, w_out, f_out = outs[0:3]
        v_std = w_out + (0.5 * self.dt) * f_out * self.minv
        ret = [x3, v_std, f_out]
        k = 3
        if drift_slack is not None or drift_anchor is not None:
            ret.append(outs[k][0, 0] > 0.5)
            k += 1
        if final_energy:
            ret.append(outs[k][0, 0])
        return tuple(ret)
