"""Fused in-kernel spatial sort + tile-pair list build (one Pallas call).

The culled runner's per-segment rebuild costs ~565 us as XLA ops on TPU:
``jax.lax.sort`` of the 10-operand MD state is ~290 us (a multi-kernel
bitonic emitted by XLA) and the ~50 small fusions of the jnp list builder
are another ~280 us of kernel-launch overhead at ~9 us each -- together
~11 us/step at 50-step segments, second only to the force pass itself
(BENCH.md).  This module replaces BOTH with ONE Pallas kernel:

* a fully-unrolled bitonic network over the (R, 128) register layout of
  the particle axis, with XOR-partner exchange built from two
  ``pltpu.roll`` ops per operand per stage (lane rolls for distances
  < 128, sublane rolls above) -- the key and all 9 payload rows
  (x, v, F) move through the network together;
* the tile bbox / near-matrix / segment-pointer math of
  ``build_tile_pairs`` re-expressed on (nr, nc)-shaped registers, with
  every cumulative sum and the entry placement as triangular / one-hot
  matmuls on the (otherwise idle) MXU;
* outputs exactly match ``sort_by_key`` + ``build_tile_pairs`` (ties in
  the sort key aside -- bitonic and XLA's sort may permute equal keys
  differently, which only relabels identical particles).

Requires a power-of-two ``n_pad`` and tile sizes that are multiples of
128; the runner falls back to the XLA path otherwise.

Reference parity: this replaces the neighbor-list *construction* half of
the reference's Verlet machinery (reference chiron/neighbors.py:548-727);
tests/test_sortbuild.py pins exact-array parity against the XLA builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lj_cull import TilePairList


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def _xor_partner(vals, j, R, C):
    """Partner values at XOR distance ``j`` for each (R, C) array in
    ``vals`` (linear index i = r*C + c, row-major).

    For an element whose j-bit is 0 the partner sits at +d (brought in by
    a -d roll); wrapped lanes land only on elements that select the other
    branch, so the wrap never leaks.
    """
    if j < C:
        bit = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1) & j
        axis, d, size = 1, j, C
    else:
        bit = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) & (j // C)
        axis, d, size = 0, j // C, R
    take_lo = bit == 0
    # pltpu.roll takes non-negative shifts; a -d roll is a (size - d) roll
    return [
        jnp.where(
            take_lo,
            pltpu.roll(v, size - d, axis=axis),
            pltpu.roll(v, d, axis=axis),
        )
        for v in vals
    ]


def _bitonic_sort(key, payloads, R, C):
    """Ascending bitonic sort of ``key`` carrying ``payloads`` along.

    Fully unrolled network over n = R*C (both powers of two); equal keys
    never swap."""
    n = R * C
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    )
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            (pkey,) = _xor_partner([key], j, R, C)
            ppay = _xor_partner(payloads, j, R, C)
            is_lo = (idx & j) == 0
            dir_up = (idx & k) == 0
            # in an ascending block the low element keeps the min; pure
            # and/or mask logic (a select between two i1 vectors hits an
            # unsupported Mosaic truncation)
            keep_min = is_lo == dir_up
            swap = (keep_min & (pkey < key)) | (
                jnp.logical_not(keep_min) & (pkey > key)
            )
            key = jnp.where(swap, pkey, key)
            payloads = [
                jnp.where(swap, pp, p) for p, pp in zip(payloads, ppay)
            ]
            j //= 2
        k *= 2
    return key, payloads


def _mxu_cumsum(v, m, inclusive=True):
    """Cumulative sum along the last axis of (r, m)-shaped ``v`` as one
    triangular matmul on the MXU (exact for integer-valued f32 < 2^24)."""
    a = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tri = (a <= b) if inclusive else (a < b)
    return jax.lax.dot_general(
        v, tri.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# largest nr x capacity one-hot for which the per-column placement loop
# stays comfortably inside scoped VMEM (the unrolled loop keeps several
# live); above it the kernel emits the (nr, nc) slot matrix and the
# wrapper places entries in XLA
_KERNEL_PLACE_LIMIT = 1 << 16


def _make_sort_build_kernel(n, n_pad, tm, tn, nslab, cutoff, slack,
                            capacity, place_in_kernel):
    C = 128
    R = n_pad // C
    nr, nc = n_pad // tm, n_pad // tn
    rows_per_rt = tm // C   # layout rows per row tile
    rows_per_ct = tn // C
    reach2 = (cutoff + slack) ** 2
    last_real_col = (n - 1) // tn
    last_real_row = (n - 1) // tm

    def kernel(box_ref, x_in, v_in, f_in,
               x_out, v_out, f_out, cols_ref, ccx_ref, ptr2_ref,
               rowcx_ref, count_ref, over_ref):
        # when place_in_kernel is False, cols_ref/ccx_ref are instead the
        # (nr, nc) slot and shifted-center matrices for the XLA wrapper
        Lx = box_ref[0, 0]
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]

        def rc(a):  # (n_pad,) lane row -> (R, C) register layout
            return a.reshape(R, C)

        idx = (
            jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        )
        valid = idx < n
        x0 = rc(x_in[0, :])
        x1 = rc(x_in[1, :])
        x2 = rc(x_in[2, :])
        if nslab == 0:
            key = x0
        else:
            slab_w = Lx / nslab
            slab = jnp.clip(jnp.floor(x0 / slab_w), 0.0, float(nslab - 1))
            # slab separation scaled by Ly: adjacent slabs' keys must not
            # interleave for non-cubic boxes (matches slab_y_key)
            key = slab * (2.0 * Ly) + x1
        key = jnp.where(valid, key, jnp.float32(3.0e38))
        payloads = [
            x0, x1, x2,
            rc(v_in[0, :]), rc(v_in[1, :]), rc(v_in[2, :]),
            rc(f_in[0, :]), rc(f_in[1, :]), rc(f_in[2, :]),
        ]
        key, payloads = _bitonic_sort(key, payloads, R, C)
        xs = payloads[0:3]
        # pin padding slots (statically the last n_pad - n after the sort)
        # to the coordinates of sorted slot n-1 so tile bboxes stay tight
        if n < n_pad:
            pinned = []
            for a in xs:
                anchor = jnp.sum(jnp.where(idx == n - 1, a, 0.0))
                pinned.append(jnp.where(valid, a, anchor))
            xs = pinned
        x_out[...] = jnp.concatenate(
            [p.reshape(1, n_pad) for p in payloads[0:3]], axis=0
        )
        v_out[...] = jnp.concatenate(
            [p.reshape(1, n_pad) for p in payloads[3:6]], axis=0
        )
        f_out[...] = jnp.concatenate(
            [p.reshape(1, n_pad) for p in payloads[6:9]], axis=0
        )

        # ---- tile bboxes (same math as lj_cull.tile_bboxes) ----
        def bboxes(tile_rows, n_tiles):
            cen, hal = [], []
            for a, L in zip(xs, (Lx, Ly, Lz)):
                t = a.reshape(n_tiles, tile_rows * C)
                ref0 = t[:, 0:1]
                d = t - ref0
                d = d - L * jnp.round(d / L)
                lo = jnp.min(d, axis=1, keepdims=True)
                hi = jnp.max(d, axis=1, keepdims=True)
                cen.append(ref0 + 0.5 * (lo + hi))   # (n_tiles, 1)
                hal.append(0.5 * (hi - lo))
            return cen, hal

        rcen, rhal = bboxes(rows_per_rt, nr)
        ccen, chal = bboxes(rows_per_ct, nc)

        # ---- near/useful masks on (nr, nc) ----
        ccenT = [c.reshape(1, nc) for c in ccen]
        chalT = [h.reshape(1, nc) for h in chal]
        near2 = jnp.zeros((nr, nc), jnp.float32)
        for ax, L in enumerate((Lx, Ly, Lz)):
            dc = rcen[ax] - ccenT[ax]
            dc = dc - L * jnp.round(dc / L)
            hs = rhal[ax] + chalT[ax]
            if ax == 0:
                hsum_x = hs
                dcx_raw = rcen[0] - ccenT[0]
            dmin = jnp.maximum(0.0, jnp.abs(dc) - hs)
            near2 = near2 + dmin * dmin
        ri = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 1)
        useful = (
            (ci * tn + (tn - 1) > ri * tm)
            & (ri * tm < n)
            & (ci * tn < n)
        )
        keep = (near2 < reach2) & useful
        general = (
            (ci * tn < ri * tm + tm)
            | (ci >= last_real_col)
            | (ri >= last_real_row)
        )
        kg = jnp.where(keep & general, 1.0, 0.0)
        kf = jnp.where(keep & ~general, 1.0, 0.0)

        # image-shifted col x-centers + shift-bound check
        ccx_sh = ccenT[0] + jnp.round(dcx_raw / Lx) * Lx  # (nr, nc)
        bound_x = 0.5 * Lx - cutoff - slack
        shift_bad = jnp.max(
            jnp.where(keep & (hsum_x > bound_x), 1.0, 0.0)
        )

        # ---- segment pointers ----
        # (Mosaic rejects the interleaving (nr,2)->(1,2nr) and flattening
        # (nr,nc)->(1,nr*nc) shape casts, so every cumulative quantity is
        # built in its natural orientation with small MXU matmuls and the
        # interleaved ptr2 layout is assembled by placement matrices.)
        gen_cnt = jnp.sum(kg, axis=1, keepdims=True)     # (nr, 1)
        fast_cnt = jnp.sum(kf, axis=1, keepdims=True)
        tot = gen_cnt + fast_cnt
        # inclusive cumsum down the rows: lower-triangular matmul
        tri_a = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 0)
        tri_b = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 1)
        tri_lo = (tri_a >= tri_b).astype(jnp.float32)
        incl = jax.lax.dot_general(
            tri_lo, tot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                # (nr, 1)
        total = jnp.max(incl)
        # ptr2[2i+1] = incl[i] - fast[i], ptr2[2i+2] = incl[i], ptr2[0]=0:
        # place both via (nr, 2nr+1) selection matrices on the MXU
        lane = jax.lax.broadcasted_iota(jnp.int32, (nr, 2 * nr + 1), 1)
        row2 = 2 * jax.lax.broadcasted_iota(
            jnp.int32, (nr, 2 * nr + 1), 0
        )
        A = ((lane == row2 + 1) | (lane == row2 + 2)).astype(jnp.float32)
        B = (lane == row2 + 1).astype(jnp.float32)

        def colplace(v, M):  # (nr,1) x (nr, m) -> (1, m)
            # HIGHEST precision: the MXU's default bf16 pass rounds
            # integer-valued sums above 256 (caught at N=16k: wrong ptr2)
            return jax.lax.dot_general(
                v, M, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        ptr2_ref[...] = jnp.minimum(
            colplace(incl, A) - colplace(fast_cnt, B), capacity
        )
        base_gen = incl - tot                            # (nr, 1)
        base_fast = base_gen + gen_cnt

        # within-row, within-segment ranks (entries ordered by col index)
        gen_rank = _mxu_cumsum(kg, nc) - 1.0
        fast_rank = _mxu_cumsum(kf, nc) - 1.0
        slot = jnp.where(
            kg > 0.5, base_gen + gen_rank, base_fast + fast_rank
        )
        slot = jnp.where(keep, slot, jnp.float32(capacity))

        if place_in_kernel:
            # ---- placement: per-column one-hot matmuls on the MXU ----
            cap_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nr, capacity), 1
            ).astype(jnp.float32)
            cols_acc = jnp.zeros((1, capacity), jnp.float32)
            ccx_acc = jnp.zeros((1, capacity), jnp.float32)
            for c in range(nc):
                Tc = (slot[:, c:c + 1] == cap_iota).astype(jnp.float32)
                cols_acc = cols_acc + float(c) * colplace(
                    jnp.ones((nr, 1), jnp.float32), Tc
                )
                ccx_acc = ccx_acc + colplace(ccx_sh[:, c:c + 1], Tc)
            cols_ref[...] = jnp.round(cols_acc)
            ccx_ref[...] = ccx_acc
        else:
            cols_ref[...] = slot
            ccx_ref[...] = jnp.broadcast_to(ccx_sh, (nr, nc))
        rowcx_ref[...] = rcen[0].reshape(1, nr)
        count_ref[0, 0] = jnp.minimum(total, float(capacity))
        over_ref[0, 0] = jnp.maximum(
            jnp.where(total > capacity, 1.0, 0.0), shift_bad
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "tm", "tn", "nslab", "cutoff", "slack",
                     "capacity", "interpret"),
)
def sort_build_raw(x3, v3, f3, box_diag, n: int, tm: int, tn: int,
                   nslab: int, cutoff: float, slack: float, capacity: int,
                   interpret: bool):
    """One Pallas call: spatially sort the MD state and build the
    tile-pair list.  Returns ``(x', v', F', TilePairList)`` matching
    ``sort_by_key`` + ``build_tile_pairs`` (up to equal-key tie order).
    """
    n_pad = x3.shape[1]
    if not (_is_pow2(n_pad) and tm % 128 == 0 and tn % 128 == 0):
        raise ValueError(
            "sort_build_raw needs power-of-two n_pad and 128-multiple "
            f"tiles (n_pad={n_pad}, tm={tm}, tn={tn})"
        )
    nr, nc = n_pad // tm, n_pad // tn
    place_in_kernel = nr * capacity <= _KERNEL_PLACE_LIMIT
    kernel = _make_sort_build_kernel(
        n, n_pad, tm, tn, nslab, cutoff, slack, capacity, place_in_kernel
    )
    if place_in_kernel:
        cols_shape = ccx_shape = (1, capacity)
    else:
        cols_shape = ccx_shape = (nr, nc)
    smem = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        in_specs=[smem((1, 3)), vmem, vmem, vmem],
        out_specs=[
            vmem, vmem, vmem,                      # x', v', F'
            vmem,                                  # cols / slot matrix
            vmem,                                  # ccx / ccx_sh matrix
            vmem,                                  # ptr2 (1, 2nr+1) f32
            vmem,                                  # rowcx (1, nr) f32
            smem((1, 1)),                          # count
            smem((1, 1)),                          # overflowed
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct(cols_shape, jnp.float32),
            jax.ShapeDtypeStruct(ccx_shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * nr + 1), jnp.float32),
            jax.ShapeDtypeStruct((1, nr), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(box_diag.reshape(1, 3), x3, v3, f3)
    xs, vs, fs, cols, ccx, ptr2, rowcx, count, over = outs
    if not place_in_kernel:
        # XLA-side placement from the kernel's (nr, nc) slot matrix (the
        # in-kernel per-column loop would blow scoped VMEM at this size);
        # scatter with drop semantics, mirroring lj_cull.build_tile_pairs
        slot = cols
        ccx_sh = ccx
        sl = slot.reshape(-1).astype(jnp.int32)
        ci = jnp.broadcast_to(
            jnp.arange(nc, dtype=jnp.float32)[None, :], (nr, nc)
        ).reshape(-1)
        cols = jnp.zeros((1, capacity), jnp.float32).at[0, sl].set(
            ci, mode="drop"
        )
        ccx = jnp.zeros((1, capacity), jnp.float32).at[0, sl].set(
            ccx_sh.reshape(-1), mode="drop"
        )
    cols = cols.astype(jnp.int32)
    ptr2 = ptr2.astype(jnp.int32)
    pairs = TilePairList(
        rows=jnp.zeros_like(cols),  # not consumed by the MD kernel
        cols=cols,
        ccx=ccx,
        ptr2=ptr2,
        rowcx=rowcx,
        count=count.astype(jnp.int32),
        overflowed=(over[0, 0] > 0.5),
    )
    return xs, vs, fs, pairs
