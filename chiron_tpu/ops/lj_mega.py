"""Megakernel culled MD segment: ONE Pallas call per segment, zero
per-segment XLA ops.

Round-4 measurements (BENCH.md rebuild-cost audit) priced the culled
runner's per-segment XLA work at ~300 us: sort+build ~150 us (launch-
overhead-bound: ~50 small fusions over (nr, nc) arrays plus the
10-operand bitonic) and the drift check ~145 us (folded into the MD
kernel earlier in round 4).  This module removes the REST: the segment
kernel now

* builds the tile-pair list IN-KERNEL at grid step 0 -- the bbox /
  near-matrix / segment-pointer math of ``build_tile_pairs`` on (R, C)
  register layouts (same formulation as ops/sortbuild.py), with the
  per-entry (col, ccx) values placed into SMEM scratch by a scalar
  placement loop (dynamic SMEM stores; feasibility proven on hardware,
  jobs j64/j65) -- the force pass then reads the scratch exactly as it
  reads the SMEM inputs today;
* runs the S BAOAB+force steps with the list resident in SMEM;
* evaluates the tile-skin drift invariant at the final step (as in the
  round-4 drift-fold); and
* REPAIRS the spatial order with P odd-even transposition passes over
  the (R, C) register layout (linear-neighbor exchange via pltpu.roll),
  replacing the full XLA re-sort: between segments particles drift only
  a few ranks, and a rank error of a few slots leaves 128-rank tile
  bboxes essentially unchanged -- sortedness is a PERFORMANCE hint, not
  a correctness requirement (bboxes come from true positions; the
  capacity/shift/drift latches still guard every invariant).  The
  comparator is MINIMUM-IMAGE, so the maintained order is CYCLIC: a
  particle that wraps across the periodic x boundary is already
  cyclically near its rank and is not dragged through the whole box (a
  linear comparator does exactly that and the traveler blows up its
  host tiles' bboxes -- measured as a shift-bound latch after ~8
  segments before this fix).  Padding lanes are excluded by rank
  bounds and never move.

The jnp/interpret oracle story: the first segment from a freshly sorted
state must match the classic path's segment bit-for-bit up to the final
repair permutation (tests/test_lj_mega.py compares the physical multiset
of (x, v, F) triples and the in-kernel list via force equality).

Reference anchor: this subsumes the rebuild machinery of the reference's
Verlet list (reference chiron/neighbors.py:709-727) and its per-step
Python loop (reference chiron/integrators.py:174-205) into one compiled
TPU program per segment.

STATUS (round-4 hardware A/B, job j66): MEASURED SLOWER than the
classic path -- 12,690 vs 13,899 steps/s same-session at the flagship
point.  Mosaic scalar-loop iterations (the SMEM placement loop's
extract-and-store pattern) cost ~0.7 us each on v5e, so the in-kernel
build runs ~400 us/segment against the ~150 us of XLA sort+build it
replaces; and repair-only ordering accumulates >P-rank tail
displacements until an invariant latches (~50k steps at P=16).  The
path stays available (megakernel=True) as a correct, fully-tested
design-space record; the classic path remains the default and the
production recommendation.  See BENCH.md "round-4 rebuild-cost audit".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lj_cull import _baoab_phase, _row_force_pass, _tile_skin_drift_bad


def _linshift(v, d, R, C):
    """Value at linear index i+d of the row-major (R, C) layout."""
    c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    if d == 1:
        r1 = pltpu.roll(v, C - 1, axis=1)
        r2 = pltpu.roll(r1, R - 1, axis=0)
        return jnp.where(c == C - 1, r2, r1)
    l1 = pltpu.roll(v, 1, axis=1)
    l2 = pltpu.roll(l1, 1, axis=0)
    return jnp.where(c == 0, l2, l1)


def _make_mega_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                      dt, a_coef, b_coef, approx_recip, unroll,
                      n_steps, slack, capacity, repair_passes):
    inv_sigma = 1.0 / sigma
    eps_scale = 48.0 * epsilon / sigma
    cutoff2_s = (cutoff / sigma) ** 2
    C = 128
    R = n_pad // C
    nr, nc = n_pad // tm, n_pad // tn
    rows_per_rt = tm // C
    rows_per_ct = tn // C
    reach = cutoff + slack
    reach2 = reach * reach
    last_real_col = (n - 1) // tn
    last_real_row = (n - 1) // tm

    def kernel(box_ref, seed_ref, off_ref, minv_ref, sigv_ref,
               x_in, v_in, f_in, x_ref, v_ref, f_ref, flag_ref,
               cols_ref, ccx_ref, ptr2_ref, rowcx_ref, anchor_ref):
        s = pl.program_id(0)
        Lx = box_ref[0, 0]
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]
        inv_Lx, inv_Ly, inv_Lz = 1.0 / Lx, 1.0 / Ly, 1.0 / Lz

        idx = (
            jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        )
        valid = idx < n

        @pl.when(s == 0)
        def _seed_state():
            x_ref[...] = x_in[...]
            v_ref[...] = v_in[...]
            f_ref[...] = f_in[...]
            anchor_ref[...] = x_in[...]
            flag_ref[0, 0] = 0.0

        @pl.when(s == 0)
        def _build():
            # ---- tile bboxes / near masks: the ops/sortbuild.py
            # formulation (Mosaic-proven), build-only ----
            def rc(i):
                return x_ref[i, :].reshape(R, C)

            xs = [rc(0), rc(1), rc(2)]
            if n < n_pad:
                # pin padding slots to slot n-1's coords so tile bboxes
                # stay tight no matter where integration drifted them
                pinned = []
                for a in xs:
                    anchor = jnp.sum(jnp.where(idx == n - 1, a, 0.0))
                    pinned.append(jnp.where(valid, a, anchor))
                xs = pinned

            def bboxes(tile_rows, n_tiles):
                cen, hal = [], []
                for a, L in zip(xs, (Lx, Ly, Lz)):
                    t = a.reshape(n_tiles, tile_rows * C)
                    ref0 = t[:, 0:1]
                    d = t - ref0
                    d = d - L * jnp.round(d / L)
                    lo = jnp.min(d, axis=1, keepdims=True)
                    hi = jnp.max(d, axis=1, keepdims=True)
                    cen.append(ref0 + 0.5 * (lo + hi))
                    hal.append(0.5 * (hi - lo))
                return cen, hal

            rcen, rhal = bboxes(rows_per_rt, nr)
            ccen, chal = bboxes(rows_per_ct, nc)
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
            ccx_sh = ccenT[0] + jnp.round(dcx_raw / Lx) * Lx  # (nr, nc)
            bound_x = 0.5 * Lx - cutoff - slack
            shift_bad = jnp.max(
                jnp.where(keep & (hsum_x > bound_x), 1.0, 0.0)
            )

            # ---- segment pointers via small MXU matmuls (sortbuild's
            # orientation-safe cumsums) ----
            gen_cnt = jnp.sum(kg, axis=1, keepdims=True)   # (nr, 1)
            fast_cnt = jnp.sum(kf, axis=1, keepdims=True)
            tot = gen_cnt + fast_cnt
            tri_a = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 0)
            tri_b = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 1)
            tri_lo = (tri_a >= tri_b).astype(jnp.float32)
            incl = jax.lax.dot_general(
                tri_lo, tot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (nr, 1)
            total = jnp.max(incl)

            def cumsum_cols(v):
                a = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 0)
                b = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 1)
                tri = (a <= b).astype(jnp.float32)
                return jax.lax.dot_general(
                    v, tri, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            gen_rank = cumsum_cols(kg) - 1.0
            fast_rank = cumsum_cols(kf) - 1.0
            base_gen = incl - tot
            base_fast = base_gen + gen_cnt
            slot = jnp.where(
                kg > 0.5, base_gen + gen_rank, base_fast + fast_rank
            )
            slot = jnp.where(keep, slot, jnp.float32(capacity))

            # ---- scalar extraction into SMEM scratch ----
            # ptr2: 2nr+1 boundaries from incl/fast_cnt
            iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)

            def row_scalars(i, _):
                inc_i = jnp.sum(jnp.where(iota_r1 == i, incl, 0.0))
                fst_i = jnp.sum(jnp.where(iota_r1 == i, fast_cnt, 0.0))
                rcx_i = jnp.sum(jnp.where(iota_r1 == i, rcen[0], 0.0))
                ptr2_ref[0, 2 * i + 1] = jnp.minimum(
                    inc_i - fst_i, jnp.float32(capacity)
                ).astype(jnp.int32)
                ptr2_ref[0, 2 * i + 2] = jnp.minimum(
                    inc_i, jnp.float32(capacity)
                ).astype(jnp.int32)
                rowcx_ref[0, i] = rcx_i
                return _

            ptr2_ref[0, 0] = 0
            jax.lax.fori_loop(0, nr, row_scalars, 0)

            # per-rect placement: extract slot + ccx, store when live
            def place(k, carry):
                i = k // nc
                c = k - i * nc
                m = (ri == i) & (ci == c)
                sl = jnp.sum(jnp.where(m, slot, 0.0)).astype(jnp.int32)
                cx = jnp.sum(jnp.where(m, ccx_sh, 0.0))

                @pl.when(sl < capacity)
                def _store():
                    cols_ref[0, sl] = c
                    ccx_ref[0, sl] = cx

                return carry

            jax.lax.fori_loop(0, nr * nc, place, 0)

            # capacity overflow or broken x-frame bound latches the flag
            bad = (total > capacity) | (shift_bad > 0.5)
            flag_ref[0, 0] = jnp.where(bad, 1.0, flag_ref[0, 0])

        # ---- BAOAB phase (the SAME helper as ops/lj_cull.py's MD
        # kernel: the bit-for-bit parity contract with the classic path
        # rides on sharing the noise stream and step semantics) ----
        _baoab_phase(
            x_ref, v_ref, f_ref, minv_ref, sigv_ref, seed_ref, off_ref,
            s, n_pad, dt, a_coef, b_coef,
            Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
        )

        _row_force_pass(
            x_ref, f_ref, cols_ref, ccx_ref, ptr2_ref, rowcx_ref,
            n, n_pad, tm, tn,
            Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
            inv_sigma, eps_scale, cutoff2_s, approx_recip, unroll,
        )

        @pl.when(s == n_steps - 1)
        def _drift_and_repair():
            # ---- tile-skin invariant (round-4 drift-fold semantics;
            # shared helper -- here the latch ORs into the build's
            # capacity/shift flag instead of overwriting it) ----
            bad = _tile_skin_drift_bad(
                x_ref, anchor_ref, n, n_pad, slack,
                Lx, inv_Lx, Ly, inv_Ly, Lz, inv_Lz,
            )
            flag_ref[0, 0] = jnp.where(bad, 1.0, flag_ref[0, 0])

            # ---- odd-even repair of the spatial order (replaces the
            # XLA re-sort; P passes fix +-P/2 rank disorder and a few
            # residual ranks cannot fatten 128-rank tile bboxes).
            # Adjacent comparisons are MINIMUM-IMAGE: a particle that
            # wrapped across the periodic x boundary is cyclically near
            # its old rank, so it must NOT be dragged through the whole
            # box (a linear comparator does exactly that, and the
            # traveling particle blows up its host tiles' bboxes -- the
            # failure mode that motivated this comparator).  The order
            # maintained is therefore cyclic-sorted, which is all the
            # min-image bbox machinery needs.  Padding lanes are
            # excluded by explicit rank bounds and never move. ----
            if repair_passes > 0:
                rows = (
                    [x_ref[i, :].reshape(R, C) for i in range(3)]
                    + [v_ref[i, :].reshape(R, C) for i in range(3)]
                    + [f_ref[i, :].reshape(R, C) for i in range(3)]
                )
                key = rows[0]
                for p in range(repair_passes):
                    phase = p % 2
                    nk = _linshift(key, 1, R, C)
                    pk = _linshift(key, -1, R, C)
                    dn = key - nk
                    dn = dn - Lx * jnp.round(dn * inv_Lx)
                    dp_ = pk - key
                    dp_ = dp_ - Lx * jnp.round(dp_ * inv_Lx)
                    is_lo = (idx % 2) == phase
                    t_nxt = is_lo & (dn > 0) & (idx < n - 1)
                    t_prv = (~is_lo) & (dp_ > 0) & (idx > 0) & (idx < n)
                    key = jnp.where(t_nxt, nk, jnp.where(t_prv, pk, key))
                    new_rows = []
                    for q in rows:
                        nq = _linshift(q, 1, R, C)
                        pq = _linshift(q, -1, R, C)
                        new_rows.append(
                            jnp.where(t_nxt, nq, jnp.where(t_prv, pq, q))
                        )
                    rows = new_rows
                x_ref[...] = jnp.concatenate(
                    [r.reshape(1, n_pad) for r in rows[0:3]], axis=0
                )
                v_ref[...] = jnp.concatenate(
                    [r.reshape(1, n_pad) for r in rows[3:6]], axis=0
                )
                f_ref[...] = jnp.concatenate(
                    [r.reshape(1, n_pad) for r in rows[6:9]], axis=0
                )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_steps", "tm", "tn", "sigma", "epsilon",
                     "cutoff", "dt", "a_coef", "b_coef", "approx_recip",
                     "interpret", "unroll", "slack", "capacity",
                     "repair_passes"),
)
def mega_md_raw(x3, v3, f3, box_diag, seed, step_offset, minv, sigv,
                n: int, n_steps: int, tm: int, tn: int, sigma: float,
                epsilon: float, cutoff: float, dt: float, a_coef: float,
                b_coef: float, approx_recip: bool, interpret: bool,
                unroll: int, slack: float, capacity: int,
                repair_passes: int = 16):
    """One megakernel segment: in-kernel build + S BAOAB/force steps +
    drift check + order repair, zero XLA ops.  Returns (x, v, F, flag).

    Positions must arrive approximately x-sorted (exactly sorted at
    init; repaired at every segment end thereafter) and wrapped.  Only
    the pure-x sort key is supported (``nslab == 0`` regime)."""
    n_pad = x3.shape[1]
    kernel = _make_mega_kernel(
        n, n_pad, tm, tn, sigma, epsilon, cutoff, dt, a_coef, b_coef,
        approx_recip, unroll, n_steps, slack, capacity, repair_passes,
    )
    full = lambda s: (0, 0)
    smem = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.VMEM)
    nr = n_pad // tm
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            smem((1, 3)),            # box
            smem((1, 1)),            # seed
            smem((1, 1)),            # step offset
            vmem((1, n_pad)),        # 1/m
            vmem((1, n_pad)),        # sigma_v
            vmem((3, n_pad)),        # x
            vmem((3, n_pad)),        # v (half-kick convention)
            vmem((3, n_pad)),        # F
        ],
        out_specs=[
            vmem((3, n_pad)), vmem((3, n_pad)), vmem((3, n_pad)),
            smem((1, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, capacity), jnp.int32),     # cols
            pltpu.SMEM((1, capacity), jnp.float32),   # ccx
            pltpu.SMEM((1, 2 * nr + 1), jnp.int32),   # ptr2
            pltpu.SMEM((1, nr), jnp.float32),         # rowcx
            pltpu.VMEM((3, n_pad), jnp.float32),      # drift anchor
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )(box_diag.reshape(1, 3), seed, step_offset, minv, sigv, x3, v3, f3)
