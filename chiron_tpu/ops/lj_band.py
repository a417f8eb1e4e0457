"""Banded LJ force kernel over x-sorted particles.

The sparsity step beyond the dense kernel (ops/lj_dense.py): particles are
kept sorted by their x coordinate, so every pair within the cutoff has a
bounded *rank* distance W (the number of particles inside an x-slab of width
cutoff + 2*margin).  The N x N interaction matrix collapses to a cyclic band
of width W, cutting pair-slot work by L_x / (cutoff + 2*margin + tile) while
keeping fully contiguous, lane-aligned memory access -- the TPU-friendly
analogue of a cell list (SURVEY.md section 5 "long-context" mapping: this is
banded attention over the particle axis).

Correctness contract:
* sorted order is valid while every particle's x displacement since the last
  sort is < margin (then any in-cutoff pair has sort-time x distance
  < cutoff + 2*margin, hence rank distance <= W_data);
* W_static is chosen with headroom at build; a rebuild recomputes W_needed
  and raises the overflow flag if it exceeds the static capacity;
* each unordered pair with cyclic rank distance in [1, W] is evaluated
  exactly once (rows accumulate +f, the cyclically-ahead columns -f).

Re-sorting is a shape-stable multi-operand ``lax.sort`` (x key + state
payloads), so it composes with ``lax.cond`` inside compiled scan loops.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_band_kernel(n: int, n_pad: int, tm: int, w: int,
                      sigma: float, epsilon: float, cutoff: float,
                      approx_recip: bool, with_energy: bool = False):
    sigma2 = sigma * sigma
    eps4 = 4.0 * epsilon
    cutoff2 = cutoff * cutoff
    n_tiles = n_pad // tm
    # tiles needed to cover ranks (row .. row + W) cyclically, plus the
    # padding gap (< tm) between rank n-1 and rank 0, plus the row tile span.
    # Never revisit a tile (would double-count pairs).
    n_band_tiles = min((w + tm - 1) // tm + 2, n_tiles)

    def kernel(pos_ref, box_ref, force_ref, *maybe_e_ref):
        e_ref = maybe_e_ref[0] if with_energy else None
        i = pl.program_id(0)
        row0 = i * tm
        Lx = box_ref[0, 0]
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]

        @pl.when(i == 0)
        def _():
            force_ref[...] = jnp.zeros((3, n_pad), dtype=jnp.float32)
            if with_energy:
                e_ref[0, 0] = jnp.float32(0.0)

        xi = pos_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
        yi = pos_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
        zi = pos_ref[2, pl.ds(row0, tm)].reshape(tm, 1)
        rid = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        rvalid = rid < n

        def body(k, acc):
            if with_energy:
                fx, fy, fz, et = acc
            else:
                fx, fy, fz = acc
                et = None
            jt = jax.lax.rem(i + k, n_tiles)
            col0 = jt * tm
            xj = pos_ref[0, pl.ds(col0, tm)].reshape(1, tm)
            yj = pos_ref[1, pl.ds(col0, tm)].reshape(1, tm)
            zj = pos_ref[2, pl.ds(col0, tm)].reshape(1, tm)
            cid = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tm), 1)
            # cyclic rank distance over the REAL n ranks (padding excluded
            # by the cid < n mask); delta in [1, W] selects ordered pairs
            # exactly once.
            delta = jax.lax.rem(cid - rid + n, n)
            pm = (
                rvalid & (cid < n)
                & (delta >= 1) & (delta <= w)
            )
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - Lx * jnp.floor(dx / Lx + 0.5)
            dy = dy - Ly * jnp.floor(dy / Ly + 0.5)
            dz = dz - Lz * jnp.floor(dz / Lz + 0.5)
            r2 = dx * dx + dy * dy + dz * dz
            m = (r2 < cutoff2) & pm
            r2s = jnp.maximum(r2, 1e-4 * sigma2)
            if approx_recip:
                inv = pl.reciprocal(r2s, approx=True)
            else:
                # f32-exact via Newton refinement (ops/lj_cull.py
                # scheme): two steps beat the VPU's long-latency divide
                inv = pl.reciprocal(r2s, approx=True)
                inv = inv * (2.0 - r2s * inv)
                inv = inv * (2.0 - r2s * inv)
            i2 = sigma2 * inv
            i6 = i2 * i2 * i2
            if with_energy:
                # each unordered pair appears exactly once (delta in [1, W])
                et = et + jnp.sum(
                    jnp.where(m, eps4 * (i6 * i6 - i6), 0.0)
                )
            coef = jnp.where(m, (6.0 * eps4) * (2.0 * i6 * i6 - i6) * inv, 0.0)
            tx = coef * dx
            ty = coef * dy
            tz = coef * dz
            fx = fx + jnp.sum(tx, axis=1, keepdims=True)
            fy = fy + jnp.sum(ty, axis=1, keepdims=True)
            fz = fz + jnp.sum(tz, axis=1, keepdims=True)
            # reaction on the cyclically-ahead columns
            force_ref[0, pl.ds(col0, tm)] = (
                force_ref[0, pl.ds(col0, tm)] - jnp.sum(tx, axis=0)
            )
            force_ref[1, pl.ds(col0, tm)] = (
                force_ref[1, pl.ds(col0, tm)] - jnp.sum(ty, axis=0)
            )
            force_ref[2, pl.ds(col0, tm)] = (
                force_ref[2, pl.ds(col0, tm)] - jnp.sum(tz, axis=0)
            )
            return (fx, fy, fz, et) if with_energy else (fx, fy, fz)

        z = jnp.zeros((tm, 1), jnp.float32)
        init = (z, z, z, jnp.float32(0.0)) if with_energy else (z, z, z)
        out = jax.lax.fori_loop(0, n_band_tiles, body, init)
        fx, fy, fz = out[0:3]
        et = out[3] if with_energy else None
        force_ref[0, pl.ds(row0, tm)] = force_ref[0, pl.ds(row0, tm)] + fx[:, 0]
        force_ref[1, pl.ds(row0, tm)] = force_ref[1, pl.ds(row0, tm)] + fy[:, 0]
        force_ref[2, pl.ds(row0, tm)] = force_ref[2, pl.ds(row0, tm)] + fz[:, 0]
        if with_energy:
            e_ref[0, 0] = e_ref[0, 0] + et

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "w", "sigma", "epsilon", "cutoff", "tm",
                     "approx_recip", "interpret"),
)
def band_force_raw(pos3, box_diag, n: int, w: int, sigma: float,
                   epsilon: float, cutoff: float, tm: int,
                   approx_recip: bool, interpret: bool):
    n_pad = pos3.shape[1]
    kernel = _make_band_kernel(n, n_pad, tm, w, sigma, epsilon, cutoff,
                               approx_recip)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // tm,),
        in_specs=[
            pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(pos3, box_diag)


@functools.partial(
    jax.jit,
    static_argnames=("n", "w", "sigma", "epsilon", "cutoff", "tm",
                     "approx_recip", "interpret"),
)
def band_force_energy_raw(pos3, box_diag, n: int, w: int, sigma: float,
                          epsilon: float, cutoff: float, tm: int,
                          approx_recip: bool, interpret: bool):
    """Force AND total truncated-LJ potential in one banded pass (each
    unordered pair's energy counted once via the cyclic rank window)."""
    n_pad = pos3.shape[1]
    kernel = _make_band_kernel(n, n_pad, tm, w, sigma, epsilon, cutoff,
                               approx_recip, with_energy=True)
    f, e = pl.pallas_call(
        kernel,
        grid=(n_pad // tm,),
        in_specs=[
            pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(pos3, box_diag)
    return f, e[0, 0]


def sort_by_x(pos3: jnp.ndarray, payloads, n: int):
    """Sort the (3, n_pad) layout by x; payloads follow the permutation.

    Padding columns carry an x sentinel so they stay at the end.  Returns
    (sorted pos3, sorted payloads tuple).
    """
    n_pad = pos3.shape[1]
    sentinel = jnp.where(
        jnp.arange(n_pad) < n, pos3[0], jnp.float32(3.0e38)
    )
    operands = [sentinel, pos3[1], pos3[2]] + [p for p in payloads]
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    xs = jnp.where(jnp.arange(n_pad) < n, sorted_ops[0], 0.0)
    pos3_sorted = jnp.stack([xs, sorted_ops[1], sorted_ops[2]])
    return pos3_sorted, tuple(sorted_ops[3:])


def band_width_needed(xs: jnp.ndarray, n: int, reach: float, L) -> jnp.ndarray:
    """Max forward rank-window covering x-distance ``reach`` (cyclic in L).

    ``xs``: sorted x values, (n_pad,) with sentinels beyond n.
    """
    n_pad = xs.shape[0]
    idx = jnp.arange(n_pad)
    valid = idx < n
    x = jnp.where(valid, xs, 0.0)
    hi = x + reach
    # count of entries <= hi (non-wrapped part); searchsorted over the
    # sorted prefix works because sentinels exceed any hi
    count_fwd = jnp.searchsorted(xs, hi, side="right") - idx
    # wrapped part: entries below hi - L at the front of the array
    count_wrap = jnp.searchsorted(xs, hi - L, side="right")
    counts = jnp.where(valid, count_fwd + count_wrap, 0)
    return jnp.max(counts).astype(jnp.int32)


class LJBandPallas:
    """Banded LJ force over x-sorted state.

    Parameters
    ----------
    n, sigma, epsilon, cutoff : system/potential constants (MD units).
    margin : allowed per-particle x drift between re-sorts (nm).
    w : static band capacity in ranks (chosen from data at init when None).
    """

    def __init__(self, n: int, sigma: float, epsilon: float, cutoff: float,
                 margin: float = 0.15, tm: int = 256,
                 w: Optional[int] = None,
                 interpret: Optional[bool] = None):
        self.n = n
        self.sigma = float(sigma)
        self.epsilon = float(epsilon)
        self.cutoff = float(cutoff)
        self.margin = float(margin)
        self.reach = self.cutoff + 2.0 * self.margin
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if not interpret:
            tm = max(tm, 128)
        self.tm = tm
        self.interpret = interpret
        self.n_pad = _round_up(n, tm)
        if w is not None and w >= (n - 1) // 2:
            raise ValueError(
                f"band width w={w} >= n/2 would double-count pairs; "
                f"use LJDensePallas for boxes this small"
            )
        self.w = w  # resolved in calibrate()

    def calibrate(self, pos3_sorted: jnp.ndarray, L: float,
                  headroom: float = 1.2) -> int:
        """Pick the static band capacity from the initial configuration.

        Raises when the band would need to span half the system: the
        single-count invariant (each unordered pair has exactly one cyclic
        rank delta in [1, W]) requires W < n/2.  That regime (box only a few
        cutoffs wide) is exactly where the dense kernel is the right tool.
        """
        w_data = int(
            band_width_needed(pos3_sorted[0], self.n, self.reach, L)
        )
        w = int(w_data * headroom) + self.tm
        if w >= (self.n - 1) // 2:
            raise ValueError(
                f"banded kernel inapplicable: band width {w} >= n/2 "
                f"({self.n // 2}); the box is too small relative to "
                f"cutoff+2*margin -- use LJDensePallas instead"
            )
        self.w = w
        return self.w

    def force(self, pos3_sorted, box_diag, approx_recip: bool = True):
        if self.w is None:
            raise RuntimeError("call calibrate() first")
        return band_force_raw(
            pos3_sorted, box_diag, self.n, self.w, self.sigma, self.epsilon,
            self.cutoff, self.tm, approx_recip, self.interpret,
        )

    def force_energy(self, pos3_sorted, box_diag,
                     approx_recip: bool = False):
        """Force and total truncated-LJ potential in one banded pass
        (exact reciprocal by default, matching ops/lj_cull.py)."""
        if self.w is None:
            raise RuntimeError("call calibrate() first")
        return band_force_energy_raw(
            pos3_sorted, box_diag, self.n, self.w, self.sigma, self.epsilon,
            self.cutoff, self.tm, approx_recip, self.interpret,
        )

    def energy_differentiable(self, pos3_sorted, box_diag):
        """Banded total energy as a DIFFERENTIABLE function of sorted
        positions: ``jax.grad`` of this is exactly the negative of the
        kernel's analytic banded force (the CLAUDE.md
        ``grad(energy) == -force`` invariant on the banded engine, same
        ``jax.custom_vjp`` scheme as ops/lj_cull.py; reference grad-force
        contract: chiron/potential.py:21-24).  The band width is constant
        data -- valid wherever the sorted-order invariant holds."""
        from .diff import energy_with_force_gradient

        return energy_with_force_gradient(
            lambda p: self.force_energy(p, box_diag, approx_recip=False),
            pos3_sorted,
        )
