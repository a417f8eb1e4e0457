"""Fused dense-tiled LJ energy/force Pallas kernel.

The north-star names the pairwise potential layer as the component to rebuild
as "fused Pallas pair-distance/energy/force kernels over HBM-resident
coordinates" (BASELINE.json).  This kernel computes Lennard-Jones forces and
energy over ALL pairs with minimum-image PBC in one pass:

* positions live in VMEM for the whole kernel (N up to ~50k fits),
* the N x N interaction matrix is tiled (TM x TN) and never materialized in
  HBM -- displacement, minimum image, cutoff mask, LJ coefficients and the
  force/energy reductions all fuse in registers/VMEM,
* no gathers, no scatters, no neighbor list, no rebuild logic: the kernel is
  shape-stable and branch-free, which on TPU beats the reference's Verlet
  bookkeeping (XLA's gather/scatter path measures ~7-14 ms at N=4000; this
  kernel targets the ~0.1 ms regime).

Measured oracle parity: matches the jnp dense path to ~1e-6 relative.

A ``jax.custom_vjp`` wraps the pair: energy gradient == -force exactly (the
analytic LJ force IS the negative energy gradient), so ``jax.grad`` through
``lj_dense_energy`` stays exact -- the differentiable-MCMC invariant
(reference chiron/potential.py:21-24) holds with zero autodiff overhead.
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


def _lj_tile_math(xi, yi, zi, xj, yj, zj, inv_L, L, sigma2, eps4, cutoff2,
                  pair_mask, with_energy: bool = True,
                  approx_recip: bool = False):
    """LJ coefficients for one (TM, TN) tile; returns (coef, e, dx, dy, dz).

    coef = 24 eps (2 (sigma/r)^12 - (sigma/r)^6) / r^2  (so F_i = coef * d)
    e    = 4 eps ((sigma/r)^12 - (sigma/r)^6) masked (None if not requested)

    ``approx_recip`` swaps the exact divide for the VPU's fast reciprocal
    (~6e-5 relative force error -- far below the thermostat noise floor).
    """
    dx = xi - xj
    dy = yi - yj
    dz = zi - zj
    # minimum image via floor(d/L + 1/2) -- measured faster than round() on
    # the VPU and bit-identical for |d| < 1.5 L.
    dx = dx - L[0] * jnp.floor(dx * inv_L[0] + 0.5)
    dy = dy - L[1] * jnp.floor(dy * inv_L[1] + 0.5)
    dz = dz - L[2] * jnp.floor(dz * inv_L[2] + 0.5)
    r2 = dx * dx + dy * dy + dz * dz
    mask = (r2 < cutoff2) & pair_mask
    # clamp instead of select before the reciprocal: one op cheaper.  The
    # floor (sigma/100)^2 only guards division-by-zero on masked slots;
    # real pairs match the jnp oracle down to r = sigma/100 (deeper overlap
    # is a >1e20 kT configuration that any sampler rejects).
    r2s = jnp.maximum(r2, 1e-4 * sigma2)
    if approx_recip:
        inv = pl.reciprocal(r2s, approx=True)
    else:
        # f32-exact via Newton refinement of the fast reciprocal (same
        # scheme as ops/lj_cull.py): two steps land below the f32 ulp
        # from either the TPU's ~6e-5 or interpret mode's ~6e-3 seed,
        # at 4 ops instead of the VPU's long-latency divide
        inv = pl.reciprocal(r2s, approx=True)
        inv = inv * (2.0 - r2s * inv)
        inv = inv * (2.0 - r2s * inv)
    inv_r2 = sigma2 * inv
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r12 = inv_r6 * inv_r6
    coef = jnp.where(mask, (6.0 * eps4) * (2.0 * inv_r12 - inv_r6) * inv, 0.0)
    e = None
    if with_energy:
        e = jnp.where(mask, eps4 * (inv_r12 - inv_r6), 0.0)
    return coef, e, dx, dy, dz


def _tile_energy_sum(e):
    """Sum a (tm, tn) f32 energy tile without a flat 16k+-element
    sequential chain.

    A bare ``jnp.sum(e)`` (and even ``sum(sum(e, axis=0))``, which XLA
    re-fuses into the same flat reduce) accumulates f32 sequentially on
    the CPU backend: measured 1.3e-6 relative random-walk error on the
    rho=0.5 reference fixture -- above the <=1e-6 bar.  Reducing axis 0
    first (chains of tm) and closing with a DOT (which XLA cannot fuse
    back into the reduce) keeps every sequential chain <= max(tm, tn):
    simulated error 2.6e-9 on the same fixture.  On TPU the extra
    (1, tn) x (tn, 1) dot rides the otherwise idle MXU.
    """
    cs = jnp.sum(e, axis=0, keepdims=True)            # (1, tn)
    ones = jnp.ones((e.shape[1], 1), jnp.float32)
    return jax.lax.dot_general(
        cs, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _kahan_add(acc, comp, term):
    """One compensated (Kahan) accumulation step: returns (acc', comp').

    The compensation keeps the running f32 sum within ~1 ulp of the exact
    sum of the terms; callers fold the final ``-comp`` into the result.
    XLA/Mosaic do not reassociate explicit f32 adds, so the cancellation
    sequence survives compilation.
    """
    y = term - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp


def _make_triangle_kernel(n: int, n_pad: int, tm: int,
                          sigma: float, epsilon: float, cutoff: float,
                          with_energy: bool = True,
                          approx_recip: bool = False):
    """Newton's-third-law tiled kernel: each (i, j>=i) tile pair is evaluated
    once; row particles accumulate +coef*d, column particles -coef*d.

    The force output is ONE (3, n_pad) VMEM block shared by the whole
    sequential grid, so cross-tile accumulation is race-free on TPU (grid
    programs run in order on the core).  Roughly halves the pair work of the
    square kernel.
    """
    sigma2 = sigma * sigma
    eps4 = 4.0 * epsilon
    cutoff2 = cutoff * cutoff
    n_tiles = n_pad // tm

    def kernel(pos_ref, box_ref, force_ref, energy_ref):
        i = pl.program_id(0)
        row0 = i * tm
        L = jnp.array(
            [box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]], dtype=jnp.float32
        )
        inv_L = 1.0 / L

        @pl.when(i == 0)
        def _():
            force_ref[...] = jnp.zeros((3, n_pad), dtype=jnp.float32)
            energy_ref[...] = jnp.zeros((8, 128), dtype=jnp.float32)

        xi = pos_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
        yi = pos_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
        zi = pos_ref[2, pl.ds(row0, tm)].reshape(tm, 1)
        row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        row_valid = row_ids < n

        def body(j, acc):
            fx, fy, fz, e_acc, e_comp = acc
            col0 = j * tm
            xj = pos_ref[0, pl.ds(col0, tm)].reshape(1, tm)
            yj = pos_ref[1, pl.ds(col0, tm)].reshape(1, tm)
            zj = pos_ref[2, pl.ds(col0, tm)].reshape(1, tm)
            col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tm), 1)
            diagonal = j == i
            # diagonal tile: all ordered pairs a != b (row-accumulate only);
            # off-diagonal: every unordered pair once (row + col accumulate).
            pair_mask = row_valid & (col_ids < n) & (row_ids != col_ids)
            coef, e, dx, dy, dz = _lj_tile_math(
                xi, yi, zi, xj, yj, zj, inv_L, L, sigma2, eps4, cutoff2,
                pair_mask, with_energy=with_energy,
                approx_recip=approx_recip,
            )
            # products computed once, reused by the row AND column sums
            tx = coef * dx
            ty = coef * dy
            tz = coef * dz
            fx = fx + jnp.sum(tx, axis=1, keepdims=True)
            fy = fy + jnp.sum(ty, axis=1, keepdims=True)
            fz = fz + jnp.sum(tz, axis=1, keepdims=True)

            @pl.when(jnp.logical_not(diagonal))
            def _():
                # reaction on the column particles: F_j -= coef * d
                force_ref[0, pl.ds(col0, tm)] = (
                    force_ref[0, pl.ds(col0, tm)] - jnp.sum(tx, axis=0)
                )
                force_ref[1, pl.ds(col0, tm)] = (
                    force_ref[1, pl.ds(col0, tm)] - jnp.sum(ty, axis=0)
                )
                force_ref[2, pl.ds(col0, tm)] = (
                    force_ref[2, pl.ds(col0, tm)] - jnp.sum(tz, axis=0)
                )

            # energy: diagonal tiles double-count ordered pairs; the
            # cross-tile accumulation is Kahan-compensated so the f32
            # running sum stays within ~1 ulp of the exact tile-sum total
            # (BASELINE.json requires <=1e-6 relative everywhere).
            # The in-tile sum is structured (_tile_energy_sum): a flat
            # f32 reduce over the tm*tn tile measured 1.3e-6 relative
            # random-walk error on the rho=0.5 reference fixture
            if with_energy:
                e_sum = _tile_energy_sum(e)
                e_acc, e_comp = _kahan_add(
                    e_acc, e_comp, jnp.where(diagonal, 0.5 * e_sum, e_sum)
                )
            return fx, fy, fz, e_acc, e_comp

        zeros = jnp.zeros((tm, 1), dtype=jnp.float32)
        fx, fy, fz, e_acc, e_comp = jax.lax.fori_loop(
            i, n_tiles, body,
            (zeros, zeros, zeros, jnp.float32(0.0), jnp.float32(0.0)),
        )
        force_ref[0, pl.ds(row0, tm)] = force_ref[0, pl.ds(row0, tm)] + fx[:, 0]
        force_ref[1, pl.ds(row0, tm)] = force_ref[1, pl.ds(row0, tm)] + fy[:, 0]
        force_ref[2, pl.ds(row0, tm)] = force_ref[2, pl.ds(row0, tm)] + fz[:, 0]

        # per-program partial (compensation folded in) written to its own
        # slot; the wrapper tree-sums the slots -- no sequential f32
        # accumulation across the grid
        r0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slot = i % 1024
        energy_ref[...] = energy_ref[...] + jnp.where(
            (r0 == slot // 128) & (c0 == slot % 128), e_acc - e_comp, 0.0
        )

    return kernel


def _make_kernel(n: int, n_pad: int, tm: int, tn: int,
                 sigma: float, epsilon: float, cutoff: float,
                 with_energy: bool = True, approx_recip: bool = False):
    sigma2 = sigma * sigma
    eps4 = 4.0 * epsilon
    cutoff2 = cutoff * cutoff
    n_col_tiles = n_pad // tn

    def kernel(pos_ref, box_ref, force_ref, energy_ref):
        # pos_ref: (3, n_pad) VMEM; box_ref: (1, 3) SMEM (box diagonal)
        # force_ref: (3, tm) block per program
        # energy_ref: (8, 128) VMEM accumulator shared across the sequential
        # grid (TPU grid programs run in order on the core)
        i = pl.program_id(0)
        row0 = i * tm
        L = jnp.array(
            [box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]], dtype=jnp.float32
        )
        inv_L = 1.0 / L

        xi = pos_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
        yi = pos_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
        zi = pos_ref[2, pl.ds(row0, tm)].reshape(tm, 1)
        row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        row_valid = row_ids < n

        def body(j, acc):
            fx, fy, fz, e_acc, e_comp = acc
            col0 = j * tn
            xj = pos_ref[0, pl.ds(col0, tn)].reshape(1, tn)
            yj = pos_ref[1, pl.ds(col0, tn)].reshape(1, tn)
            zj = pos_ref[2, pl.ds(col0, tn)].reshape(1, tn)
            col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
            pair_mask = (
                row_valid
                & (col_ids < n)
                & (row_ids != col_ids)
            )
            coef, e, dx, dy, dz = _lj_tile_math(
                xi, yi, zi, xj, yj, zj, inv_L, L, sigma2, eps4, cutoff2,
                pair_mask, with_energy=with_energy,
                approx_recip=approx_recip,
            )
            fx = fx + jnp.sum(coef * dx, axis=1, keepdims=True)
            fy = fy + jnp.sum(coef * dy, axis=1, keepdims=True)
            fz = fz + jnp.sum(coef * dz, axis=1, keepdims=True)
            if with_energy:
                # structured in-tile reduction: see _tile_energy_sum
                e_acc, e_comp = _kahan_add(
                    e_acc, e_comp, _tile_energy_sum(e)
                )
            return fx, fy, fz, e_acc, e_comp

        zeros = jnp.zeros((tm, 1), dtype=jnp.float32)
        fx, fy, fz, e_acc, e_comp = jax.lax.fori_loop(
            0, n_col_tiles, body,
            (zeros, zeros, zeros, jnp.float32(0.0), jnp.float32(0.0)),
        )
        force_ref[0, :] = fx[:, 0]
        force_ref[1, :] = fy[:, 0]
        force_ref[2, :] = fz[:, 0]

        # per-program partial into its own slot (tree-summed by the
        # wrapper); zero the block on the first program
        @pl.when(i == 0)
        def _():
            energy_ref[...] = jnp.zeros((8, 128), dtype=jnp.float32)

        r0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        c0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slot = i % 1024
        energy_ref[...] = energy_ref[...] + jnp.where(
            (r0 == slot // 128) & (c0 == slot % 128), e_acc - e_comp, 0.0
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "sigma", "epsilon", "cutoff", "tm", "tn",
                     "triangle", "interpret", "with_energy", "approx_recip"),
)
def _lj_dense_raw(
    pos3: jnp.ndarray,  # (3, n_pad) f32
    box_diag: jnp.ndarray,  # (1, 3) f32
    n: int,
    sigma: float,
    epsilon: float,
    cutoff: float,
    tm: int,
    tn: int,
    triangle: bool,
    interpret: bool,
    with_energy: bool = True,
    approx_recip: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n_pad = pos3.shape[1]
    grid = (n_pad // tm,)
    if triangle:
        kernel = _make_triangle_kernel(n, n_pad, tm, sigma, epsilon, cutoff,
                                       with_energy, approx_recip)
        force_spec = pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        kernel = _make_kernel(n, n_pad, tm, tn, sigma, epsilon, cutoff,
                              with_energy, approx_recip)
        force_spec = pl.BlockSpec((3, tm), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    force3, e_part = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            force_spec,
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(15 if triangle else 30) * n_pad * n_pad,
            bytes_accessed=3 * n_pad * 4 * grid[0] + 3 * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pos3, box_diag)
    # per-program partials live in distinct slots; XLA's tree reduce over
    # the (8, 128) block avoids a long sequential f32 accumulation
    e_total = jnp.sum(e_part)
    if triangle:
        # triangle kernel accumulates each unordered pair exactly once
        return force3, e_total
    # square kernel visits pairs from both sides; energy double-counts
    return force3, 0.5 * e_total


class LJDensePallas:
    """Callable wrapper: fused dense LJ force+energy for a fixed (N, params).

    >>> op = LJDensePallas(n=4000, sigma=0.34, epsilon=0.99579, cutoff=1.02)
    >>> F, E = op.force_energy(positions, box_vectors)   # (N,3), ()
    >>> E = op.energy(positions, box_vectors)            # differentiable
    """

    def __init__(self, n: int, sigma: float, epsilon: float, cutoff: float,
                 tm: int = 256, tn: int = 512, triangle: bool = True,
                 interpret: Optional[bool] = None,
                 n_pad: Optional[int] = None):
        self.n = n
        self.sigma = float(sigma)
        self.epsilon = float(epsilon)
        self.cutoff = float(cutoff)
        # pad so both tile sizes divide n_pad; callers may request extra
        # padding (e.g. the sharded path needs n_pad % (devices*tm) == 0)
        self.n_pad = _round_up(n_pad if n_pad is not None else n,
                               max(tm, tn))
        self.tm = tm
        self.tn = tn
        self.triangle = triangle
        if interpret is None:
            # Pallas TPU kernels run interpreted on CPU backends (tests/CI).
            interpret = jax.default_backend() != "tpu"
        if not interpret and (tm < 128 or tn < 128):
            # Mosaic requires >=128-lane tiles on hardware.
            tm = max(tm, 128)
            tn = max(tn, 128)
            self.n_pad = _round_up(self.n_pad, max(tm, tn))
            self.tm, self.tn = tm, tn

        n_, s_, e_, c_, tm_, tn_, npad_ = (
            self.n, self.sigma, self.epsilon, self.cutoff, tm, tn, self.n_pad
        )
        tri_, interp_ = triangle, interpret

        def fe(positions, box_vectors):
            pos3 = jnp.zeros((3, npad_), dtype=jnp.float32)
            pos3 = pos3.at[:, :n_].set(positions.T.astype(jnp.float32))
            box_diag = jnp.diagonal(box_vectors).reshape(1, 3).astype(
                jnp.float32
            )
            force3, energy = _lj_dense_raw(
                pos3, box_diag, n_, s_, e_, c_, tm_, tn_, tri_, interp_
            )
            return force3[:, :n_].T, energy

        self._fe = fe

        def force_only(positions, box_vectors, approx_recip: bool = True):
            """Force without the energy math (the stepping hot path)."""
            pos3 = jnp.zeros((3, npad_), dtype=jnp.float32)
            pos3 = pos3.at[:, :n_].set(positions.T.astype(jnp.float32))
            box_diag = jnp.diagonal(box_vectors).reshape(1, 3).astype(
                jnp.float32
            )
            force3, _ = _lj_dense_raw(
                pos3, box_diag, n_, s_, e_, c_, tm_, tn_, tri_, interp_,
                with_energy=False, approx_recip=approx_recip,
            )
            return force3[:, :n_].T

        self.force_only = force_only

        def force_only_t(pos3, box_diag, approx_recip: bool = True):
            """Force in the native (3, n_pad) layout: no pad/transpose.

            ``pos3`` is (3, n_pad) with padding columns beyond n; returns the
            (3, n_pad) force (padding columns zero).  This is the zero-copy
            hot path used by the fast runners.
            """
            force3, _ = _lj_dense_raw(
                pos3, box_diag, n_, s_, e_, c_, tm_, tn_, tri_, interp_,
                with_energy=False, approx_recip=approx_recip,
            )
            return force3

        def force_energy_t(pos3, box_diag):
            return _lj_dense_raw(
                pos3, box_diag, n_, s_, e_, c_, tm_, tn_, tri_, interp_
            )

        self.force_only_t = force_only_t
        self.force_energy_t = force_energy_t

        def pad_positions(positions):
            pos3 = jnp.zeros((3, npad_), dtype=jnp.float32)
            return pos3.at[:, :n_].set(positions.T.astype(jnp.float32))

        self.pad_positions = pad_positions
        self.unpad = lambda a3: a3[:, :n_].T

        # custom_vjp energy: gradient is exactly -force (analytic LJ).
        @jax.custom_vjp
        def energy_fn(positions, box_vectors):
            return fe(positions, box_vectors)[1]

        def energy_fwd(positions, box_vectors):
            F, E = fe(positions, box_vectors)
            return E, F

        def energy_bwd(F, g):
            # dE/dx = -F; box gradient not propagated (barostat moves treat
            # the box via the scaling relation, not via autodiff).
            return (-g * F, None)

        energy_fn.defvjp(energy_fwd, energy_bwd)
        self.energy = energy_fn

    def force_energy(self, positions, box_vectors):
        return self._fe(positions, box_vectors)

    def force(self, positions, box_vectors):
        return self._fe(positions, box_vectors)[0]
