"""Particle-axis (spatial) sharding of the pair stage across a TPU mesh.

SURVEY.md section 2 maps the reference's missing sequence-parallel analogue
onto MD: "tile the N x N interaction matrix across devices and reduce
partial energies/forces" -- the scaling axis is the particle count.  This
module implements exactly that for the dense LJ kernel:

* positions are replicated (an (3, N) array is tiny -- 1.2 MB at N=100k),
* the *row axis* of the interaction matrix is sharded: each device runs the
  fused Pallas square kernel for its row block against all columns,
* forces come out with the particle axis sharded across the mesh and no
  collective in the hot loop (energies, when needed, come from the
  single-chip kernel or a separate reduction -- the force is what the
  integrator consumes every step).

This is the right decomposition for N >= ~50k where one chip's N^2 no longer
fits the step budget; it composes with replica parallelism by nesting mesh
axes (replica x spatial).
"""

from __future__ import annotations

from dataclasses import dataclass as _dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from ..ops.lj_dense import LJDensePallas, _lj_tile_math


def _make_row_slab_force(n, n_pad, rows_per_dev, tm, sigma, epsilon, cutoff,
                         interpret, with_energy: bool = False):
    """Per-device fused kernel: (3, rows_per_dev) row slab vs all columns.

    Returns ``kernel_fn(rows3, pos3_full, box_diag, row_offset) -> (3,
    rows_per_dev) forces`` -- the building block shared by the sharded
    force and the spatial MD runner.  With ``with_energy`` an extra
    scalar output carries this slab's pair-energy sum; every unordered
    pair is visited by BOTH owners' row slabs, so the caller halves the
    psum over the mesh.
    """
    sigma2, eps4, cutoff2 = sigma * sigma, 4.0 * epsilon, cutoff * cutoff

    def kernel_fn(rows3, pos3, box_diag, row_offset):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_col_tiles = n_pad // tm

        def kernel(rows_ref, pos_ref, box_ref, off_ref, force_ref,
                   *maybe_e_ref):
            e_ref = maybe_e_ref[0] if with_energy else None
            i = pl.program_id(0)
            row0 = i * tm
            Lx = box_ref[0, 0]
            Ly = box_ref[0, 1]
            Lz = box_ref[0, 2]
            off = off_ref[0, 0]
            xi = rows_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
            yi = rows_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
            zi = rows_ref[2, pl.ds(row0, tm)].reshape(tm, 1)
            gids = off + row0 + jax.lax.broadcasted_iota(
                jnp.int32, (tm, 1), 0
            )
            rvalid = gids < n

            if with_energy:
                @pl.when(i == 0)
                def _():
                    e_ref[0, 0] = jnp.float32(0.0)

            def body(j, acc):
                if with_energy:
                    fx, fy, fz, et = acc
                else:
                    fx, fy, fz = acc
                    et = None
                col0 = j * tm
                xj = pos_ref[0, pl.ds(col0, tm)].reshape(1, tm)
                yj = pos_ref[1, pl.ds(col0, tm)].reshape(1, tm)
                zj = pos_ref[2, pl.ds(col0, tm)].reshape(1, tm)
                cid = col0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tm), 1
                )
                pm = rvalid & (cid < n) & (gids != cid)
                # shared semantic tile math (ops/lj_dense._lj_tile_math):
                # min-image fold, clamp, f32-exact Newton reciprocal, coef
                coef, e, dx, dy, dz = _lj_tile_math(
                    xi, yi, zi, xj, yj, zj,
                    (1.0 / Lx, 1.0 / Ly, 1.0 / Lz), (Lx, Ly, Lz),
                    sigma2, eps4, cutoff2, pm,
                    with_energy=with_energy, approx_recip=False,
                )
                if with_energy:
                    et = et + jnp.sum(e)
                fx = fx + jnp.sum(coef * dx, axis=1, keepdims=True)
                fy = fy + jnp.sum(coef * dy, axis=1, keepdims=True)
                fz = fz + jnp.sum(coef * dz, axis=1, keepdims=True)
                return (fx, fy, fz, et) if with_energy else (fx, fy, fz)

            z = jnp.zeros((tm, 1), jnp.float32)
            init = (
                (z, z, z, jnp.float32(0.0)) if with_energy else (z, z, z)
            )
            out = jax.lax.fori_loop(0, n_col_tiles, body, init)
            fx, fy, fz = out[0:3]
            force_ref[0, pl.ds(row0, tm)] = fx[:, 0]
            force_ref[1, pl.ds(row0, tm)] = fy[:, 0]
            force_ref[2, pl.ds(row0, tm)] = fz[:, 0]
            if with_energy:
                e_ref[0, 0] = e_ref[0, 0] + out[3]

        out_specs = pl.BlockSpec((3, rows_per_dev), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((3, rows_per_dev), jnp.float32)
        if with_energy:
            out_specs = [out_specs,
                         pl.BlockSpec((1, 1), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        outs = pl.pallas_call(
            kernel,
            grid=(rows_per_dev // tm,),
            in_specs=[
                pl.BlockSpec((3, rows_per_dev), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(rows3, pos3, box_diag, row_offset)
        return (outs[0], outs[1][0, 0]) if with_energy else outs

    return kernel_fn


def _spatial_padding(n: int, n_dev: int, tm: int) -> int:
    import math

    base_pad = ((n + tm - 1) // tm) * tm
    return int(math.ceil(base_pad / (n_dev * tm)) * n_dev * tm)


def make_sharded_lj_force(
    mesh: Mesh,
    n: int,
    sigma: float,
    epsilon: float,
    cutoff: float,
    axis_name: str = "replica",
    tm: int = 256,
    interpret: Optional[bool] = None,
) -> Callable:
    """Build ``force(pos3, box_diag) -> force3`` with the particle axis
    sharded over ``mesh``.

    ``pos3`` is the (3, n_pad) layout with ``n_pad == force.n_pad`` (use
    ``force.op.pad_positions``, which is built with the mesh-compatible
    padding).  The returned (3, n_pad) force carries its particle axis
    sharded across the mesh; slice ``[:, :n].T`` for the host view.
    """
    from jax import shard_map

    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Padding must satisfy both the tile and the per-device slab constraints;
    # pass it to the op so its pad/unpad helpers agree with the sharded shape.
    n_pad = _spatial_padding(n, n_dev, tm)
    op = LJDensePallas(n, sigma, epsilon, cutoff, tm=tm, tn=tm,
                       triangle=False, interpret=interpret, n_pad=n_pad)
    n_pad = op.n_pad
    rows_per_dev = n_pad // n_dev
    kernel_fn = _make_row_slab_force(n, n_pad, rows_per_dev, tm, sigma,
                                     epsilon, cutoff, interpret)

    P = PartitionSpec

    def sharded(pos3, box_diag):
        def per_device(rows3, pos3_full, box_diag):
            idx = jax.lax.axis_index(axis_name)
            off = (idx * rows_per_dev).astype(jnp.int32).reshape(1, 1)
            return kernel_fn(rows3, pos3_full, box_diag, off)

        f = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(), P()),
            out_specs=P(None, axis_name),
            check_vma=False,
        )
        return f(pos3, pos3, box_diag)

    jitted = jax.jit(sharded)

    def force(pos3, box_diag):
        """(3, n_pad) padded positions -> (3, n_pad) force, row-sharded."""
        return jitted(pos3, box_diag)

    force.op = op
    force.n_pad = n_pad
    force.rows_per_dev = rows_per_dev

    # ---- differentiable sharded energy (grad(energy) == -force on the
    # particle-axis-sharded path too; same custom-VJP scheme as the
    # single-chip engines, reference grad-force contract
    # chiron/potential.py:21-24) ----
    kernel_fe = _make_row_slab_force(n, n_pad, rows_per_dev, tm, sigma,
                                     epsilon, cutoff, interpret,
                                     with_energy=True)

    def sharded_fe(pos3, box_diag):
        def per_device(rows3, pos3_full, box_diag):
            idx = jax.lax.axis_index(axis_name)
            off = (idx * rows_per_dev).astype(jnp.int32).reshape(1, 1)
            f, e = kernel_fe(rows3, pos3_full, box_diag, off)
            # every unordered pair is computed by both owners' slabs
            return f, 0.5 * jax.lax.psum(e, axis_name)

        f = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(), P()),
            out_specs=(P(None, axis_name), P()),
            check_vma=False,
        )
        return f(pos3, pos3, box_diag)

    jitted_fe = jax.jit(sharded_fe)

    def force_energy(pos3, box_diag):
        """(3, n_pad) padded positions -> (row-sharded force, total
        energy replicated over the mesh)."""
        return jitted_fe(pos3, box_diag)

    def energy_differentiable(pos3, box_diag):
        """Total truncated-LJ energy over the mesh as a DIFFERENTIABLE
        function of positions: one fused sharded pass computes both the
        value and (as its custom-VJP gradient) the exact analytic
        sharded force."""
        from ..ops.diff import energy_with_force_gradient

        return energy_with_force_gradient(
            lambda p: jitted_fe(p, box_diag), pos3,
        )

    force.force_energy = force_energy
    force.energy_differentiable = energy_differentiable
    return force


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "step", "box_diag", "key"],
    meta_fields=[],
)
@_dataclass
class SpatialCarry:
    """Carry of the spatially-sharded Langevin runner (global arrays; the
    particle axis is re-sharded by ``shard_map`` at every ``run`` call)."""

    x: jnp.ndarray          # (3, n_pad)
    v: jnp.ndarray          # (3, n_pad)
    F: jnp.ndarray          # (3, n_pad)
    step: jnp.ndarray       # (1, 1) int32 cumulative steps (noise counter)
    box_diag: jnp.ndarray   # (1, 3)
    key: jnp.ndarray        # base PRNG key (fold_in(step) per O-step)


def make_spatial_lj_runner(
    mesh: Mesh,
    potential,
    n_particles: int,
    temperature,
    timestep,
    collision_rate=None,
    topology=None,
    axis_name: str = "spatial",
    tm: int = 256,
    interpret: Optional[bool] = None,
):
    """BAOAB Langevin with the particle axis sharded across a device mesh.

    The single-replica large-N engine (SURVEY.md section 5 "long-context
    analogue"): each device owns a contiguous row slab of the particle
    axis, integrates its slab, and the whole step is one ``shard_map``-ed
    ``lax.scan`` -- the only inter-chip traffic is ONE ``all_gather`` of
    the (3, n_pad) positions per step (1.5 MB at N=131k: microseconds over
    ICI), so scaling to a pod slice is compute-bound.

    O-step noise is drawn from ``fold_in(key, step)`` over the FULL
    particle axis and sliced per device, so the noise stream is identical
    across mesh sizes: a 1-device and an 8-device run follow the same
    trajectory up to float rounding (XLA may fuse the kick arithmetic
    differently per shard shape, so exact bitwise parity is not promised).

    Masses may be heterogeneous (no spatial sort -- particle order is
    preserved).  Returns a runner with init/run/positions/velocities/
    energy, like the single-chip engines (chiron_tpu.runtime).
    """
    from jax import shard_map

    from .. import units

    if topology is None:
        topology = potential.topology
    n = n_particles
    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    if collision_rate is None:
        gamma = 1.0
    else:
        gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)
    a_coef = float(np.exp(-gamma * dt))
    b_coef = float(np.sqrt(1.0 - np.exp(-2.0 * gamma * dt)))

    n_pad = _spatial_padding(n, n_dev, tm)
    rows_per_dev = n_pad // n_dev
    op = LJDensePallas(n, potential.sigma, potential.epsilon,
                       potential.cutoff, tm=tm, tn=tm, triangle=False,
                       interpret=interpret, n_pad=n_pad)
    kernel_fn = _make_row_slab_force(
        n, n_pad, rows_per_dev, tm, potential.sigma, potential.epsilon,
        potential.cutoff, interpret,
    )
    masses = np.asarray(topology.masses(), dtype=np.float32)
    m_pad = np.ones((1, n_pad), np.float32)
    m_pad[0, :n] = masses
    minv_full = jnp.asarray(1.0 / m_pad)
    sigv_full = jnp.sqrt(kT / jnp.asarray(m_pad))

    P = PartitionSpec

    def _chain(n_steps: int):
        def per_device(x_rows, v_rows, F_rows, minv_r, sigv_r, step0,
                       box_diag, key):
            idx = jax.lax.axis_index(axis_name)
            off = (idx * rows_per_dev).astype(jnp.int32)
            off11 = off.reshape(1, 1)
            Lcol = box_diag.reshape(3, 1)

            def body(carry, s):
                x_rows, v_rows, F_rows = carry
                step = step0[0, 0] + s
                # B (half kick) + A (half drift)
                v1 = v_rows + (0.5 * dt) * F_rows * minv_r
                x1 = x_rows + (0.5 * dt) * v1
                # O: noise over the FULL axis, sliced per device, so the
                # stream is independent of the mesh size
                nkey = jax.random.fold_in(key, step)
                noise = jax.random.normal(nkey, (3, n_pad), jnp.float32)
                noise_r = jax.lax.dynamic_slice(
                    noise, (0, off), (3, rows_per_dev)
                )
                v2 = a_coef * v1 + b_coef * sigv_r * noise_r
                # A (half drift) + wrap
                x2 = x1 + (0.5 * dt) * v2
                x2 = x2 - jnp.floor(x2 / Lcol) * Lcol
                # gather the new positions, recompute this slab's forces
                x_full = jax.lax.all_gather(
                    x2, axis_name, axis=1, tiled=True
                )
                F_new = kernel_fn(x2, x_full, box_diag, off11)
                # B (half kick)
                v3 = v2 + (0.5 * dt) * F_new * minv_r
                return (x2, v3, F_new), None

            (x_rows, v_rows, F_rows), _ = jax.lax.scan(
                body, (x_rows, v_rows, F_rows), jnp.arange(n_steps)
            )
            return x_rows, v_rows, F_rows

        return shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(None, axis_name),
                      P(None, axis_name), P(None, axis_name),
                      P(None, axis_name), P(), P(), P()),
            out_specs=(P(None, axis_name), P(None, axis_name),
                       P(None, axis_name)),
            check_vma=False,
        )

    def _force_full(x_full, box_diag):
        def per_device(x_rows, x_all, box_diag):
            idx = jax.lax.axis_index(axis_name)
            off11 = (idx * rows_per_dev).astype(jnp.int32).reshape(1, 1)
            return kernel_fn(x_rows, x_all, box_diag, off11)

        f = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(None, axis_name), P(), P()),
            out_specs=P(None, axis_name), check_vma=False,
        )
        return f(x_full, x_full, box_diag)

    class SpatialRunner:
        def __init__(self):
            self.op = op
            self.n_pad = n_pad
            self.rows_per_dev = rows_per_dev
            self._chains = {}

        def init(self, positions, box_vectors, seed: int = 0,
                 velocities=None) -> SpatialCarry:
            x3 = op.pad_positions(jnp.asarray(positions, jnp.float32))
            box_diag = jnp.diagonal(
                jnp.asarray(box_vectors, jnp.float32)
            ).reshape(1, 3)
            key = jax.random.PRNGKey(seed)
            vkey, key = jax.random.split(key)
            if velocities is None:
                v3 = sigv_full * jax.random.normal(
                    vkey, (3, n_pad), jnp.float32
                )
            else:
                v3 = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
                    jnp.asarray(velocities, jnp.float32).T
                )
            F3 = jax.jit(_force_full)(x3, box_diag)
            return SpatialCarry(
                x=x3, v=v3, F=F3,
                step=jnp.zeros((1, 1), jnp.int32),
                box_diag=box_diag, key=key,
            )

        def run(self, state: SpatialCarry, n_steps: int) -> SpatialCarry:
            if n_steps not in self._chains:
                self._chains[n_steps] = jax.jit(_chain(n_steps))
            x, v, F = self._chains[n_steps](
                state.x, state.v, state.F, minv_full, sigv_full,
                state.step, state.box_diag, state.key,
            )
            return SpatialCarry(
                x=x, v=v, F=F, step=state.step + n_steps,
                box_diag=state.box_diag, key=state.key,
            )

        def positions(self, state: SpatialCarry):
            return state.x[:, :n].T

        def velocities(self, state: SpatialCarry):
            return state.v[:, :n].T

        def energy(self, state: SpatialCarry):
            # one-shot diagnostic through the dense op (O(N^2) single chip)
            return op.force_energy_t(state.x, state.box_diag)[1]

    return SpatialRunner()


def _make_row_band_force(n, n_pad, rows_per_dev, tm, w, sigma, epsilon,
                         cutoff, interpret):
    """Per-device BANDED row-slab kernel: each device's rows against the
    cyclic x-band [-w, +w] of the globally x-sorted particle axis.

    Both band directions are evaluated (no Newton reaction writes), so
    devices never accumulate into each other's rows -- 2x the pair math
    of the single-chip band kernel (ops/lj_band.py) in exchange for zero
    cross-device reduction; per-device work is O(N w / D) instead of the
    dense slab kernel's O(N^2 / D).
    """
    sigma2, eps4, cutoff2 = sigma * sigma, 4.0 * epsilon, cutoff * cutoff
    n_tiles = n_pad // tm
    # tiles covering [-w, +w] around the row tile.  The cyclic rank
    # distance runs over the REAL n ranks, but tiles index the PADDED
    # array: a wrap-around partner sits up to (n_pad - n) extra slots
    # away, and _spatial_padding's gap can span MANY tiles (up to
    # n_dev*tm - 1 ranks) -- unlike the single-chip band kernel whose
    # gap is < tm.  Window the full padded distance or wrap pairs are
    # silently dropped.
    K = min((w + (n_pad - n) + tm - 1) // tm + 2, n_tiles)
    n_band_tiles = min(2 * K + 1, n_tiles)

    def kernel_fn(pos3, box_diag, row_offset):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(pos_ref, box_ref, off_ref, force_ref):
            i = pl.program_id(0)
            Lx = box_ref[0, 0]
            Ly = box_ref[0, 1]
            Lz = box_ref[0, 2]
            off = off_ref[0, 0]
            # off is idx*rows_per_dev (a tm multiple by _spatial_padding);
            # Mosaic needs the hint to prove lane-aligned dynamic slices
            row0 = pl.multiple_of(off + i * tm, tm)
            rt = row0 // tm
            xi = pos_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
            yi = pos_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
            zi = pos_ref[2, pl.ds(row0, tm)].reshape(tm, 1)
            rid = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
            rvalid = rid < n

            def body(k, acc):
                fx, fy, fz = acc
                jt = jax.lax.rem(rt + k - K + 2 * n_tiles, n_tiles)
                col0 = pl.multiple_of(jt * tm, tm)
                xj = pos_ref[0, pl.ds(col0, tm)].reshape(1, tm)
                yj = pos_ref[1, pl.ds(col0, tm)].reshape(1, tm)
                zj = pos_ref[2, pl.ds(col0, tm)].reshape(1, tm)
                cid = col0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tm), 1
                )
                # cyclic rank distance over the REAL n ranks; both band
                # directions, self excluded
                delta = jax.lax.rem(cid - rid + n, n)
                pm = (
                    rvalid & (cid < n)
                    & (delta >= 1)
                    & ((delta <= w) | (delta >= n - w))
                )
                # shared semantic tile math (ops/lj_dense._lj_tile_math)
                coef, _, dx, dy, dz = _lj_tile_math(
                    xi, yi, zi, xj, yj, zj,
                    (1.0 / Lx, 1.0 / Ly, 1.0 / Lz), (Lx, Ly, Lz),
                    sigma2, eps4, cutoff2, pm,
                    with_energy=False, approx_recip=False,
                )
                fx = fx + jnp.sum(coef * dx, axis=1, keepdims=True)
                fy = fy + jnp.sum(coef * dy, axis=1, keepdims=True)
                fz = fz + jnp.sum(coef * dz, axis=1, keepdims=True)
                return fx, fy, fz

            z = jnp.zeros((tm, 1), jnp.float32)
            fx, fy, fz = jax.lax.fori_loop(0, n_band_tiles, body, (z, z, z))
            force_ref[0, pl.ds(i * tm, tm)] = fx[:, 0]
            force_ref[1, pl.ds(i * tm, tm)] = fy[:, 0]
            force_ref[2, pl.ds(i * tm, tm)] = fz[:, 0]

        return pl.pallas_call(
            kernel,
            grid=(rows_per_dev // tm,),
            in_specs=[
                pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((3, rows_per_dev), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, rows_per_dev), jnp.float32),
            interpret=interpret,
        )(pos3, box_diag, row_offset)

    return kernel_fn


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "step", "box_diag", "key", "overflowed"],
    meta_fields=[],
)
@_dataclass
class SpatialBandCarry:
    """Carry of the banded spatial runner (globally x-sorted layout;
    replicated arrays -- only the band force is sharded per run call)."""

    x: jnp.ndarray          # (3, n_pad), x-sorted
    v: jnp.ndarray          # (3, n_pad)
    F: jnp.ndarray          # (3, n_pad)
    step: jnp.ndarray       # (1, 1) int32
    box_diag: jnp.ndarray   # (1, 3)
    key: jnp.ndarray        # base PRNG key
    overflowed: jnp.ndarray  # () bool: band capacity / drift violation


def make_spatial_band_lj_runner(
    mesh: Mesh,
    potential,
    n_particles: int,
    temperature,
    timestep,
    collision_rate=None,
    topology=None,
    axis_name: str = "spatial",
    tm: int = 256,
    margin: float = 0.15,
    segment_steps: int = 25,
    interpret: Optional[bool] = None,
):
    """Large-N spatially-sharded Langevin: banded force per device.

    The production variant of :func:`make_spatial_lj_runner` for
    N >> 10^4: the particle axis is globally x-sorted every
    ``segment_steps`` steps (replicated -- the sort is cheap next to the
    force at this scale), each device evaluates its contiguous row slab
    against the cyclic x-band of width W, and the only per-step traffic
    is the positions/forces all_gather.  Per-device pair work is
    O(N W / D) -- the sharded analogue of the single-chip band engine
    (ops/lj_band.py), with both band directions computed so no
    cross-device force reduction is needed.

    The band-runner invariants carry over: W is calibrated with
    headroom at init, and ``state.overflowed`` latches if a re-sort
    needs a wider band or any particle's x drift within a segment
    exceeds ``margin``.  Requires identical masses (sorting permutes
    particle identity).
    """
    from jax import shard_map

    from .. import units
    from ..ops.lj_band import band_width_needed, sort_by_x

    if topology is None:
        topology = potential.topology
    n = n_particles
    masses_host = np.asarray(topology.masses())
    if not np.allclose(masses_host, masses_host[0]):
        raise ValueError(
            "the banded spatial runner sorts particles and therefore "
            "requires identical masses"
        )
    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret:
        tm = max(tm, 128)
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = 1.0 if collision_rate is None else units.strip_md(
        collision_rate, 1.0 / units.picosecond
    )
    a_coef = float(np.exp(-gamma * dt))
    b_coef = float(np.sqrt(1.0 - np.exp(-2.0 * gamma * dt)))
    reach = potential.cutoff + 2.0 * margin

    n_pad = _spatial_padding(n, n_dev, tm)
    rows_per_dev = n_pad // n_dev
    m0 = float(masses_host[0])
    minv = jnp.float32(1.0 / m0)
    sigv = jnp.float32(np.sqrt(kT / m0))
    P = PartitionSpec

    class SpatialBandRunner:
        def __init__(self):
            self.n_pad = n_pad
            self.rows_per_dev = rows_per_dev
            self.w = None       # resolved at init from the data
            self._chains = {}
            self._energy_op = None

        def init(self, positions, box_vectors, seed: int = 0
                 ) -> SpatialBandCarry:
            # a re-init recalibrates w and rebuilds the kernel: drop any
            # chains traced against the previous system
            self._chains = {}
            self._energy_op = None
            x = jnp.asarray(positions, jnp.float32).T  # (3, N)
            x3 = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(x)
            box_diag = jnp.diagonal(
                jnp.asarray(box_vectors, jnp.float32)
            ).reshape(1, 3)
            Lx = float(box_diag[0, 0])
            x3s, _ = sort_by_x(x3, (), n)
            xs_key = jnp.where(
                jnp.arange(n_pad) < n, x3s[0], jnp.float32(3.0e38)
            )
            w_data = int(band_width_needed(xs_key, n, reach, Lx))
            self.w = min(
                ((int(w_data * 1.25) + 8 + 7) // 8) * 8, n_pad - 1
            )
            self._kernel = _make_row_band_force(
                n, n_pad, rows_per_dev, tm, self.w, potential.sigma,
                potential.epsilon, potential.cutoff, interpret,
            )
            key = jax.random.PRNGKey(seed)
            vkey, key = jax.random.split(key)
            v3 = sigv * jax.random.normal(vkey, (3, n_pad), jnp.float32)
            F3 = self._force_full(x3s, box_diag)
            return SpatialBandCarry(
                x=x3s, v=v3, F=F3,
                step=jnp.zeros((1, 1), jnp.int32),
                box_diag=box_diag, key=key,
                overflowed=jnp.asarray(False),
            )

        def _force_full(self, x_full, box_diag):
            kernel_fn = self._kernel

            def per_device(x_all, box_diag):
                idx = jax.lax.axis_index(axis_name)
                off11 = (idx * rows_per_dev).astype(jnp.int32).reshape(1, 1)
                F_rows = kernel_fn(x_all, box_diag, off11)
                return jax.lax.all_gather(
                    F_rows, axis_name, axis=1, tiled=True
                )

            f = shard_map(
                per_device, mesh=mesh, in_specs=(P(), P()),
                out_specs=P(), check_vma=False,
            )
            return jax.jit(f)(x_full, box_diag)

        def _chain(self, n_steps: int):
            kernel_fn = self._kernel
            S = segment_steps
            n_seg, rem = divmod(n_steps, S)
            assert rem == 0
            valid = (jnp.arange(n_pad) < n).astype(jnp.float32)

            def per_device(x, v, F, step0, box_diag, key, over):
                idx = jax.lax.axis_index(axis_name)
                off = (idx * rows_per_dev).astype(jnp.int32)
                off11 = off.reshape(1, 1)
                Lcol = box_diag.reshape(3, 1)
                Lx = box_diag[0, 0]

                def segment(carry, seg_i):
                    x, v, F, over = carry
                    xs, payload = sort_by_x(
                        x, (v[0], v[1], v[2], F[0], F[1], F[2]), n
                    )
                    v2 = jnp.stack(payload[0:3])
                    F2 = jnp.stack(payload[3:6])
                    xs_key = jnp.where(
                        jnp.arange(n_pad) < n, xs[0], jnp.float32(3.0e38)
                    )
                    w_need = band_width_needed(xs_key, n, reach, Lx)
                    over = over | (w_need > self.w)
                    ref_x = xs[0]

                    def step(c, s):
                        x, v, F = c
                        gstep = step0[0, 0] + seg_i * S + s
                        v1 = v + (0.5 * dt) * F * minv
                        x1 = x + (0.5 * dt) * v1
                        nkey = jax.random.fold_in(key, gstep)
                        noise = jax.random.normal(
                            nkey, (3, n_pad), jnp.float32
                        )
                        v2 = a_coef * v1 + b_coef * sigv * noise
                        x2 = x1 + (0.5 * dt) * v2
                        x2 = x2 - jnp.floor(x2 / Lcol) * Lcol
                        F_rows = kernel_fn(x2, box_diag, off11)
                        F_new = jax.lax.all_gather(
                            F_rows, axis_name, axis=1, tiled=True
                        )
                        v3 = v2 + (0.5 * dt) * F_new * minv
                        return (x2, v3, F_new), None

                    (xo, vo, Fo), _ = jax.lax.scan(
                        step, (xs, v2, F2), jnp.arange(S)
                    )
                    # band validity: per-particle x drift within the
                    # segment must stay under the margin (min-imaged)
                    dx = xo[0] - ref_x
                    dx = dx - Lx * jnp.round(dx / Lx)
                    over = over | (
                        jnp.max(jnp.abs(dx) * valid) > margin
                    ) | ~jnp.all(jnp.isfinite(xo[0] * valid))
                    return (xo, vo, Fo, over), None

                (x, v, F, over), _ = jax.lax.scan(
                    segment, (x, v, F, over), jnp.arange(n_seg)
                )
                return x, v, F, over

            return shard_map(
                per_device, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            )

        def run(self, state: SpatialBandCarry,
                n_steps: int) -> SpatialBandCarry:
            S = segment_steps
            n_whole = (n_steps // S) * S
            if n_steps % S:
                raise ValueError(
                    f"n_steps must be a multiple of segment_steps={S}"
                )
            if n_whole not in self._chains:
                self._chains[n_whole] = jax.jit(self._chain(n_whole))
            x, v, F, over = self._chains[n_whole](
                state.x, state.v, state.F, state.step, state.box_diag,
                state.key, state.overflowed,
            )
            return SpatialBandCarry(
                x=x, v=v, F=F, step=state.step + n_whole,
                box_diag=state.box_diag, key=state.key, overflowed=over,
            )

        def check(self, state: SpatialBandCarry):
            if bool(state.overflowed):
                raise RuntimeError(
                    "banded spatial runner invariant violated (band "
                    "capacity or per-segment x drift) -- increase margin "
                    "or reduce segment_steps and re-run"
                )

        def positions(self, state: SpatialBandCarry):
            return state.x[:, :n].T

        def velocities(self, state: SpatialBandCarry):
            return state.v[:, :n].T

        def energy(self, state: SpatialBandCarry):
            if getattr(self, "_energy_op", None) is None:
                from ..ops.lj_dense import LJDensePallas

                self._energy_op = LJDensePallas(
                    n, potential.sigma, potential.epsilon,
                    potential.cutoff, tm=tm, tn=tm, triangle=False,
                    interpret=interpret, n_pad=n_pad,
                )
            return self._energy_op.force_energy_t(
                state.x, state.box_diag
            )[1]

    return SpatialBandRunner()
