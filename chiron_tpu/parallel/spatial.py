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

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from ..ops.lj_dense import LJDensePallas


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
    from jax.experimental.shard_map import shard_map

    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Padding must satisfy both the tile and the per-device slab constraints;
    # pass it to the op so its pad/unpad helpers agree with the sharded shape.
    import math

    base_pad = ((n + tm - 1) // tm) * tm
    n_pad = int(math.ceil(base_pad / (n_dev * tm)) * n_dev * tm)
    op = LJDensePallas(n, sigma, epsilon, cutoff, tm=tm, tn=tm,
                       triangle=False, interpret=interpret, n_pad=n_pad)
    n_pad = op.n_pad
    rows_per_dev = n_pad // n_dev

    sigma2, eps4, cutoff2 = sigma * sigma, 4.0 * epsilon, cutoff * cutoff

    def kernel_fn(rows3, pos3, box_diag, row_offset):
        """(3, rows_per_dev) row slab vs all columns, fused."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_col_tiles = n_pad // tm

        def kernel(rows_ref, pos_ref, box_ref, off_ref, force_ref):
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

            def body(j, acc):
                fx, fy, fz = acc
                col0 = j * tm
                xj = pos_ref[0, pl.ds(col0, tm)].reshape(1, tm)
                yj = pos_ref[1, pl.ds(col0, tm)].reshape(1, tm)
                zj = pos_ref[2, pl.ds(col0, tm)].reshape(1, tm)
                cid = col0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tm), 1
                )
                pm = rvalid & (cid < n) & (gids != cid)
                dx = xi - xj
                dy = yi - yj
                dz = zi - zj
                dx = dx - Lx * jnp.floor(dx / Lx + 0.5)
                dy = dy - Ly * jnp.floor(dy / Ly + 0.5)
                dz = dz - Lz * jnp.floor(dz / Lz + 0.5)
                r2 = dx * dx + dy * dy + dz * dz
                m = (r2 < cutoff2) & pm
                r2s = jnp.maximum(r2, 1e-4 * sigma2)
                inv = 1.0 / r2s
                i2 = sigma2 * inv
                i6 = i2 * i2 * i2
                coef = jnp.where(
                    m, (6.0 * eps4) * (2.0 * i6 * i6 - i6) * inv, 0.0
                )
                fx = fx + jnp.sum(coef * dx, axis=1, keepdims=True)
                fy = fy + jnp.sum(coef * dy, axis=1, keepdims=True)
                fz = fz + jnp.sum(coef * dz, axis=1, keepdims=True)
                return fx, fy, fz

            z = jnp.zeros((tm, 1), jnp.float32)
            fx, fy, fz = jax.lax.fori_loop(0, n_col_tiles, body, (z, z, z))
            force_ref[0, pl.ds(row0, tm)] = fx[:, 0]
            force_ref[1, pl.ds(row0, tm)] = fy[:, 0]
            force_ref[2, pl.ds(row0, tm)] = fz[:, 0]

        return pl.pallas_call(
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
            out_specs=pl.BlockSpec((3, rows_per_dev), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, rows_per_dev), jnp.float32),
            interpret=interpret,
        )(rows3, pos3, box_diag, row_offset)

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
            check_rep=False,
        )
        return f(pos3, pos3, box_diag)

    jitted = jax.jit(sharded)

    def force(pos3, box_diag):
        """(3, n_pad) padded positions -> (3, n_pad) force, row-sharded."""
        return jitted(pos3, box_diag)

    force.op = op
    force.n_pad = n_pad
    force.rows_per_dev = rows_per_dev
    return force
