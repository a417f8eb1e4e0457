"""Zero-overhead simulation runners for production/benchmark use.

The class-based `LangevinIntegrator` carries reference-parity reporting and
unit plumbing; this module exposes the bare compiled core -- build once, then
``run(state, n_steps)`` is a single XLA dispatch regardless of step count.
This is the entry point the benchmark (bench.py) and the graft driver use.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import units
from .integrators import LangevinCarry, make_baoab_step_fn, run_chunk
from .neighbors import NeighborListNsqrd, PairListNsqrd
from .utils import initialize_velocities_md


@dataclass
class LangevinRunner:
    """Compiled Langevin propagator: ``state = runner.run(state, n)``."""

    step_fn: Callable
    energy_fn: Callable
    masses: jnp.ndarray
    temperature_md: float
    pairs: object

    def init(
        self,
        positions,
        box_vectors=None,
        seed: int = 0,
        velocities=None,
    ) -> LangevinCarry:
        """Build the initial carry: velocities, neighbor state, forces."""
        x = jnp.asarray(positions, dtype=jnp.float32)
        box = None if box_vectors is None else jnp.asarray(
            box_vectors, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(seed)
        if velocities is None:
            key, vkey = jax.random.split(key)
            v = initialize_velocities_md(self.temperature_md, self.masses, vkey)
        else:
            v = jnp.asarray(velocities, dtype=jnp.float32)

        from .neighbors import DensePairs as _DensePairs

        if isinstance(self.pairs, (NeighborListNsqrd, PairListNsqrd,
                                   _DensePairs)):
            self.pairs.build(x, box)
            nbr_state = self.pairs.state
        else:
            nbr_state = None

        force_fn = jax.jit(jax.grad(lambda p, s: -self.energy_fn(p, s)))
        return LangevinCarry(
            x=x,
            v=v,
            F=force_fn(x, nbr_state),
            key=key,
            nbr_state=nbr_state,
            box_vectors=box,
            overflowed=jnp.asarray(False),
        )

    def run(self, state: LangevinCarry, n_steps: int) -> LangevinCarry:
        """Advance ``n_steps``; one compiled scan, no host work."""
        return run_chunk(self.step_fn, state, n_steps)

    def energy(self, state: LangevinCarry):
        return self.energy_fn(state.x, state.nbr_state)


def make_fast_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 512,
    exact_forces: bool = False,
) -> LangevinRunner:
    """Optimized LJ Langevin runner using the fused dense Pallas kernel.

    No neighbor list, no rebuild logic: the Pallas kernel evaluates all pairs
    with minimum-image PBC in one fused pass (chiron_tpu.ops.lj_dense).  The
    exact-force custom VJP keeps ``jax.grad`` semantics identical to the
    reference's autodiff force (reference chiron/potential.py:21-24).

    ``exact_forces=False`` (default) uses the VPU fast reciprocal in the
    stepping path (~6e-5 relative force error, far below the Langevin noise
    floor); energies are always computed exactly.
    """
    from .ops.lj_dense import LJDensePallas

    if topology is None:
        topology = potential.topology
    masses = jnp.asarray(topology.masses(), dtype=jnp.float32)[:, None]
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    op = LJDensePallas(
        n=n_particles,
        sigma=potential.sigma,
        epsilon=potential.epsilon,
        cutoff=potential.cutoff,
        tm=tm,
        tn=tm,  # triangle kernel uses square tiles; keep padding minimal
    )
    n_pad = op.n_pad

    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt))
    dt_ = jnp.float32(dt)

    # State lives natively in the kernel's (3, n_pad) layout: the lane axis
    # is the particle axis (full VPU width on every elementwise step op) and
    # the force kernel consumes it with zero copies or transposes.
    m_lane = jnp.ones((1, n_pad), dtype=jnp.float32)
    m_lane = m_lane.at[0, :n_particles].set(
        jnp.asarray(topology.masses(), dtype=jnp.float32)
    )
    sigma_v_lane = jnp.sqrt(kT / m_lane)

    def step_fn(carry: LangevinCarry, _=None):
        key, subkey = jax.random.split(carry.key)
        x, v, F = carry.x, carry.v, carry.F  # all (3, n_pad)
        box_diag = carry.box_vectors  # (1, 3)
        v = v + (dt_ * 0.5) * F / m_lane
        x = x + (dt_ * 0.5) * v
        noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
        v = a * v + b * sigma_v_lane * noise
        x = x + (dt_ * 0.5) * v
        Lcol = box_diag.reshape(3, 1)
        x = x - jnp.floor(x / Lcol) * Lcol  # periodic wrap
        F = op.force_only_t(x, box_diag, approx_recip=not exact_forces)
        v = v + (dt_ * 0.5) * F / m_lane
        return (
            LangevinCarry(
                x=x, v=v, F=F, key=key, nbr_state=None,
                box_vectors=box_diag, overflowed=carry.overflowed,
            ),
            None,
        )

    runner = LangevinRunner(
        step_fn=step_fn,
        energy_fn=lambda x, s: op.energy(x, s),
        masses=masses,
        temperature_md=T,
        pairs=None,
    )

    def init(positions, box_vectors, seed: int = 0, velocities=None):
        x3 = op.pad_positions(jnp.asarray(positions, dtype=jnp.float32))
        box_diag = jnp.diagonal(
            jnp.asarray(box_vectors, dtype=jnp.float32)
        ).reshape(1, 3)
        key = jax.random.PRNGKey(seed)
        if velocities is None:
            key, vkey = jax.random.split(key)
            v3 = sigma_v_lane * jax.random.normal(vkey, (3, n_pad))
        else:
            v3 = op.pad_positions(jnp.asarray(velocities, dtype=jnp.float32))
        F3 = op.force_only_t(x3, box_diag, approx_recip=not exact_forces)
        return LangevinCarry(
            x=x3, v=v3, F=F3, key=key, nbr_state=None, box_vectors=box_diag,
            overflowed=jnp.asarray(False),
        )

    runner.init = init
    runner.energy = lambda state: op.force_energy_t(
        state.x, state.box_vectors
    )[1]
    runner.positions = lambda state: op.unpad(state.x)
    runner.velocities = lambda state: op.unpad(state.v)
    runner.op = op
    return runner


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "key", "ref_x", "box_diag", "overflowed"],
    meta_fields=[],
)
@dataclass
class BandCarry:
    """Carry of the banded large-N runner (x-sorted (3, n_pad) layout)."""

    x: jnp.ndarray
    v: jnp.ndarray
    F: jnp.ndarray
    key: jnp.ndarray
    ref_x: jnp.ndarray  # (n_pad,) x at the last sort (staleness reference)
    box_diag: jnp.ndarray  # (1, 3)
    overflowed: jnp.ndarray  # () bool


def make_band_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 256,
    margin: float = 0.15,
):
    """Banded (x-sorted) LJ Langevin runner for large N (>= ~16k).

    Particles are kept sorted by x; the force kernel evaluates only the
    cyclic rank band that can contain in-cutoff pairs (BENCH.md: 1.7x at
    N=16k, 3.4x at N=65k over the dense kernel).  A ``lax.cond`` inside the
    scan re-sorts the whole state (multi-operand ``lax.sort``) whenever any
    particle's x has drifted past the margin since the last sort.

    NOTE: the particle *order* is an internal degree of freedom -- identical
    LJ particles are permuted by re-sorts.  ``runner.positions(state)``
    returns the current internal order.
    """
    from .ops.lj_band import LJBandPallas, band_width_needed, sort_by_x

    if topology is None:
        topology = potential.topology
    masses_host = topology.masses()
    if not np.allclose(masses_host, masses_host[0]):
        raise ValueError(
            "the banded runner permutes particle order and therefore "
            "requires identical masses"
        )
    mass0 = float(masses_host[0])
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    band = LJBandPallas(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        margin=margin, tm=tm,
    )
    n_pad = band.n_pad
    # matching-padding dense op for pad/unpad helpers + exact energies
    from .ops.lj_dense import LJDensePallas

    dense = LJDensePallas(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        tm=min(512, tm if tm >= 128 else 128), tn=min(512, tm if tm >= 128 else 128),
        n_pad=n_pad,
    )

    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt))
    sigma_v = jnp.float32(np.sqrt(kT / mass0))
    dt_ = jnp.float32(dt)
    m = jnp.float32(mass0)
    n = n_particles
    reach = band.reach
    valid_lane = (jnp.arange(n_pad) < n)

    def make_step_fn(w: int):
        def step(carry: BandCarry, _=None):
            key, subkey = jax.random.split(carry.key)
            x, v, F = carry.x, carry.v, carry.F
            box_diag = carry.box_diag
            Lx = box_diag[0, 0]
            v = v + (dt_ * 0.5) * F / m
            x = x + (dt_ * 0.5) * v
            noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
            v = a * v + b * sigma_v * noise
            x = x + (dt_ * 0.5) * v
            Lcol = box_diag.reshape(3, 1)
            x = x - jnp.floor(x / Lcol) * Lcol

            # staleness: cyclic x drift since the last sort
            dx = x[0] - carry.ref_x
            dx = dx - Lx * jnp.round(dx / Lx)
            stale = jnp.any(jnp.where(valid_lane, jnp.abs(dx), 0.0) >= margin)

            def do_resort(args):
                x, v, overflowed = args
                xs, payloads = sort_by_x(x, (v[0], v[1], v[2]), n)
                v2 = jnp.stack(payloads)
                w_needed = band_width_needed(
                    jnp.where(valid_lane, xs[0], jnp.float32(3.0e38)),
                    n, reach, Lx,
                )
                overflowed = overflowed | (w_needed > w)
                return xs, v2, xs[0], overflowed

            def no_resort(args):
                x, v, overflowed = args
                return x, v, carry.ref_x, overflowed

            x, v, ref_x, overflowed = jax.lax.cond(
                stale, do_resort, no_resort, (x, v, carry.overflowed)
            )
            F = band.force(x, box_diag, approx_recip=True)
            v = v + (dt_ * 0.5) * F / m
            return (
                BandCarry(
                    x=x, v=v, F=F, key=key, ref_x=ref_x, box_diag=box_diag,
                    overflowed=overflowed,
                ),
                None,
            )

        return step

    class BandRunner:
        def init(self, positions, box_vectors, seed: int = 0):
            x3 = dense.pad_positions(jnp.asarray(positions, dtype=jnp.float32))
            box_diag = jnp.diagonal(
                jnp.asarray(box_vectors, dtype=jnp.float32)
            ).reshape(1, 3)
            x3s, _ = sort_by_x(x3, (), n)
            band.calibrate(x3s, float(box_diag[0, 0]))
            self.step_fn = make_step_fn(band.w)
            key = jax.random.PRNGKey(seed)
            key, vkey = jax.random.split(key)
            v3 = sigma_v * jax.random.normal(vkey, (3, n_pad))
            F3 = band.force(x3s, box_diag, approx_recip=True)
            return BandCarry(
                x=x3s, v=v3, F=F3, key=key, ref_x=x3s[0], box_diag=box_diag,
                overflowed=jnp.asarray(False),
            )

        def run(self, state: BandCarry, n_steps: int) -> BandCarry:
            return band_run_chunk(self.step_fn, state, n_steps)

        def energy(self, state: BandCarry):
            return dense.force_energy_t(state.x, state.box_diag)[1]

        def positions(self, state: BandCarry):
            return dense.unpad(state.x)

        def velocities(self, state: BandCarry):
            return dense.unpad(state.v)

    runner = BandRunner()
    runner.band = band
    runner.dense = dense
    return runner


@partial(jax.jit, static_argnames=("step_fn", "n_steps"))
def band_run_chunk(step_fn, carry, n_steps: int):
    carry, _ = jax.lax.scan(step_fn, carry, length=n_steps)
    return carry


def make_langevin_runner(
    potential,
    pairs=None,
    topology=None,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
) -> LangevinRunner:
    """Build a compiled BAOAB runner for ``potential`` (+ optional pair spec)."""
    if topology is None:
        topology = potential.topology
    masses = jnp.asarray(topology.masses(), dtype=jnp.float32)[:, None]
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    from .neighbors import DensePairs as _DensePairs

    if isinstance(pairs, _DensePairs) and not pairs.is_built:
        raise ValueError(
            "build the DensePairs scheme (build/build_from_state) before "
            "creating a runner -- the fused kernel is specialized on the "
            "particle count"
        )
    energy_fn = potential.make_energy_fn(pairs)
    step_fn = make_baoab_step_fn(energy_fn, masses, dt, gamma, kT, pairs=pairs)
    return LangevinRunner(
        step_fn=step_fn,
        energy_fn=energy_fn,
        masses=masses,
        temperature_md=T,
        pairs=pairs,
    )
