"""Zero-overhead simulation runners for production/benchmark use.

The class-based `LangevinIntegrator` carries reference-parity reporting and
unit plumbing; this module exposes the bare compiled core -- build once, then
``run(state, n_steps)`` is a single XLA dispatch regardless of step count.
This is the entry point the benchmark (bench.py) and the graft driver use.
"""

from __future__ import annotations

from dataclasses import dataclass
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

        if isinstance(self.pairs, (NeighborListNsqrd, PairListNsqrd)):
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

    energy_fn = potential.make_energy_fn(pairs)
    step_fn = make_baoab_step_fn(energy_fn, masses, dt, gamma, kT, pairs=pairs)
    return LangevinRunner(
        step_fn=step_fn,
        energy_fn=energy_fn,
        masses=masses,
        temperature_md=T,
        pairs=pairs,
    )
