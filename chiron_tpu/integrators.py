"""Langevin BAOAB integrator as a jit-compiled on-device loop.

TPU-native counterpart of reference chiron/integrators.py.

The reference advances the BAOAB splitting in a *Python* loop, paying a
device->host synchronization every step for the neighbor-list ``check``
(reference integrators.py:174-205, neighbors.py:872-907).  Here the entire
propagation -- kicks, drifts, O-step noise, PBC wrap, the rebuild predicate
*and the conditional O(N^2) rebuild itself* -- is a single ``lax.scan`` body
compiled once by XLA:

* zero host round-trips per step; steps are fused elementwise VPU work plus
  one gather-based force evaluation,
* the rebuild decision is a ``lax.cond`` on a device scalar
  (`neighbor_check_fn`), with both branches shape-stable thanks to the
  fixed-capacity `NeighborListState`,
* reporting drains device data in batched chunks every ``report_interval``
  steps instead of per-step.

BAOAB splitting per Leimkuhler & Matthews (2013), identical coefficients to
the reference (integrators.py:127-137): a = exp(-gamma dt),
b = sqrt(1 - exp(-2 gamma dt)).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, replace
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import units
from .neighbors import (
    DensePairs,
    DensePairsState,
    NeighborListNsqrd,
    NeighborListState,
    PairListNsqrd,
    neighbor_build_fn,
    neighbor_check_fn,
)
from .states import SamplerState, ThermodynamicState
from .utils import get_list_of_mass, initialize_velocities

log = logging.getLogger("chiron_tpu")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "key", "nbr_state", "box_vectors", "overflowed"],
    meta_fields=[],
)
@dataclass(frozen=True)
class LangevinCarry:
    """Scan carry: full dynamic state of the Langevin chain (device arrays)."""

    x: jnp.ndarray
    v: jnp.ndarray
    F: jnp.ndarray
    key: jnp.ndarray
    nbr_state: Optional[NeighborListState]
    box_vectors: Optional[jnp.ndarray]
    overflowed: jnp.ndarray  # () bool -- sticky neighbor-capacity overflow flag


def make_baoab_step_fn(
    energy_fn: Callable,
    masses: jnp.ndarray,
    timestep: float,
    collision_rate: float,
    kT: float,
    pairs=None,
) -> Callable:
    """Build the pure BAOAB step ``carry -> carry``.

    ``energy_fn(positions, list_state) -> energy`` must be pure (as produced
    by ``potential.make_energy_fn``); the force is its exact negative gradient
    so differentiable-MCMC semantics are preserved (reference potential.py:23).
    """
    dt = jnp.asarray(timestep, dtype=jnp.float32)
    a = jnp.exp(-collision_rate * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * collision_rate * dt))
    sigma_v = jnp.sqrt(kT / masses)
    force_fn = jax.grad(lambda x, s: -energy_fn(x, s))

    has_nbr = isinstance(pairs, NeighborListNsqrd)
    if has_nbr:
        space = pairs.space
        cutoff_and_skin = pairs.cutoff_md + pairs.skin_md
        skin = pairs.skin_md
        # capacity is read inside step() at trace time, NOT captured here:
        # a later build()/host-retry can regrow pairs.n_max_neighbors, and
        # a step fn created before that build would then rebuild at the
        # stale capacity -- a lax.cond branch-shape mismatch against the
        # (N, K_new) carried state.  Any capacity change also changes the
        # carried nbr_state's shape, so run_chunk retraces and the read
        # below always sees the live value.
    elif isinstance(pairs, (PairListNsqrd, DensePairs)):
        space = pairs.space
    else:
        space = None

    def step(carry: LangevinCarry, _=None) -> Tuple[LangevinCarry, None]:
        key, subkey = jax.random.split(carry.key)
        x, v, F = carry.x, carry.v, carry.F
        nbr_state = carry.nbr_state

        # B: half kick
        v = v + (dt * 0.5) * F / masses
        # A: half drift
        x = x + (dt * 0.5) * v
        # O: Ornstein-Uhlenbeck
        noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
        v = a * v + b * sigma_v * noise
        # A: half drift
        x = x + (dt * 0.5) * v

        overflowed = carry.overflowed
        if space is not None:
            x = space.wrap(x, carry.box_vectors)
        if has_nbr:
            need_rebuild = neighbor_check_fn(nbr_state, x, skin, space)
            nbr_state = jax.lax.cond(
                need_rebuild,
                lambda: neighbor_build_fn(
                    x, carry.box_vectors, cutoff_and_skin, space,
                    pairs.n_max_neighbors,
                ),
                lambda: nbr_state,
            )
            overflowed = overflowed | nbr_state.overflow

        # B: recompute force, half kick
        F = force_fn(x, nbr_state)
        v = v + (dt * 0.5) * F / masses

        return (
            LangevinCarry(
                x=x, v=v, F=F, key=key, nbr_state=nbr_state,
                box_vectors=carry.box_vectors, overflowed=overflowed,
            ),
            None,
        )

    return step


@partial(jax.jit, static_argnames=("step_fn", "n_steps"))
def run_chunk(step_fn: Callable, carry: LangevinCarry, n_steps: int) -> LangevinCarry:
    """Advance ``n_steps`` BAOAB steps as one compiled scan."""
    carry, _ = jax.lax.scan(step_fn, carry, length=n_steps)
    return carry


class LangevinIntegrator:
    """Host-facing Langevin driver (reference integrators.py:13-286 API)."""

    def __init__(
        self,
        timestep=1.0 * units.femtoseconds,
        collision_rate=1.0 / units.picoseconds,
        refresh_velocities: bool = False,
        report_interval: int = 100,
        reporter=None,
        save_traj_in_memory: bool = False,
    ) -> None:
        self.timestep = units.coerce(timestep)
        self.collision_rate = units.coerce(collision_rate)
        self.report_interval = report_interval
        self.reporter = reporter
        self.refresh_velocities = refresh_velocities
        self.save_traj_in_memory = save_traj_in_memory
        self.traj = []
        self.velocities = None
        self._move_iteration = 0
        if reporter is not None:
            log.info("Using reporter %s", reporter)

    def run(
        self,
        sampler_state: SamplerState,
        thermodynamic_state: ThermodynamicState,
        number_of_steps: int = 5_000,
        nbr_list=None,
        progress_bar: bool = False,
    ):
        # ``progress_bar`` prints coarse progress at chunk boundaries (the
        # reference uses tqdm, integrators.py:174-178; a dependency-free
        # print keeps the compiled chunks unchanged)
        """Run Langevin dynamics (reference integrators.py:75-218).

        Returns ``(updated SamplerState, nbr_list)``.  The propagation runs in
        report-interval-sized compiled chunks; only reporting crosses back to
        the host.
        """
        potential = thermodynamic_state.potential
        mass = get_list_of_mass(potential.topology)
        masses = jnp.asarray(
            mass.value_in_unit_system(units.md_unit_system), dtype=jnp.float32
        )[:, None]

        temperature = thermodynamic_state.temperature
        kT = units.kB_MD * float(
            temperature.value_in_unit_system(units.md_unit_system)
        )
        dt = float(self.timestep.value_in_unit_system(units.md_unit_system))
        gamma = float(
            self.collision_rate.value_in_unit_system(units.md_unit_system)
        )

        key = sampler_state.new_PRNG_key

        # Velocity (re)initialization rules: reference integrators.py:140-160.
        # The init draw uses its own subkey so the chain's first O-step noise
        # is independent of the velocity sample.
        if (
            self.refresh_velocities
            or sampler_state.velocities is None
            or sampler_state.velocities.shape[0] != sampler_state.positions.shape[0]
        ):
            key, vkey = jax.random.split(key)
            sampler_state.velocities = initialize_velocities(
                temperature, potential.topology, vkey
            )

        x0 = sampler_state.positions
        v0 = sampler_state.velocities
        box = sampler_state.box_vectors

        if nbr_list is not None:
            nbr_list.build_from_state(sampler_state)

        # The list state (either kind) travels in the carry so box vectors
        # and neighbor tables are always current data -- never closure
        # constants that could go stale between runs (e.g. after a barostat
        # move changed the box).
        if isinstance(nbr_list, NeighborListNsqrd):
            nbr_state = nbr_list.state
        elif isinstance(nbr_list, PairListNsqrd):
            from dataclasses import replace as _replace

            nbr_state = _replace(nbr_list.state, box_vectors=box)
        elif isinstance(nbr_list, DensePairs):
            nbr_state = DensePairsState(box_vectors=box)
        else:
            nbr_state = None

        # Build (and memoize) the compiled step function.  The cache keeps
        # repeated `run` calls (e.g. from LangevinDynamicsMove inside an MCMC
        # loop) from re-tracing the scan every iteration.
        cache_key = (
            potential.cache_token()
            if hasattr(potential, "cache_token")
            else id(potential),
            type(nbr_list).__name__ if nbr_list is not None else None,
            type(getattr(nbr_list, "space", None)).__name__,
            getattr(nbr_list, "n_max_neighbors", None),
            getattr(nbr_list, "cutoff_md", None),
            getattr(nbr_list, "skin_md", None),
            x0.shape[0],
            dt,
            gamma,
            kT,
            # masses are baked into the compiled step: two systems with the
            # same N and potential but different masses must not share it
            np.asarray(masses).tobytes(),
        )
        if getattr(self, "_step_cache_key", None) != cache_key:
            if nbr_list is None:
                try:
                    energy_fn = potential.make_energy_fn(None)
                except (TypeError, NotImplementedError):
                    energy_fn = lambda x, s: potential.compute_energy(x, None)
            else:
                energy_fn = potential.make_energy_fn(nbr_list)
            self._step_cache_key = cache_key
            self._step_fn = make_baoab_step_fn(
                energy_fn, masses, dt, gamma, kT, pairs=nbr_list
            )
            self._energy_fn = energy_fn
        step_fn = self._step_fn
        force_fn = jax.grad(lambda x, s: -self._energy_fn(x, s))

        carry = LangevinCarry(
            x=x0,
            v=v0,
            F=force_fn(x0, nbr_state),
            key=key,
            nbr_state=nbr_state,
            box_vectors=box,
            overflowed=jnp.asarray(False),
        )

        # Chunk boundaries reproduce the reference's report cadence: a report
        # fires after every step where elapsed_step % report_interval == 0
        # (reference integrators.py:197-205).
        r = self.report_interval
        elapsed_base = self._move_iteration * number_of_steps
        boundaries = [
            s for s in range(number_of_steps) if (s + elapsed_base) % r == 0
        ]
        step_index = -1
        for target in boundaries + [number_of_steps - 1]:
            n = target - step_index
            if n <= 0:
                continue
            carry = run_chunk(step_fn, carry, n)
            step_index = target
            elapsed_step = step_index + elapsed_base
            if progress_bar:
                print(
                    f"\rLangevin {step_index + 1}/{number_of_steps} steps",
                    end="", flush=True,
                )
            if elapsed_step % r == 0:
                if self.reporter is not None:
                    self._report(carry, potential, nbr_list, step_index,
                                 self._move_iteration, elapsed_step)
                if self.save_traj_in_memory:
                    self.traj.append(carry.x)

        if progress_bar:
            print()
        if bool(carry.overflowed):
            raise RuntimeError(
                "Neighbor list capacity exceeded during on-device propagation; "
                "increase n_max_neighbors (or the skin) and rerun."
            )

        # Write back: positions/velocities/key (reference integrators.py:210-218).
        sampler_state.positions = carry.x
        sampler_state.velocities = carry.v
        sampler_state.current_PRNG_key = carry.key

        if nbr_list is not None and isinstance(nbr_list, NeighborListNsqrd):
            nbr_list._state = carry.nbr_state

        return sampler_state, nbr_list

    def _report(self, carry, potential, nbr_list, step, iteration, elapsed_step):
        """Batched device->host report (reference integrators.py:245-286)."""
        if isinstance(nbr_list, NeighborListNsqrd):
            nbr_list._state = carry.nbr_state
        d = {
            "positions": carry.x,
            "potential_energy": potential.compute_energy(carry.x, nbr_list),
            "step": step,
            "iteration": iteration,
            "elapsed_step": elapsed_step,
        }
        if nbr_list is not None:
            d["box_vectors"] = carry.box_vectors
        self.reporter.report(d)
