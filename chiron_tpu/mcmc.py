"""Markov-chain Monte Carlo moves and sampler.

TPU-native counterpart of reference chiron/mcmc.py.

The reference steps its Metropolis chains one proposal at a time in Python,
with a host branch per accept/reject (reference mcmc.py:272-277, 428-463).
Here each move compiles its whole chain into one ``lax.scan``:

* proposal, energy evaluation, NaN guard, Metropolis accept/reject,
  acceptance statistics, *and autotuning* all run on device,
* the carry (:class:`MCCarry`) holds positions/box/key/reduced potential/
  list state/statistics/tunable parameter as arrays, so nothing is a
  compile-time constant that autotune would invalidate (the reference's
  sigma lives on the host object, forcing per-proposal dispatch),
* per-step scalar records stream back as scan outputs and are subsampled
  into the reporter on the host.

Move semantics match the reference exactly: Gaussian displacement with
optional atom-subset masking (reference mcmc.py:715-787), isotropic-volume
barostat with the McDonald-1972 NpT Jacobian ``+ N ln(V'/V)``
(reference mcmc.py:995-1000), cumulative-statistics autotune windows
(reference mcmc.py:670-678 and 902-911).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, replace
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import units
from .neighbors import (
    DensePairs,
    NeighborListNsqrd,
    PairListNsqrd,
    PairsBase,
    neighbor_build_fn,
    neighbor_check_fn,
)
from .states import SamplerState, ThermodynamicState

log = logging.getLogger("chiron_tpu")


# ---------------------------------------------------------------------------
# Functional core
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "positions", "box_vectors", "key", "reduced_potential", "list_state",
        "n_accepted", "n_proposed", "param", "overflowed",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class MCCarry:
    """Scan carry of an on-device Metropolis chain."""

    positions: jnp.ndarray
    box_vectors: Optional[jnp.ndarray]
    key: jnp.ndarray
    reduced_potential: jnp.ndarray
    list_state: Optional[object]  # NeighborListState | PairListState | None
    n_accepted: jnp.ndarray  # () int32, cumulative across updates
    n_proposed: jnp.ndarray  # () int32
    param: jnp.ndarray  # () f32: displacement sigma or volume_max_scale
    overflowed: jnp.ndarray  # () bool


def _metropolis_accept(key, log_ratio, proposed_u):
    """Reference acceptance rule incl. NaN guard (mcmc.py:428-436, 531-548)."""
    nan = jnp.isnan(proposed_u)
    uniform = jax.random.uniform(key)
    accept = (log_ratio >= 0.0) | (
        uniform < jnp.exp(jnp.minimum(log_ratio, 0.0))
    )
    return accept & (~nan)


def _refresh_list_state(pairs, positions, box_vectors, list_state, force: bool):
    """Shared list maintenance: wrap-position rebuild policy per list kind.

    Returns (list_state, overflow_increment).
    """
    if isinstance(pairs, NeighborListNsqrd):
        space = pairs.space
        cutoff_and_skin = pairs.cutoff_md + pairs.skin_md
        capacity = pairs.n_max_neighbors
        if force:
            new_state = neighbor_build_fn(
                positions, box_vectors, cutoff_and_skin, space, capacity
            )
        else:
            need = neighbor_check_fn(list_state, positions, pairs.skin_md, space)
            new_state = jax.lax.cond(
                need,
                lambda: neighbor_build_fn(
                    positions, box_vectors, cutoff_and_skin, space, capacity
                ),
                lambda: list_state,
            )
        return new_state, new_state.overflow
    if isinstance(pairs, (PairListNsqrd, DensePairs)):
        # List-free / static structures: only the box rides along.
        return replace(list_state, box_vectors=box_vectors), jnp.asarray(False)
    return list_state, jnp.asarray(False)


def make_displacement_step_fn(
    reduced_fn: Callable,
    pairs: Optional[PairsBase],
    atom_mask: Optional[jnp.ndarray],
    autotune: bool,
    autotune_interval: int,
) -> Callable:
    """Pure Metropolis displacement step (reference mcmc.py:680-787).

    ``reduced_fn(positions, box_vectors, list_state) -> u`` from
    ``ThermodynamicState.make_reduced_potential_fn``.
    """
    space = pairs.space if pairs is not None else None

    def step(carry: MCCarry, _=None):
        key, k_prop, k_acc = jax.random.split(carry.key, 3)
        sigma = carry.param

        noise = jax.random.normal(
            k_prop, carry.positions.shape, dtype=carry.positions.dtype
        )
        disp = noise * sigma
        if atom_mask is not None:
            disp = disp * atom_mask[:, None]
        proposed = carry.positions + disp
        if space is not None:
            proposed = space.wrap(proposed, carry.box_vectors)

        list_state, overflow = _refresh_list_state(
            pairs, proposed, carry.box_vectors, carry.list_state, force=False
        )
        proposed_u = reduced_fn(proposed, carry.box_vectors, list_state)
        log_ratio = carry.reduced_potential - proposed_u

        accept = _metropolis_accept(k_acc, log_ratio, proposed_u)

        positions = jnp.where(accept, proposed, carry.positions)
        u = jnp.where(accept, proposed_u, carry.reduced_potential)
        new_list_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), list_state, carry.list_state
        )
        n_accepted = carry.n_accepted + accept.astype(jnp.int32)
        n_proposed = carry.n_proposed + 1

        if autotune:
            # Reference rule (mcmc.py:670-678): cumulative acceptance ratio,
            # x1.1 above 0.6, /1.1 below 0.4, applied every
            # ``autotune_interval`` attempts -- here via lax.cond on device.
            ratio = n_accepted / jnp.maximum(n_proposed, 1)
            due = (n_proposed % autotune_interval == 0) & (n_proposed > 0)
            sigma = jnp.where(
                due & (ratio > 0.6),
                sigma * 1.1,
                jnp.where(due & (ratio < 0.4), sigma / 1.1, sigma),
            )

        new_carry = MCCarry(
            positions=positions,
            box_vectors=carry.box_vectors,
            key=key,
            reduced_potential=u,
            list_state=new_list_state,
            n_accepted=n_accepted,
            n_proposed=n_proposed,
            param=sigma,
            overflowed=carry.overflowed | overflow,
        )
        record = {
            "reduced_potential": u,
            "param": sigma,
            "n_accepted": n_accepted,
            "n_proposed": n_proposed,
        }
        return new_carry, record

    return step


def make_barostat_step_fn(
    reduced_fn: Callable,
    pairs: Optional[PairsBase],
    nr_of_atoms: int,
    autotune: bool,
    autotune_interval: int,
) -> Callable:
    """Pure MC-barostat step (reference mcmc.py:913-1009).

    Isotropic volume move with NpT acceptance
    ``-(u' - u) + N ln(V'/V)`` (McDonald 1972, reference mcmc.py:995-1000).
    """

    def step(carry: MCCarry, _=None):
        key, k_prop, k_acc = jax.random.split(carry.key, 3)
        vmax_scale = carry.param

        volume = jnp.prod(jnp.diagonal(carry.box_vectors))
        delta_volume_max = vmax_scale * volume
        delta_volume = (
            jax.random.uniform(k_prop, minval=-1.0, maxval=1.0) * delta_volume_max
        )
        proposed_volume = volume + delta_volume
        scale = jnp.power(proposed_volume / volume, 1.0 / 3.0)

        proposed = carry.positions * scale
        proposed_box = carry.box_vectors * scale

        # Box changed: always refresh the list (reference mcmc.py:985-990).
        list_state, overflow = _refresh_list_state(
            pairs, proposed, proposed_box, carry.list_state, force=True
        )
        proposed_u = reduced_fn(proposed, proposed_box, list_state)
        log_ratio = (
            carry.reduced_potential
            - proposed_u
            + nr_of_atoms * jnp.log(proposed_volume / volume)
        )
        accept = _metropolis_accept(k_acc, log_ratio, proposed_u)

        positions = jnp.where(accept, proposed, carry.positions)
        box_vectors = jnp.where(accept, proposed_box, carry.box_vectors)
        u = jnp.where(accept, proposed_u, carry.reduced_potential)
        new_list_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), list_state, carry.list_state
        )
        n_accepted = carry.n_accepted + accept.astype(jnp.int32)
        n_proposed = carry.n_proposed + 1

        if autotune:
            # Reference rule (mcmc.py:902-911): /1.1 below 0.25, x1.1 above
            # 0.75, capped at 0.3.
            ratio = n_accepted / jnp.maximum(n_proposed, 1)
            due = (n_proposed % autotune_interval == 0) & (n_proposed > 0)
            vmax_scale = jnp.where(
                due & (ratio < 0.25),
                vmax_scale / 1.1,
                jnp.where(
                    due & (ratio > 0.75),
                    jnp.minimum(vmax_scale * 1.1, 0.3),
                    vmax_scale,
                ),
            )

        new_carry = MCCarry(
            positions=positions,
            box_vectors=box_vectors,
            key=key,
            reduced_potential=u,
            list_state=new_list_state,
            n_accepted=n_accepted,
            n_proposed=n_proposed,
            param=vmax_scale,
            overflowed=carry.overflowed | overflow,
        )
        record = {
            "reduced_potential": u,
            "param": vmax_scale,
            "n_accepted": n_accepted,
            "n_proposed": n_proposed,
            "volume": jnp.prod(jnp.diagonal(box_vectors)),
        }
        return new_carry, record

    return step


@partial(jax.jit, static_argnames=("step_fn", "n_steps"))
def run_mc_chain(step_fn: Callable, carry: MCCarry, n_steps: int):
    """Run ``n_steps`` Metropolis proposals as one compiled scan."""
    return jax.lax.scan(step_fn, carry, length=n_steps)


# ---------------------------------------------------------------------------
# Host-facing move classes (reference-compatible API)
# ---------------------------------------------------------------------------


class MCMCMove:
    """Base move bookkeeping (reference mcmc.py:11-88)."""

    def __init__(
        self,
        number_of_moves: int,
        reporter=None,
        report_interval: Optional[int] = 100,
    ):
        self.number_of_moves = number_of_moves
        self.reporter = reporter
        self.report_interval = report_interval
        self._move_iteration = 0
        self._number_of_attempts_made = 0
        if self.reporter is not None:
            assert self.report_interval is not None
            log.info("Using reporter %s", self.reporter)

    def update(
        self,
        sampler_state: SamplerState,
        thermodynamic_state: ThermodynamicState,
        nbr_list: Optional[PairsBase] = None,
    ) -> Tuple[SamplerState, ThermodynamicState, Optional[PairsBase]]:
        raise NotImplementedError

    @property
    def number_of_attemps_made(self):
        # [sic] -- reference spelling, mcmc.py:84-88.
        return self._number_of_attempts_made


class LangevinDynamicsMove(MCMCMove):
    """Langevin dynamics as an MCMC move (reference mcmc.py:91-199)."""

    def __init__(
        self,
        timestep=1.0 * units.femtoseconds,
        collision_rate=1.0 / units.picoseconds,
        refresh_velocities: bool = False,
        reporter=None,
        report_interval: int = 100,
        number_of_steps: int = 1_000,
        save_traj_in_memory: bool = False,
    ):
        super().__init__(
            number_of_moves=number_of_steps,
            reporter=reporter,
            report_interval=report_interval,
        )
        self.timestep = units.coerce(timestep)
        self.collision_rate = units.coerce(collision_rate)
        self.save_traj_in_memory = save_traj_in_memory
        self.traj = []
        from .integrators import LangevinIntegrator

        # the integrator gets the SAME coerced quantities (one source of
        # truth; the integrator's own coerce() is then a no-op)
        self.integrator = LangevinIntegrator(
            timestep=self.timestep,
            collision_rate=self.collision_rate,
            refresh_velocities=refresh_velocities,
            report_interval=report_interval,
            reporter=reporter,
            save_traj_in_memory=save_traj_in_memory,
        )

    def update(self, sampler_state, thermodynamic_state, nbr_list=None):
        assert isinstance(sampler_state, SamplerState), (
            f"Sampler state must be SamplerState, not {type(sampler_state)}"
        )
        assert isinstance(thermodynamic_state, ThermodynamicState), (
            f"Thermodynamic state must be ThermodynamicState, "
            f"not {type(thermodynamic_state)}"
        )
        updated_sampler_state, updated_nbr_list = self.integrator.run(
            sampler_state,
            thermodynamic_state,
            number_of_steps=self.number_of_moves,
            nbr_list=nbr_list,
        )
        self._number_of_attempts_made += self.number_of_moves
        if self.save_traj_in_memory:
            self.traj.append(self.integrator.traj)
            self.integrator.traj = []
        self._move_iteration += 1
        self.integrator._move_iteration = self._move_iteration
        return updated_sampler_state, thermodynamic_state, updated_nbr_list


class MCMove(MCMCMove):
    """Metropolis-Hastings base: owns the compiled chain
    (reference mcmc.py:202-548)."""

    def __init__(
        self,
        number_of_moves: int,
        reporter=None,
        report_interval: int = 1,
        autotune: bool = False,
        autotune_interval: int = 100,
        acceptance_method: str = "Metropolis-Hastings",
    ) -> None:
        super().__init__(
            number_of_moves=number_of_moves,
            reporter=reporter,
            report_interval=report_interval,
        )
        if acceptance_method != "Metropolis-Hastings":
            raise ValueError(
                f"Unsupported acceptance method: {acceptance_method}"
            )
        self.acceptance_method = acceptance_method
        self.autotune = autotune
        self.autotune_interval = autotune_interval
        self.reset_statistics()
        self._step_cache = {}
        self._chain_volume = None  # box volume of the last chain (nm^3)

    # -- statistics (reference mcmc.py:465-486) -----------------------------
    def _update_statistics(self, decision: bool):
        if decision:
            self.n_accepted += 1
        self.n_proposed += 1

    @property
    def statistics(self):
        return dict(n_accepted=self.n_accepted, n_proposed=self.n_proposed)

    @statistics.setter
    def statistics(self, value):
        self.n_accepted = value["n_accepted"]
        self.n_proposed = value["n_proposed"]

    def reset_statistics(self):
        self.n_accepted = 0
        self.n_proposed = 0

    # -- subclass hooks -----------------------------------------------------
    def _param_value(self) -> float:
        raise NotImplementedError

    def _set_param_value(self, value: float) -> None:
        raise NotImplementedError

    def _make_step_fn(self, thermodynamic_state, nbr_list) -> Callable:
        raise NotImplementedError

    def _report_record(self, idx, record, thermodynamic_state):
        raise NotImplementedError

    def _chain_cache_key(self, sampler_state, thermodynamic_state,
                         nbr_list):
        """Identity of the compiled chain: everything the step function
        closes over (kernel identity, list shapes, ensemble, move
        statics).  Recomputed after a capacity regrow so the grown
        chain stays cached."""
        potential = thermodynamic_state.potential
        return (
            potential.cache_token()
            if hasattr(potential, "cache_token")
            else id(potential),
            type(nbr_list).__name__ if nbr_list is not None else None,
            type(getattr(nbr_list, "space", None)).__name__,
            getattr(nbr_list, "n_max_neighbors", None),
            getattr(nbr_list, "cutoff_md", None),
            getattr(nbr_list, "skin_md", None),
            sampler_state.number_of_particles,
            float(thermodynamic_state.kT_md),
            None
            if thermodynamic_state.pressure is None
            else float(thermodynamic_state.pressure_md),
            # `is not None`, not truthiness: an array subset raises
            # "truth value ... is ambiguous" in boolean context, and an
            # empty subset ([]: all atoms frozen) must not alias the
            # no-mask chain
            None
            if getattr(self, "atom_subset", None) is None
            else tuple(np.asarray(self.atom_subset).ravel().tolist()),
            self.autotune,
            self.autotune_interval,
        )

    # -- driver -------------------------------------------------------------
    def update(self, sampler_state, thermodynamic_state, nbr_list=None):
        """Run ``number_of_moves`` proposals as one on-device chain
        (reference mcmc.py:243-306 semantics)."""
        cache_key = self._chain_cache_key(
            sampler_state, thermodynamic_state, nbr_list
        )
        if cache_key not in self._step_cache:
            self._step_cache.clear()
            self._step_cache[cache_key] = self._make_step_fn(
                thermodynamic_state, nbr_list
            )
        step_fn = self._step_cache[cache_key]

        if nbr_list is not None:
            if not nbr_list.is_built:
                nbr_list.build_from_state(sampler_state)
            list_state = nbr_list.state
        else:
            list_state = None

        u0 = thermodynamic_state.get_reduced_potential(sampler_state, nbr_list)

        carry = MCCarry(
            positions=sampler_state.positions,
            box_vectors=sampler_state.box_vectors,
            key=sampler_state.new_PRNG_key,
            reduced_potential=jnp.asarray(u0, dtype=jnp.float32),
            list_state=list_state,
            n_accepted=jnp.asarray(self.n_accepted, dtype=jnp.int32),
            n_proposed=jnp.asarray(self.n_proposed, dtype=jnp.int32),
            param=jnp.asarray(self._param_value(), dtype=jnp.float32),
            overflowed=jnp.asarray(False),
        )

        # Compiled-chain analogue of the reference's grow-by-10 retry
        # (reference neighbors.py:709-727): the chain is deterministic in
        # its starting carry, so on a mid-chain capacity overflow we grow
        # the list, rebuild from the SAME starting state, and re-run the
        # whole segment -- completed statistics are never double-counted
        # because they only sync to the host after a clean run.
        carry0 = carry
        for attempt in range(8):
            carry, records = run_mc_chain(
                step_fn, carry0, self.number_of_moves
            )
            if not bool(carry.overflowed):
                break
            if not isinstance(nbr_list, NeighborListNsqrd):
                raise RuntimeError(
                    "MC chain overflowed but the pair structure has no "
                    "growable capacity; this indicates NaN positions or "
                    "an invalid configuration."
                )
            # grow geometrically (+10 floor): each retry recompiles the
            # whole chain for the new list shape, so converging in 1-2
            # retries matters more than the reference's +10 footstep.
            # A particle has at most n-1 neighbors: once capacity passes
            # that ceiling an overflow can only mean NaN/invalid
            # positions, so fail fast instead of paying up to 8
            # recompiles (ADVICE r3)
            n_particles = int(carry0.positions.shape[0])
            if nbr_list.n_max_neighbors >= n_particles - 1:
                raise RuntimeError(
                    "MC chain overflowed with neighbor capacity already "
                    f"at the physical ceiling ({nbr_list.n_max_neighbors}"
                    f" >= n-1 = {n_particles - 1}); this indicates NaN "
                    "positions or an invalid configuration."
                )
            nbr_list.n_max_neighbors = min(
                n_particles - 1,
                nbr_list.n_max_neighbors + nbr_list.n_max_neighbors // 2
                + 10,
            )
            nbr_list.build(carry0.positions, carry0.box_vectors)
            step_fn = self._make_step_fn(thermodynamic_state, nbr_list)
            self._step_cache.clear()
            self._step_cache[
                self._chain_cache_key(
                    sampler_state, thermodynamic_state, nbr_list
                )
            ] = step_fn
            carry0 = replace(carry0, list_state=nbr_list.state)
        else:
            raise RuntimeError(
                "Neighbor list capacity exceeded during MC chain even "
                "after repeated growth; increase n_max_neighbors and rerun."
            )

        # Host-side sync of statistics and tuned parameter.
        self.n_accepted = int(carry.n_accepted)
        self.n_proposed = int(carry.n_proposed)
        self._set_param_value(float(carry.param))

        # Reporter subsampling at the reference cadence (every
        # report_interval attempts, reference mcmc.py:284-295).  Pull the
        # whole record stream to host in ONE transfer -- per-element syncs
        # are prohibitively slow over a tunneled device link.
        if self.reporter is not None:
            self._chain_volume = (
                None
                if carry.box_vectors is None
                else float(jnp.prod(jnp.diagonal(carry.box_vectors)))
            )
            host_records = jax.device_get(records)
            start = self._number_of_attempts_made
            for i in range(self.number_of_moves):
                attempts = start + i + 1
                if attempts % self.report_interval == 0:
                    rec = {k: v[i] for k, v in host_records.items()}
                    self._report_record(i, rec, thermodynamic_state)

        self._number_of_attempts_made += self.number_of_moves
        self._move_iteration += 1

        # Write the accepted state back into the host shells.
        sampler_state.positions = carry.positions
        if carry.box_vectors is not None:
            sampler_state.box_vectors = carry.box_vectors
        if nbr_list is not None:
            nbr_list._state = carry.list_state
            nbr_list.box_vectors = carry.list_state.box_vectors
            if isinstance(nbr_list, NeighborListNsqrd):
                nbr_list.ref_positions = carry.list_state.ref_positions

        return sampler_state, thermodynamic_state, nbr_list


class MonteCarloDisplacementMove(MCMove):
    """Gaussian displacement of all (or a subset of) particles
    (reference mcmc.py:551-787)."""

    def __init__(
        self,
        displacement_sigma=1.0 * units.nanometer,
        number_of_moves: int = 100,
        atom_subset: Optional[List[int]] = None,
        report_interval: int = 1,
        reporter=None,
        autotune: bool = False,
        autotune_interval: int = 100,
        acceptance_method="Metropolis-Hastings",
    ):
        super().__init__(
            number_of_moves=number_of_moves,
            reporter=reporter,
            report_interval=report_interval,
            autotune=autotune,
            autotune_interval=autotune_interval,
            acceptance_method=acceptance_method,
        )
        self.displacement_sigma = units.coerce(displacement_sigma)
        self.atom_subset = atom_subset

    def _param_value(self) -> float:
        return float(
            self.displacement_sigma.value_in_unit_system(units.md_unit_system)
        )

    def _set_param_value(self, value: float) -> None:
        self.displacement_sigma = units.Quantity(value, units.nanometer)

    def _make_step_fn(self, thermodynamic_state, nbr_list):
        reduced_fn = thermodynamic_state.make_reduced_potential_fn(nbr_list)
        atom_mask = None
        if self.atom_subset is not None:
            n = thermodynamic_state.nr_of_particles
            atom_mask = (
                # int32 explicitly: an empty Python list would otherwise
                # become a float32 indexer and raise
                jnp.zeros(n)
                .at[jnp.asarray(self.atom_subset, dtype=jnp.int32)]
                .set(1.0)
            )
        return make_displacement_step_fn(
            reduced_fn,
            nbr_list,
            atom_mask,
            self.autotune,
            self.autotune_interval,
        )

    def _report_record(self, idx, record, thermodynamic_state):
        beta = thermodynamic_state.beta_md
        u = float(record["reduced_potential"])
        potential_energy = u / beta
        if thermodynamic_state.pressure is not None and (
            self._chain_volume is not None
        ):
            # u is the REDUCED potential: with a pressure it includes
            # beta*P*V, which must be subtracted to report the pure
            # potential energy (the barostat move's rows already do; the
            # two move types share the reporter column).  Displacement
            # moves never change the box, so the chain volume is constant.
            potential_energy -= (
                thermodynamic_state.pressure_md * self._chain_volume
            )
        self.reporter.report(
            {
                "step": idx,
                "iteration": self._move_iteration,
                "number_of_attempts_made": int(record["n_proposed"]),
                "potential_energy": potential_energy,
                "displacement_sigma": float(record["param"]),
                "acceptance_probability": float(record["n_accepted"])
                / max(int(record["n_proposed"]), 1),
            }
        )


class MonteCarloBarostatMove(MCMove):
    """Isotropic-volume NpT barostat move (reference mcmc.py:790-1009)."""

    def __init__(
        self,
        volume_max_scale=0.01,
        number_of_moves: int = 100,
        report_interval: int = 1,
        reporter=None,
        autotune: bool = False,
        autotune_interval: int = 100,
        acceptance_method="Metropolis-Hastings",
    ):
        super().__init__(
            number_of_moves=number_of_moves,
            reporter=reporter,
            report_interval=report_interval,
            autotune=autotune,
            autotune_interval=autotune_interval,
            acceptance_method=acceptance_method,
        )
        self.volume_max_scale = volume_max_scale

    def _param_value(self) -> float:
        return float(self.volume_max_scale)

    def _set_param_value(self, value: float) -> None:
        self.volume_max_scale = value

    def _make_step_fn(self, thermodynamic_state, nbr_list):
        if thermodynamic_state.pressure is None:
            raise ValueError(
                "MonteCarloBarostatMove requires a thermodynamic state with "
                "a pressure (NpT ensemble)."
            )
        reduced_fn = thermodynamic_state.make_reduced_potential_fn(nbr_list)
        return make_barostat_step_fn(
            reduced_fn,
            nbr_list,
            thermodynamic_state.nr_of_particles,
            self.autotune,
            self.autotune_interval,
        )

    def _report_record(self, idx, record, thermodynamic_state):
        beta = thermodynamic_state.beta_md
        pressure = thermodynamic_state.pressure_md
        u = float(record["reduced_potential"])
        volume = float(record["volume"])
        potential_energy = u / beta - pressure * volume
        self.reporter.report(
            {
                "step": idx,
                "iteration": self._move_iteration,
                "number_of_attempts_made": int(record["n_proposed"]),
                "potential_energy": potential_energy,
                "volume": volume,
                "max_volume_scale": float(record["param"]),
                "acceptance_probability": float(record["n_accepted"])
                / max(int(record["n_proposed"]), 1),
            }
        )


class RotamerMove(MCMove):
    """Placeholder (reference mcmc.py:1012-1017): rotamer sampling is not
    implemented in the reference either; kept for API parity."""

    def _make_step_fn(self, thermodynamic_state, nbr_list):
        raise NotImplementedError("RotamerMove is a placeholder (as upstream).")


class ProtonationStateMove(MCMove):
    """Placeholder (reference mcmc.py:1020-1025)."""

    def _make_step_fn(self, thermodynamic_state, nbr_list):
        raise NotImplementedError(
            "ProtonationStateMove is a placeholder (as upstream)."
        )


class TautomericStateMove(MCMove):
    """Placeholder (reference mcmc.py:1028-1033)."""

    def _make_step_fn(self, thermodynamic_state, nbr_list):
        raise NotImplementedError(
            "TautomericStateMove is a placeholder (as upstream)."
        )


class MoveSchedule:
    """Ordered (name, move) schedule (reference mcmc.py:1036-1071)."""

    def __init__(self, move_schedule: List[Tuple[str, MCMCMove]]) -> None:
        self.move_schedule = move_schedule
        self._validate_sequence()

    def _validate_sequence(self):
        for move_name, move_class in self.move_schedule:
            if not isinstance(move_class, MCMCMove):
                raise ValueError(
                    f"Move {move_name} in the sequence is not available."
                )


class MCMCSampler:
    """Basic MCMC driver over a move schedule (reference mcmc.py:1074-1155)."""

    def __init__(self, move_set: MoveSchedule):
        log.info("Initializing MCMC sampler")
        self.move = move_set

    def run(
        self,
        sampler_state: SamplerState,
        thermodynamic_state: ThermodynamicState,
        n_iterations: int = 1,
        nbr_list: Optional[PairsBase] = None,
    ):
        import copy

        sampler_state = copy.deepcopy(sampler_state)
        thermodynamic_state = copy.deepcopy(thermodynamic_state)
        nbr_list = copy.deepcopy(nbr_list)

        log.info("Running MCMC sampler for %d iterations", n_iterations)
        for iteration in range(n_iterations):
            for move_name, move in self.move.move_schedule:
                log.debug("Performing: %s", move_name)
                sampler_state, thermodynamic_state, nbr_list = move.update(
                    sampler_state, thermodynamic_state, nbr_list
                )

        for _, move in self.move.move_schedule:
            if move.reporter is not None:
                move.reporter.flush_buffer()
        return sampler_state, thermodynamic_state, nbr_list
