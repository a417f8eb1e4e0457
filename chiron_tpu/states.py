"""Sampler and thermodynamic state.

TPU-native counterpart of reference chiron/states.py.

``SamplerState`` is a host-facing shell whose dynamic content lives in a
frozen pytree (:class:`SamplerStateData`): positions, velocities, box vectors
(all device arrays in MD units) and the PRNG key.  Unit validation happens
once at the construction boundary (reference states.py:35-95); everything
downstream is unitless MD-system numerics, so entire simulation loops can be
jitted without unit objects crossing the trace.

``ThermodynamicState`` holds the potential plus (T, V, p) and exposes both the
reference API (``get_reduced_potential``, reference states.py:275-325) and a
pure ``make_reduced_potential_fn`` closure for on-device MC chains.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp

from . import units
from .potential import NeuralNetworkPotential
from .utils import get_nr_of_particles

log = logging.getLogger("chiron_tpu")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["positions", "velocities", "box_vectors", "key"],
    meta_fields=[],
)
@dataclass(frozen=True)
class SamplerStateData:
    """Pure pytree of the per-replica dynamic state (MD units).

    This is the object that flows through ``lax.scan`` loops and across the
    replica mesh; `SamplerState` is its host-facing, unit-validated shell.
    """

    positions: jnp.ndarray  # (N, 3) nm
    velocities: Optional[jnp.ndarray]  # (N, 3) nm/ps or None
    box_vectors: Optional[jnp.ndarray]  # (3, 3) nm or None
    key: jnp.ndarray  # PRNG key

    @property
    def n_particles(self) -> int:
        return self.positions.shape[0]

    @property
    def volume(self) -> jnp.ndarray:
        """Box volume in nm^3 (orthogonal boxes: product of the diagonal)."""
        return jnp.prod(jnp.diagonal(self.box_vectors))


class SamplerState:
    """Unit-validated dynamic state (reference states.py:8-174)."""

    def __init__(
        self,
        positions: units.Quantity,
        current_PRNG_key,
        velocities: Optional[units.Quantity] = None,
        box_vectors: Optional[units.Quantity] = None,
    ) -> None:
        # openmm.unit interop: real openmm Quantities are accepted
        # everywhere the reference accepts them (reference states.py:44-87)
        positions = units.coerce(positions)
        velocities = units.coerce(velocities)
        box_vectors = units.coerce(box_vectors)
        # Validation mirrors reference states.py:44-87.
        if not isinstance(positions, units.Quantity):
            raise TypeError(
                f"positions must be a unit.Quantity, got {type(positions)} instead."
            )
        if velocities is not None and not isinstance(velocities, units.Quantity):
            raise TypeError(
                f"velocities must be a unit.Quantity, got {type(velocities)} instead."
            )
        if box_vectors is not None and not isinstance(box_vectors, units.Quantity):
            if isinstance(box_vectors, list):
                try:
                    box_vectors = self._convert_from_openmm_box(box_vectors)
                except Exception:
                    raise TypeError(f"Unable to parse box_vectors {box_vectors}.")
            else:
                raise TypeError(
                    f"box_vectors must be a unit.Quantity or openMM box, "
                    f"got {type(box_vectors)} instead."
                )
        if not positions.unit.is_compatible(units.nanometer):
            raise ValueError(
                f"positions must have units of distance, got {positions.unit} instead."
            )
        if velocities is not None and not velocities.unit.is_compatible(
            units.nanometer / units.picosecond
        ):
            raise ValueError(
                f"velocities must have units of distance/time, "
                f"got {velocities.unit} instead."
            )
        if box_vectors is not None and not box_vectors.unit.is_compatible(
            units.nanometer
        ):
            raise ValueError(
                f"box_vectors must have units of distance, "
                f"got {box_vectors.unit} instead."
            )
        if box_vectors is not None and box_vectors.shape != (3, 3):
            raise ValueError(
                f"box_vectors must be a 3x3 array, got {box_vectors.shape} instead."
            )
        if velocities is not None and positions.shape != velocities.shape:
            raise ValueError(
                f"positions and velocities must have the same shape, "
                f"got {positions.shape} and {velocities.shape} instead."
            )
        if current_PRNG_key is None:
            raise ValueError("random_seed must be set.")

        # Store MD-unit device arrays; units exist only at this boundary.
        self._positions = jnp.asarray(
            positions.value_in_unit_system(units.md_unit_system)
        )
        self._velocities = (
            None
            if velocities is None
            else jnp.asarray(velocities.value_in_unit_system(units.md_unit_system))
        )
        self._box_vectors = (
            None
            if box_vectors is None
            else jnp.asarray(box_vectors.value_in_unit_system(units.md_unit_system))
        )
        self._current_PRNG_key = current_PRNG_key
        self._distance_unit = units.nanometer
        self._time_unit = units.picosecond

    # -- properties return unitless MD arrays (reference states.py:100-114) --
    @property
    def number_of_particles(self) -> int:
        return self._positions.shape[0]

    @property
    def positions(self) -> jnp.ndarray:
        return self._positions

    @positions.setter
    def positions(self, value) -> None:
        value = units.coerce(value)
        if isinstance(value, units.Quantity):
            value = value.value_in_unit_system(units.md_unit_system)
        self._positions = jnp.asarray(value)

    @property
    def velocities(self) -> Optional[jnp.ndarray]:
        return self._velocities

    @velocities.setter
    def velocities(self, value) -> None:
        value = units.coerce(value)
        if isinstance(value, units.Quantity):
            value = value.value_in_unit_system(units.md_unit_system)
        value = jnp.asarray(value)
        if value.shape != self._positions.shape:
            raise ValueError(
                f"velocities must have the same shape as positions, "
                f"got {value.shape} and {self._positions.shape} instead."
            )
        self._velocities = value

    @property
    def box_vectors(self) -> Optional[jnp.ndarray]:
        return self._box_vectors

    @box_vectors.setter
    def box_vectors(self, value) -> None:
        value = units.coerce(value)
        if isinstance(value, units.Quantity):
            value = value.value_in_unit_system(units.md_unit_system)
        self._box_vectors = jnp.asarray(value)

    @property
    def distance_unit(self) -> units.Unit:
        return self._distance_unit

    def velocity_unit(self) -> units.Unit:
        return self._distance_unit / self._time_unit

    @property
    def current_PRNG_key(self):
        return self._current_PRNG_key

    @current_PRNG_key.setter
    def current_PRNG_key(self, key):
        self._current_PRNG_key = key

    @property
    def new_PRNG_key(self):
        """Split the stored key and return the fresh subkey
        (reference states.py:151-154)."""
        key, subkey = jax.random.split(self._current_PRNG_key)
        self._current_PRNG_key = key
        return subkey

    # -- pytree bridge -------------------------------------------------------
    def as_data(self) -> SamplerStateData:
        return SamplerStateData(
            positions=self._positions,
            velocities=self._velocities,
            box_vectors=self._box_vectors,
            key=self._current_PRNG_key,
        )

    def update_from_data(self, data: SamplerStateData) -> "SamplerState":
        self._positions = data.positions
        if data.velocities is not None:
            self._velocities = data.velocities
        if data.box_vectors is not None:
            self._box_vectors = data.box_vectors
        self._current_PRNG_key = data.key
        return self

    @staticmethod
    def _convert_from_openmm_box(openmm_box_vectors: list) -> units.Quantity:
        """A list of three length-3 row quantities (openmm's
        getDefaultPeriodicBoxVectors layout, native or openmm-unit) ->
        one (3, 3) nm Quantity."""
        box_vec = []
        for i in range(3):
            row = units.coerce(openmm_box_vectors[i])
            box_vec.append([
                row[j].value_in_unit_system(units.md_unit_system)
                for j in range(3)
            ])
        return units.Quantity(jnp.array(box_vec), units.nanometer)


class ThermodynamicState:
    """Potential + (T, V, p) (reference states.py:177-330)."""

    def __init__(
        self,
        potential: Optional[NeuralNetworkPotential],
        temperature: Optional[units.Quantity] = None,
        volume: Optional[units.Quantity] = None,
        pressure: Optional[units.Quantity] = None,
    ):
        self.potential = potential

        temperature = units.coerce(temperature)
        volume = units.coerce(volume)
        pressure = units.coerce(pressure)
        if temperature is not None and not isinstance(temperature, units.Quantity):
            raise TypeError(
                f"temperature must be a unit.Quantity, "
                f"got {type(temperature)} instead."
            )
        if temperature is not None and not temperature.unit.is_compatible(
            units.kelvin
        ):
            raise ValueError(
                f"temperature must have units of temperature, "
                f"got {temperature.unit} instead."
            )
        if volume is not None and not isinstance(volume, units.Quantity):
            raise TypeError(
                f"volume must be a unit.Quantity, got {type(volume)} instead."
            )
        if volume is not None and not volume.unit.is_compatible(
            units.nanometer ** 3
        ):
            raise ValueError(
                f"volume must have units of distance**3, got {volume.unit} instead."
            )
        if pressure is not None and not isinstance(pressure, units.Quantity):
            raise TypeError(
                f"pressure must be a unit.Quantity, got {type(pressure)} instead."
            )
        if pressure is not None and not pressure.unit.is_compatible(units.atmosphere):
            raise ValueError(
                f"pressure must have units of pressure, got {pressure.unit} instead."
            )

        self.temperature = temperature
        if temperature is not None:
            self.beta = 1.0 / (units.BOLTZMANN_CONSTANT_kB * temperature)
        else:
            self.beta = None
        self.volume = volume
        self.pressure = pressure

        topology = getattr(potential, "topology", None)
        self.nr_of_particles = (
            get_nr_of_particles(topology) if topology is not None else None
        )
        self._log_ensemble()

    def _log_ensemble(self):
        set_vars = self.check_variables()
        if not set_vars:
            log.info("No variables are set.")
        for var in set_vars:
            log.info("%s is set.", var)
        if (
            self.temperature is not None
            and self.volume is not None
            and self.nr_of_particles
        ):
            log.info("NVT ensemble simulated.")
        if (
            self.temperature is not None
            and self.pressure is not None
            and self.nr_of_particles
        ):
            log.info("NpT ensemble is simulated.")

    def check_variables(self) -> List[str]:
        """Names of the (T, V, p) variables that are set
        (reference states.py:246-256)."""
        variables = ["temperature", "volume", "pressure"]
        return [v for v in variables if getattr(self, v) is not None]

    # -- MD-unit scalars -----------------------------------------------------
    @property
    def kT_md(self) -> float:
        """kB*T in kJ/mol."""
        return units.kB_MD * float(
            self.temperature.value_in_unit_system(units.md_unit_system)
        )

    @property
    def beta_md(self) -> float:
        """1/(kB*T) in mol/kJ."""
        return 1.0 / self.kT_md

    @property
    def pressure_md(self) -> Optional[float]:
        """Molar pressure in kJ/mol/nm^3, or None for NVT."""
        if self.pressure is None:
            return None
        return units.pressure_to_md(self.pressure)

    # -- reduced potential ----------------------------------------------------
    def get_reduced_potential(self, sampler_state: SamplerState, nbr_list=None):
        """u = beta [U(x) + p V(x)] (reference states.py:275-325)."""
        u = self.potential.compute_energy(sampler_state.positions, nbr_list)
        red = self.beta_md * u
        if self.pressure is not None:
            volume = (
                sampler_state.box_vectors[0][0]
                * sampler_state.box_vectors[1][1]
                * sampler_state.box_vectors[2][2]
            )
            red = red + self.beta_md * self.pressure_md * volume
        return red

    def make_reduced_potential_fn(self, pairs=None) -> Callable:
        """Pure closure ``(positions, box_vectors, list_state) -> u``.

        This is the device-loop counterpart of :meth:`get_reduced_potential`;
        box vectors are data so NpT moves do not recompile.
        """
        energy_fn = self.potential.make_energy_fn(pairs)
        beta = self.beta_md
        pressure = self.pressure_md

        if pressure is None:

            def reduced_fn(positions, box_vectors=None, list_state=None):
                return beta * energy_fn(positions, list_state)

        else:

            def reduced_fn(positions, box_vectors, list_state=None):
                volume = jnp.prod(jnp.diagonal(box_vectors))
                return beta * (
                    energy_fn(positions, list_state) + pressure * volume
                )

        return reduced_fn

    def kT_to_kJ_per_mol(self, energy):
        """Convert an energy in kT units to kJ/mol (reference states.py:327-329)."""
        return energy * self.kT_md


def calculate_reduced_potential_at_states(
    sampler_state: SamplerState,
    thermodynamic_states: List[ThermodynamicState],
    nbr_list=None,
) -> jnp.ndarray:
    """Reduced potential of one configuration at every thermodynamic state.

    Reference states.py:335-366 loops on the host.  Here, when the states
    form a homogeneous potential family, the energies come from ONE
    vmap-over-states call with the per-state parameters as data (SURVEY.md
    section 2 multistate disposition); otherwise the positions-dependent
    energy is evaluated once per *distinct potential* (memoized by
    ``cache_token``, surviving the deep copies move updates make) and the
    (beta, p) scaling vectorized.
    """
    from .potential import stack_homogeneous_params

    stacked = stack_homogeneous_params(
        [s.potential for s in thermodynamic_states]
    )
    if stacked is not None and nbr_list is None:
        param_energy_fn, params = stacked
        E = jax.vmap(
            lambda p: param_energy_fn(p, sampler_state.positions)
        )(params)
        betas = jnp.asarray([s.beta_md for s in thermodynamic_states])
        u = betas * E
        pressures = [s.pressure_md for s in thermodynamic_states]
        if any(p is not None for p in pressures):
            volume = (
                sampler_state.box_vectors[0][0]
                * sampler_state.box_vectors[1][1]
                * sampler_state.box_vectors[2][2]
            )
            pv = jnp.asarray(
                [0.0 if p is None else p for p in pressures]
            )
            u = u + betas * pv * volume
        return u

    energies = {}
    out = []
    for state in thermodynamic_states:
        # memoize by cache_token, not id(): move updates deep-copy the
        # thermodynamic states, so object identity never repeats while the
        # potential's parameters do (ADVICE r1)
        pot_id = state.potential.cache_token()
        if pot_id not in energies:
            energies[pot_id] = state.potential.compute_energy(
                sampler_state.positions, nbr_list
            )
        u = state.beta_md * energies[pot_id]
        if state.pressure is not None:
            volume = (
                sampler_state.box_vectors[0][0]
                * sampler_state.box_vectors[1][1]
                * sampler_state.box_vectors[2][2]
            )
            u = u + state.beta_md * state.pressure_md * volume
        out.append(u)
    return jnp.stack(out)
