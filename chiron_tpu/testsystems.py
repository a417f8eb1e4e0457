"""Standalone test systems with analytic expectations.

Replaces ``openmmtools.testsystems`` (the reference's fixture source, see
reference chiron/tests/conftest.py:16-56 and Examples/*.py) with openmm-free
equivalents.  Each system provides initial positions, a topology, a chiron-tpu
potential, and -- where available -- closed-form ensemble expectations used by
the statistical convergence tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import units
from .potential import (
    HarmonicOscillatorPotential,
    IdealGasPotential,
    LJPotential,
)
from .topology import Topology


@dataclass
class HarmonicOscillator:
    """3D harmonic oscillator (openmmtools.testsystems.HarmonicOscillator).

    Analytic free energy: f = -(3/2) ln(2 pi kT / K) per oscillator (in units
    of kT this is the standard multi-k ladder check used by the multistate
    tests, reference test_multistate.py:211-251).
    """

    k: units.Quantity = field(
        default_factory=lambda: 100.0 * units.kilojoule_per_mole / units.nanometer ** 2
    )
    U0: units.Quantity = field(
        default_factory=lambda: 0.0 * units.kilojoule_per_mole
    )
    mass: units.Quantity = field(default_factory=lambda: 39.948 * units.amu)

    def __post_init__(self):
        self.topology = Topology.uniform(
            1, self.mass.value_in_unit_system(units.md_unit_system)
        )
        self.positions = units.Quantity(jnp.zeros((1, 3)), units.nanometer)
        self.potential = HarmonicOscillatorPotential(
            self.topology,
            k=self.k,
            x0=units.Quantity(jnp.zeros((1, 3)), units.nanometer),
            U0=self.U0,
        )

    def reduced_free_energy(self, temperature: units.Quantity) -> float:
        """Dimensionless configurational free energy: -ln Z / kT.

        f(beta) = -(3/2) ln(2 pi / (beta K)).  Differences between two k or T
        values are what MBAR must reproduce.
        """
        kT = units.kB_MD * units.strip_md(temperature, units.kelvin)
        K = self.k.value_in_unit_system(units.md_unit_system)
        return -1.5 * math.log(2.0 * math.pi * kT / K)

    def expectation_potential_energy(self, temperature: units.Quantity) -> float:
        """<U> = (3/2) kT in kJ/mol (equipartition)."""
        kT = units.kB_MD * units.strip_md(temperature, units.kelvin)
        return 1.5 * kT


@dataclass
class LennardJonesFluid:
    """Periodic LJ fluid initialized on a cubic lattice.

    Mirrors openmmtools.testsystems.LennardJonesFluid(reduced_density, n):
    box volume V = N sigma^3 / rho*, particles on a simple cubic lattice
    (collision-free start), Argon-like parameters by default
    (reference Examples/LJ_langevin.py:6-20).
    """

    nparticles: int = 1000
    reduced_density: float = 0.1
    sigma: units.Quantity = field(default_factory=lambda: 0.34 * units.nanometer)
    epsilon: units.Quantity = field(
        default_factory=lambda: 0.238 * units.kilocalories_per_mole
    )
    cutoff_factor: float = 3.0
    mass: units.Quantity = field(default_factory=lambda: 39.948 * units.amu)

    def __post_init__(self):
        sigma_md = self.sigma.value_in_unit_system(units.md_unit_system)
        volume = self.nparticles * sigma_md ** 3 / self.reduced_density
        L = volume ** (1.0 / 3.0)
        self.box_length = L
        n_side = int(math.ceil(self.nparticles ** (1.0 / 3.0)))
        spacing = L / n_side
        grid = np.arange(n_side) * spacing
        xyz = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), axis=-1)
        xyz = xyz.reshape(-1, 3)[: self.nparticles]
        self.positions = units.Quantity(
            jnp.asarray(xyz, dtype=jnp.float32), units.nanometer
        )
        self.box_vectors = units.Quantity(
            jnp.eye(3, dtype=jnp.float32) * L, units.nanometer
        )
        self.topology = Topology.uniform(
            self.nparticles, self.mass.value_in_unit_system(units.md_unit_system)
        )
        self.cutoff = self.cutoff_factor * self.sigma
        self.potential = LJPotential(
            self.topology, sigma=self.sigma, epsilon=self.epsilon, cutoff=self.cutoff
        )


@dataclass
class IdealGas:
    """Non-interacting gas in a periodic box (openmmtools.testsystems.IdealGas).

    Analytic NpT expectations (reference Examples/Idealgas.py:117-150):
    <V> = (N+1) kT / p  and  std(V) = sqrt(N+1) kT / p.
    """

    nparticles: int = 216
    temperature: units.Quantity = field(default_factory=lambda: 298.0 * units.kelvin)
    pressure: units.Quantity = field(default_factory=lambda: 1.0 * units.atmosphere)
    mass: units.Quantity = field(default_factory=lambda: 39.948 * units.amu)

    def __post_init__(self):
        kT = units.kB_MD * units.strip_md(self.temperature, units.kelvin)
        p = units.pressure_to_md(self.pressure)
        volume = (self.nparticles + 1) * kT / p  # expected NpT volume, nm^3
        L = volume ** (1.0 / 3.0)
        n_side = int(math.ceil(self.nparticles ** (1.0 / 3.0)))
        spacing = L / n_side
        grid = np.arange(n_side) * spacing
        xyz = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), axis=-1)
        xyz = xyz.reshape(-1, 3)[: self.nparticles]
        self.positions = units.Quantity(
            jnp.asarray(xyz, dtype=jnp.float32), units.nanometer
        )
        self.box_vectors = units.Quantity(
            jnp.eye(3, dtype=jnp.float32) * L, units.nanometer
        )
        self.topology = Topology.uniform(
            self.nparticles, self.mass.value_in_unit_system(units.md_unit_system)
        )
        self.potential = IdealGasPotential(self.topology)

    def get_volume_expectation(self, thermodynamic_state) -> float:
        """<V> = (N+1) kT / p in nm^3."""
        kT = thermodynamic_state.kT_md
        p = thermodynamic_state.pressure_md
        return (self.nparticles + 1) * kT / p

    def get_volume_standard_deviation(self, thermodynamic_state) -> float:
        """std(V) = sqrt(N+1) kT / p in nm^3."""
        kT = thermodynamic_state.kT_md
        p = thermodynamic_state.pressure_md
        return math.sqrt(self.nparticles + 1) * kT / p
