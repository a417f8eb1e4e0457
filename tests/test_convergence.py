"""Statistical-physics convergence tests (reference test_convergence_tests.py).

Analytic, memory-free invariants:
* kinetic temperature under the Langevin thermostat -> (3/2) N kT,
* BAOAB with gamma=0 reduces to velocity Verlet -> total energy conserved.
"""

import jax
import jax.numpy as jnp
import pytest

from chiron_tpu import units
from chiron_tpu.runtime import make_fast_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid


@pytest.mark.slow
def test_lj_fluid_kinetic_temperature():
    """<KE> = (3/2) N kT within 3% under the BAOAB thermostat."""
    N = 256
    T = 120.0
    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.4)
    runner = make_fast_lj_runner(
        fluid.potential,
        n_particles=N,
        topology=fluid.topology,
        temperature=T * units.kelvin,
        timestep=2.0 * units.femtoseconds,
        tm=64,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3,
    )
    state = runner.run(state, 2000)  # equilibrate
    kes = []
    mass = 39.948
    for _ in range(30):
        state = runner.run(state, 200)
        v = runner.velocities(state)
        kes.append(float(0.5 * mass * jnp.sum(v * v)))
    mean_ke = sum(kes) / len(kes)
    expected = 1.5 * N * units.kB_MD * T
    assert mean_ke == pytest.approx(expected, rel=0.03)


@pytest.mark.slow
def test_baoab_gamma_zero_conserves_energy():
    """gamma=0 => velocity Verlet; total energy drift < 0.5% over 2000 steps."""
    N = 125
    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.4)
    runner = make_fast_lj_runner(
        fluid.potential,
        n_particles=N,
        topology=fluid.topology,
        temperature=60.0 * units.kelvin,
        timestep=1.0 * units.femtoseconds,
        collision_rate=0.0 / units.picoseconds,
        tm=64,
        exact_forces=True,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=5,
    )
    # Let the violent lattice-relaxation transient pass first (the initial
    # configuration sits far from equilibrium and converts large potential
    # energy in the first ~1000 steps); then total energy must be conserved.
    mass = 39.948

    def total_energy(state):
        v = runner.velocities(state)
        ke = float(0.5 * mass * jnp.sum(v * v))
        pe = float(runner.energy(state))
        return ke + pe, ke

    state = runner.run(state, 1000)
    e0, _ = total_energy(state)
    state = runner.run(state, 2000)
    e1, ke = total_energy(state)
    # scale by the kinetic energy (total can be near zero)
    assert abs(e1 - e0) / max(abs(ke), 1.0) < 0.01
