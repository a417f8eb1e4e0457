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


@pytest.mark.slow
def test_lj_fluid_rdf_structure():
    """The equilibrated LJ liquid's g(r) shows the first peak near
    2^(1/6) sigma and decays to ~1 at half-box (structure sanity for the
    observable layer + the culled engine's production dynamics)."""
    import numpy as np

    from chiron_tpu import units
    from chiron_tpu.observables import radial_distribution_function
    from chiron_tpu.runtime import make_culled_lj_runner, make_fast_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    N = 2000
    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.8)
    pos0 = fluid.positions.value_in_unit_system(units.md_unit_system)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)

    fast = make_fast_lj_runner(potential=fluid.potential, n_particles=N,
                               topology=fluid.topology,
                               temperature=120.0 * units.kelvin, tm=256)
    fs = fast.init(pos0, box, seed=5)
    fs = fast.run(fs, 1500)
    eq = np.asarray(fast.positions(fs))

    runner = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120.0 * units.kelvin, tm=128, tn=128,
    )
    st = runner.init(eq, box, seed=5)
    frames = []
    for _ in range(10):
        st = runner.run(st, 200)
        frames.append(np.asarray(runner.positions(st)))
    runner.check(st)

    r, g = radial_distribution_function(
        np.stack(frames), np.asarray(box), n_bins=80
    )
    sigma = fluid.potential.sigma
    peak_window = (r > 1.0 * sigma) & (r < 1.3 * sigma)
    # dense liquid: strong first peak near r = 2^(1/6) sigma ~ 1.12 sigma
    assert g[peak_window].max() > 2.0
    # core exclusion
    assert g[r < 0.85 * sigma].max() < 0.2
    # decays toward unity at large r
    assert abs(g[-8:].mean() - 1.0) < 0.25


@pytest.mark.slow
def test_displacement_acceptance_band():
    """Displacement-move acceptance at standard conditions stays inside a
    statistical regression band (autotune off; fixed sigma)."""
    from chiron_tpu import units as u
    from chiron_tpu.mcmc import MonteCarloDisplacementMove
    from chiron_tpu.states import SamplerState, ThermodynamicState
    from chiron_tpu.testsystems import HarmonicOscillator
    from chiron_tpu.utils import PRNG

    PRNG.set_seed(9)
    ho = HarmonicOscillator()
    ss = SamplerState(positions=ho.positions,
                      current_PRNG_key=PRNG.get_random_key())
    ts = ThermodynamicState(potential=ho.potential,
                            temperature=300.0 * u.kelvin)
    move = MonteCarloDisplacementMove(
        displacement_sigma=0.1 * u.nanometer, number_of_moves=2000,
        autotune=False,
    )
    ss, ts, _ = move.update(ss, ts, None)
    acc = move.statistics["n_accepted"] / move.statistics["n_proposed"]
    # HO at 300 K, sigma_move = 1 A: acceptance ~0.64 analytic-ish;
    # band = +-4 sigma_binomial
    assert 0.55 < acc < 0.75, acc
