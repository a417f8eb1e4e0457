"""Langevin integrator tests (reference chiron/tests/test_integrators.py +
golden-seed determinism in test_mcmc.py:71-84, re-derived for our RNG stream
as SURVEY.md section 6 prescribes)."""

import jax.numpy as jnp
import pytest

from chiron_tpu import units as u
from chiron_tpu.integrators import LangevinIntegrator
from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import HarmonicOscillator, LennardJonesFluid
from chiron_tpu.utils import PRNG


def _ho_setup():
    PRNG.set_seed(1234)
    ho = HarmonicOscillator()
    ss = SamplerState(
        positions=ho.positions, current_PRNG_key=PRNG.get_random_key()
    )
    ts = ThermodynamicState(potential=ho.potential, temperature=300.0 * u.kelvin)
    return ho, ss, ts


def test_langevin_ho_runs_and_is_finite():
    ho, ss, ts = _ho_setup()
    integrator = LangevinIntegrator(
        timestep=2.0 * u.femtoseconds, report_interval=100
    )
    ss_out, _ = integrator.run(ss, ts, number_of_steps=200)
    assert ss_out.positions.shape == (1, 3)
    assert bool(jnp.all(jnp.isfinite(ss_out.positions)))
    assert bool(jnp.all(jnp.isfinite(ss_out.velocities)))


def test_langevin_determinism():
    """Fixed seed => bitwise-identical trajectory (golden-seed mechanism)."""
    _, ss1, ts = _ho_setup()
    integ = LangevinIntegrator(timestep=2.0 * u.femtoseconds)
    out1, _ = integ.run(ss1, ts, number_of_steps=100)

    _, ss2, ts2 = _ho_setup()
    integ2 = LangevinIntegrator(timestep=2.0 * u.femtoseconds)
    out2, _ = integ2.run(ss2, ts2, number_of_steps=100)

    assert jnp.all(out1.positions == out2.positions)
    assert jnp.all(out1.velocities == out2.velocities)


@pytest.mark.slow
def test_langevin_ho_equipartition():
    """<U> ~ (3/2) kT for the 3D HO (statistical convergence check)."""
    ho, ss, ts = _ho_setup()
    integ = LangevinIntegrator(
        timestep=4.0 * u.femtoseconds,
        collision_rate=2.0 / u.picoseconds,
        report_interval=10,
        save_traj_in_memory=True,
    )
    # equilibrate
    ss, _ = integ.run(ss, ts, number_of_steps=2000)
    integ.traj = []
    ss, _ = integ.run(ss, ts, number_of_steps=20000)
    energies = [float(ho.potential.compute_energy(x)) for x in integ.traj]
    mean_U = sum(energies) / len(energies)
    expected = ho.expectation_potential_energy(300.0 * u.kelvin)
    assert mean_U == pytest.approx(expected, rel=0.15)


def test_langevin_refresh_velocities():
    _, ss, ts = _ho_setup()
    integ = LangevinIntegrator(
        timestep=1.0 * u.femtoseconds, refresh_velocities=True
    )
    out, _ = integ.run(ss, ts, number_of_steps=10)
    assert out.velocities is not None


@pytest.mark.slow
def test_langevin_lj_fluid_with_neighbor_list():
    """Small LJ fluid propagates stably with on-device neighbor rebuilds."""
    PRNG.set_seed(1234)
    fluid = LennardJonesFluid(nparticles=125, reduced_density=0.4)
    ss = SamplerState(
        positions=fluid.positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=fluid.box_vectors,
    )
    ts = ThermodynamicState(potential=fluid.potential, temperature=120.0 * u.kelvin)
    nbr_list = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=fluid.cutoff,
        skin=0.3 * u.nanometer,
        n_max_neighbors=100,
    )
    integ = LangevinIntegrator(timestep=2.0 * u.femtoseconds)
    ss_out, nbr_out = integ.run(ss, ts, number_of_steps=500, nbr_list=nbr_list)

    e = float(fluid.potential.compute_energy(ss_out.positions, nbr_out))
    assert jnp.isfinite(e)
    # particles stay wrapped inside the box
    assert bool(jnp.all(ss_out.positions >= 0))
    assert bool(jnp.all(ss_out.positions <= fluid.box_length))


def test_langevin_reporter_cadence():
    """Reports fire at steps where elapsed % interval == 0
    (reference integrators.py:197-205)."""

    class CaptureReporter:
        def __init__(self):
            self.records = []

        def report(self, d):
            self.records.append(d)

    _, ss, ts = _ho_setup()
    rep = CaptureReporter()
    integ = LangevinIntegrator(
        timestep=1.0 * u.femtoseconds, report_interval=50, reporter=rep
    )
    integ.run(ss, ts, number_of_steps=200)
    steps = [r["step"] for r in rep.records]
    assert steps == [0, 50, 100, 150]
    assert all("potential_energy" in r for r in rep.records)


@pytest.mark.slow
def test_gradient_through_trajectory_matches_finite_difference():
    """Differentiable MD (the reference's tagline capability it never
    exercises): reverse-mode d<U_final>/d_eps through a scanned BAOAB
    chain must match a central finite difference
    (examples/differentiable_md.py is the full demo)."""
    import jax
    import jax.numpy as jnp

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from differentiable_md import make_traj_energy

    from chiron_tpu import units
    from chiron_tpu.testsystems import LennardJonesFluid

    n = 27
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.5)
    box_diag = jnp.diagonal(jnp.asarray(
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        jnp.float32))
    x0 = jnp.asarray(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        jnp.float32)
    masses = jnp.full((n,), 39.9, jnp.float32)
    loss = make_traj_energy(n, box_diag, units.kB_MD * 120.0, masses,
                            n_steps=25)
    key = jax.random.PRNGKey(3)
    eps0, sig0 = jnp.float32(0.9), jnp.float32(0.34)
    g = float(jax.grad(loss)(eps0, sig0, x0, key))
    h = 1e-3
    fd = (float(loss(eps0 + h, sig0, x0, key))
          - float(loss(eps0 - h, sig0, x0, key))) / (2 * h)
    assert abs(fd - g) / max(abs(fd), 1e-9) < 0.05, (g, fd)


def test_runner_step_fn_tracks_neighbor_capacity_regrowth():
    """make_langevin_runner builds its step fn before init() builds the
    list; when init's build regrows n_max_neighbors (the >=+10 rule),
    the in-scan rebuild branch must use the LIVE capacity, not the one
    captured at factory time (lax.cond branch-shape mismatch otherwise)."""
    from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
    from chiron_tpu.runtime import make_langevin_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=200, reduced_density=0.6)
    pairs = NeighborListNsqrd(
        OrthogonalPeriodicSpace(), cutoff=fluid.cutoff,
        skin=0.5 * u.nanometer, n_max_neighbors=8,  # deliberately too small
    )
    runner = make_langevin_runner(
        fluid.potential, pairs=pairs, topology=fluid.topology,
        temperature=120.0 * u.kelvin,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(u.md_unit_system),
        fluid.box_vectors.value_in_unit_system(u.md_unit_system), seed=0,
    )
    assert pairs.n_max_neighbors > 8  # the regrow actually happened
    state = runner.run(state, 20)
    assert not bool(state.overflowed)
    assert bool(jnp.isfinite(state.x).all())
