"""Checkpoint/restart integration: resume a run and reproduce it exactly.

The reference cannot reconstruct a sampler from disk (SURVEY.md section 5);
this is the restartability capability the TPU build adds: a checkpointed
(positions, velocities, box, PRNG key) pytree resumes bitwise-identically.
"""

import jax.numpy as jnp
import pytest
import numpy as np

from chiron_tpu import units as u
from chiron_tpu.checkpoint import (
    load_checkpoint,
    load_sampler_checkpoint,
    save_checkpoint,
    save_sampler_checkpoint,
)
from chiron_tpu.integrators import LangevinIntegrator
from chiron_tpu.mcmc import MonteCarloDisplacementMove
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import HarmonicOscillator, LennardJonesFluid
from chiron_tpu.utils import PRNG


def test_langevin_restart_is_bitwise_identical(tmp_path):
    """Segment A+B in one process == A, checkpoint, restore, B."""
    PRNG.set_seed(99)
    ho = HarmonicOscillator()
    ss = SamplerState(positions=ho.positions, current_PRNG_key=PRNG.get_random_key())
    ts = ThermodynamicState(potential=ho.potential, temperature=300.0 * u.kelvin)
    integ = LangevinIntegrator(timestep=2.0 * u.femtoseconds)

    # continuous run: 100 + 100 steps
    ss_cont, _ = integ.run(ss, ts, number_of_steps=100)
    ss_cont, _ = integ.run(ss_cont, ts, number_of_steps=100)

    # checkpointed run
    PRNG.set_seed(99)
    ss2 = SamplerState(positions=ho.positions, current_PRNG_key=PRNG.get_random_key())
    integ2 = LangevinIntegrator(timestep=2.0 * u.femtoseconds)
    ss2, _ = integ2.run(ss2, ts, number_of_steps=100)
    path = str(tmp_path / "mid.npz")
    save_sampler_checkpoint(path, ss2, iteration=100)

    # "new process": fresh sampler state restored from disk
    PRNG.set_seed(1)  # different global stream; restore must override
    ss3 = SamplerState(
        positions=ho.positions, current_PRNG_key=PRNG.get_random_key()
    )
    meta = load_sampler_checkpoint(path, ss3)
    assert meta["iteration"] == 100
    integ3 = LangevinIntegrator(timestep=2.0 * u.femtoseconds)
    ss3, _ = integ3.run(ss3, ts, number_of_steps=100)

    assert jnp.all(ss3.positions == ss_cont.positions)
    assert jnp.all(ss3.velocities == ss_cont.velocities)


@pytest.mark.slow
def test_mc_restart_with_statistics(tmp_path):
    """MC chain restart: state + move statistics + tuned parameter resume."""
    PRNG.set_seed(7)
    fluid = LennardJonesFluid(nparticles=27, reduced_density=0.2)
    ss = SamplerState(
        positions=fluid.positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=fluid.box_vectors,
    )
    ts = ThermodynamicState(potential=fluid.potential, temperature=120.0 * u.kelvin)
    move = MonteCarloDisplacementMove(
        displacement_sigma=0.05 * u.nanometer, number_of_moves=50,
        autotune=True, autotune_interval=20,
    )
    ss, _, _ = move.update(ss, ts, None)

    path = str(tmp_path / "mc.npz")
    save_checkpoint(
        path,
        {"sampler": ss.as_data()},
        metadata={
            "statistics": move.statistics,
            "displacement_sigma_nm": float(
                move.displacement_sigma.value_in_unit_system(u.md_unit_system)
            ),
        },
    )

    # restore into a fresh move/state
    PRNG.set_seed(1234)
    ss2 = SamplerState(
        positions=fluid.positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=fluid.box_vectors,
    )
    tree, meta = load_checkpoint(path, like={"sampler": ss2.as_data()})
    ss2.update_from_data(tree["sampler"])
    move2 = MonteCarloDisplacementMove(
        displacement_sigma=meta["displacement_sigma_nm"] * u.nanometer,
        number_of_moves=50, autotune=True, autotune_interval=20,
    )
    move2.statistics = meta["statistics"]
    assert move2.n_proposed == 50
    assert jnp.all(ss2.positions == ss.positions)

    ss2, _, _ = move2.update(ss2, ts, None)
    assert move2.n_proposed == 100  # cumulative statistics continue


def test_multistate_states_roundtrip(tmp_path):
    """All replica states of a multistate run checkpoint and restore."""
    PRNG.set_seed(3)
    ho = HarmonicOscillator()
    states = [
        SamplerState(positions=ho.positions, current_PRNG_key=PRNG.get_random_key())
        for _ in range(4)
    ]
    for i, s in enumerate(states):
        s.positions = jnp.full((1, 3), float(i))
    tree = {f"replica_{i}": s.as_data() for i, s in enumerate(states)}
    path = str(tmp_path / "ms.npz")
    save_checkpoint(path, tree, metadata={"iteration": 5, "n_replicas": 4})

    PRNG.set_seed(3)
    fresh = [
        SamplerState(positions=ho.positions, current_PRNG_key=PRNG.get_random_key())
        for _ in range(4)
    ]
    like = {f"replica_{i}": s.as_data() for i, s in enumerate(fresh)}
    restored, meta = load_checkpoint(path, like=like)
    assert meta["n_replicas"] == 4
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(restored[f"replica_{i}"].positions),
            np.full((1, 3), float(i)),
        )


@pytest.mark.slow
def test_pt_session_restart_is_bitwise_identical(tmp_path):
    """A ParallelTemperingSampler session killed mid-run and restored from
    save_session continues bit-compatibly with the uninterrupted run
    (iteration counter, kT ladder, swap statistics, PRNG keys, reporter
    histories -- VERDICT r1 item 5)."""
    from chiron_tpu import units as u
    from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
    from chiron_tpu.potential import HarmonicOscillatorPotential
    from chiron_tpu.testsystems import HarmonicOscillator

    ho = HarmonicOscillator(
        k=100.0 * u.kilojoule_per_mole / u.nanometer ** 2
    )
    temps = [300.0 * (1.2 ** i) for i in range(4)]

    def make():
        pt = ParallelTemperingSampler(
            potential=ho.potential,
            temperatures=[t * u.kelvin for t in temps],
            timestep=4.0 * u.femtoseconds,
            mesh=make_replica_mesh(1),
        )
        pt.initialize(ho.positions, seed=7)
        return pt

    # uninterrupted: 6 iterations
    ref = make()
    ref.run(6, steps_per_iteration=25, seed=11)

    # interrupted: 3 iterations, save, restore into a FRESH sampler, resume
    a = make()
    a.run(3, steps_per_iteration=25, seed=11)
    path = str(tmp_path / "pt_session.npz")
    a.save_session(path)

    b = make()
    b.load_session(path)
    assert b._iteration == 3
    # resume WITHOUT re-passing the seed: run(seed=None) must use the
    # restored swap seed (11) or the swap stream silently diverges
    b.run(3, steps_per_iteration=25)

    assert b._iteration == ref._iteration
    assert b.n_proposed_swaps == ref.n_proposed_swaps
    assert b.n_accepted_swaps == ref.n_accepted_swaps
    np.testing.assert_array_equal(np.asarray(b.kTs), np.asarray(ref.kTs))
    np.testing.assert_array_equal(
        np.asarray(b.positions), np.asarray(ref.positions)
    )
    assert len(b._u_history) == len(ref._u_history) == 6
    np.testing.assert_array_equal(
        np.stack(b._u_history), np.stack(ref._u_history)
    )


def test_sampler_checkpoint_field_mismatch_raises(tmp_path):
    """A checkpoint without velocities must not silently load into a
    template that has them (field-presence header, ADVICE r1)."""
    from chiron_tpu.checkpoint import (
        load_sampler_checkpoint, save_sampler_checkpoint,
    )

    PRNG.set_seed(5)
    ho = HarmonicOscillator()
    src = SamplerState(
        positions=ho.positions, current_PRNG_key=PRNG.get_random_key()
    )
    path = str(tmp_path / "novel.npz")
    save_sampler_checkpoint(path, src, iteration=1)

    tmpl = SamplerState(
        positions=ho.positions,
        velocities=u.Quantity(
            jnp.zeros_like(jnp.asarray(ho.positions._value))
            if hasattr(ho.positions, "_value")
            else jnp.zeros((1, 3)),
            u.nanometer / u.picosecond,
        ),
        current_PRNG_key=PRNG.get_random_key(),
    )
    with pytest.raises(ValueError, match="no velocities"):
        load_sampler_checkpoint(path, tmpl)


@pytest.mark.slow
def test_multistate_session_restart_matches_inprocess_continuation(tmp_path):
    """A MultiStateSampler session saved and restored into a fresh sampler
    continues exactly like the same sampler continuing in-process."""
    import math

    from chiron_tpu.mcmc import LangevinDynamicsMove, MCMCSampler, MoveSchedule
    from chiron_tpu.multistate import ReplicaExchangeSampler
    from chiron_tpu.potential import HarmonicOscillatorPotential
    from chiron_tpu.reporters import BaseReporter, MultistateReporter

    def make(subdir):
        ho = HarmonicOscillator()
        T = 300.0 * u.kelvin
        kT = u.BOLTZMANN_CONSTANT_kB * T * u.AVOGADRO_CONSTANT_NA
        states = [
            ThermodynamicState(
                HarmonicOscillatorPotential(
                    ho.topology,
                    k=kT / u.Quantity(2.0 + 0.2 * i, u.angstrom) ** 2,
                ),
                temperature=T,
            )
            for i in range(4)
        ]
        PRNG.set_seed(77)
        sampler_states = [
            SamplerState(ho.positions, current_PRNG_key=PRNG.get_random_key())
            for _ in range(4)
        ]
        BaseReporter.set_directory(str(tmp_path / subdir))
        reporter = MultistateReporter()
        reporter.reset_reporter_file()
        move = LangevinDynamicsMove(
            timestep=2.0 * u.femtoseconds, number_of_steps=25
        )
        s = ReplicaExchangeSampler(
            mcmc_sampler=MCMCSampler(
                MoveSchedule([("LangevinDynamicsMove", move)])
            ),
            reporter=reporter,
        )
        s.create(states, sampler_states, [None] * 4)
        return s

    # in-process continuation: run(3) then run(3) more
    ref = make("ref")
    ref.run(3)
    ref.run(3)

    # interrupted: run(3), save, restore into a FRESH sampler, run(3)
    a = make("a")
    a.run(3)
    path = str(tmp_path / "ms_session.npz")
    a.save_session(path)
    b = make("b")
    b.load_session(path)
    assert b._iteration == 3
    b.run(3)

    assert b._iteration == ref._iteration
    np.testing.assert_array_equal(
        b._replica_thermodynamic_states, ref._replica_thermodynamic_states
    )
    np.testing.assert_array_equal(
        b._energy_thermodynamic_states, ref._energy_thermodynamic_states
    )
    for sb, sr in zip(b._sampler_states, ref._sampler_states):
        np.testing.assert_array_equal(
            np.asarray(sb.positions), np.asarray(sr.positions)
        )


@pytest.mark.slow
def test_culled_npt_carry_checkpoint_is_bitwise_identical(tmp_path):
    """The culled NpT carry (incl. the live tile-pair list, slack budget,
    and barostat statistics) round-trips through the generic pytree
    checkpoint and resumes bitwise: A+B in-process == A, save, load, B."""
    import numpy as np

    from chiron_tpu.checkpoint import load_checkpoint, save_checkpoint
    from chiron_tpu.runtime import make_culled_npt_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    n = 125
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.1)
    box = np.asarray(
        fluid.box_vectors.value_in_unit_system(u.md_unit_system))
    side = 5
    rng = np.random.default_rng(11)
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3,
                             indexing="ij"), -1).reshape(-1, 3)
    pos = (g + rng.uniform(0.25, 0.75, (n, 3))) * (np.diag(box) / side)
    r = make_culled_npt_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=300.0 * u.kelvin, pressure=50.0 * u.atmosphere,
        tm=8, tn=16, barostat_interval=10, segment_steps=20)
    st0 = r.init(pos, box, seed=3)

    st_cont = r.run(r.run(st0, 60), 60)

    st_a = r.run(st0, 60)
    path = str(tmp_path / "npt.npz")
    save_checkpoint(path, st_a)
    st_b, _meta = load_checkpoint(path, like=st_a)
    st_resumed = r.run(st_b, 60)

    for name in ("x", "v", "F", "box_diag", "n_accepted", "n_proposed",
                 "vmax_scale", "step"):
        a = getattr(st_cont, name)
        b = getattr(st_resumed, name)
        assert bool(jnp.all(jnp.asarray(a) == jnp.asarray(b))), name
