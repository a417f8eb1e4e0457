"""Checkpoint/restart integration: resume a run and reproduce it exactly.

The reference cannot reconstruct a sampler from disk (SURVEY.md section 5);
this is the restartability capability the TPU build adds: a checkpointed
(positions, velocities, box, PRNG key) pytree resumes bitwise-identically.
"""

import jax.numpy as jnp
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
