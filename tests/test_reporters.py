"""Reporter/IO and checkpoint tests (reference chiron/tests/test_utils.py)."""

import numpy as np
import pytest

from chiron_tpu.checkpoint import (
    load_checkpoint,
    load_sampler_checkpoint,
    save_checkpoint,
    save_sampler_checkpoint,
)
from chiron_tpu.reporters import (
    BaseReporter,
    DCDWriter,
    LangevinDynamicsReporter,
    MCReporter,
    MultistateReporter,
    read_dcd,
    _SimulationReporter,
)


def test_buffered_hdf5_roundtrip(tmp_path):
    BaseReporter.set_directory(str(tmp_path))
    rep = _SimulationReporter("test_log", buffer_size=3)
    for i in range(10):
        rep.report({"energy": float(i), "step": i})
    rep.flush_buffer()
    e = rep.get_property("energy")
    s = rep.get_property("step")
    assert np.allclose(e, np.arange(10.0))
    assert np.allclose(s, np.arange(10))
    assert set(rep.get_available_keys()) == {"energy", "step"}


def test_buffer_vs_flushed_reads(tmp_path):
    """get_property serves live-buffer data before any flush
    (reference reporters.py:171-203)."""
    BaseReporter.set_directory(str(tmp_path))
    rep = _SimulationReporter("test_buffer", buffer_size=100)
    rep.report({"x": 1.0})
    rep.report({"x": 2.0})
    assert np.allclose(rep.get_property("x"), [1.0, 2.0])
    assert rep.get_property("missing") is None


def test_mc_reporter_name(tmp_path):
    BaseReporter.set_directory(str(tmp_path))
    rep = MCReporter()
    assert rep.log_file_path.name == "mc_reporter.h5"
    rep.report({"volume": 8.0})
    rep.report({"volume": 9.0})
    rep.flush_buffer()
    assert np.allclose(rep.get_property("volume"), [8.0, 9.0])


def test_dcd_writer_roundtrip(tmp_path):
    path = str(tmp_path / "traj.dcd")
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(5, 10, 3)).astype(np.float32)
    w = DCDWriter(path, n_atoms=10, with_unitcell=True)
    for f in frames:
        w.write(f, box_lengths=np.array([20.0, 20.0, 20.0]))
    w.close()
    back = read_dcd(path)
    assert back.shape == (5, 10, 3)
    assert np.allclose(back, frames, atol=1e-6)


def test_langevin_reporter_writes_trajectory(tmp_path):
    BaseReporter.set_directory(str(tmp_path))
    rep = LangevinDynamicsReporter("lang_test", buffer_size=2)
    rng = np.random.default_rng(0)
    for i in range(4):
        rep.report(
            {
                "positions": rng.normal(size=(7, 3)).astype(np.float32),
                "box_vectors": np.eye(3) * 3.0,
                "potential_energy": float(i),
                "step": i,
            }
        )
    rep.flush_buffer()
    xyz = rep.read_from_trajectory()
    assert xyz.shape == (4, 7, 3)
    assert np.allclose(rep.get_property("potential_energy"), np.arange(4.0))


def test_multistate_reporter_fanout(tmp_path):
    """Per-replica trajectory fan-out + u_kn stacking
    (reference reporters.py:247-262, test_utils.py:86-137)."""
    BaseReporter.set_directory(str(tmp_path))
    rep = MultistateReporter(buffer_size=1)
    rng = np.random.default_rng(0)
    n_iter, n_states, n_replicas, n_atoms = 3, 2, 2, 5
    for t in range(n_iter):
        rep.report(
            {
                "positions": rng.normal(size=(n_replicas, n_atoms, 3)),
                "box_vectors": np.stack([np.eye(3) * 4.0] * n_replicas),
                "u_kn": rng.normal(size=(n_states, n_replicas)),
                "state_index": np.arange(n_replicas),
                "step": t,
            }
        )
    rep.flush_buffer()
    u_kn = rep.get_property("u_kn")
    assert u_kn.shape == (n_iter, n_states, n_replicas)
    # replica trajectory files exist
    assert (tmp_path / "replica_0.dcd").exists()
    assert (tmp_path / "replica_1.dcd").exists()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.eye(2)}}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, tree, metadata={"iteration": 7})
    restored, meta = load_checkpoint(path, like=tree)
    assert meta["iteration"] == 7
    assert np.allclose(restored["a"], np.arange(5.0))
    assert np.allclose(restored["b"]["c"], np.eye(2))


def test_sampler_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from chiron_tpu import units as u
    from chiron_tpu.states import SamplerState
    from chiron_tpu.utils import PRNG

    PRNG.set_seed(7)
    ss = SamplerState(
        positions=u.Quantity(jnp.ones((3, 3)), u.nanometer),
        current_PRNG_key=PRNG.get_random_key(),
        velocities=u.Quantity(jnp.zeros((3, 3)), u.nanometer / u.picosecond),
        box_vectors=u.Quantity(jnp.eye(3) * 2, u.nanometer),
    )
    path = str(tmp_path / "sampler.npz")
    save_sampler_checkpoint(path, ss, iteration=12, extra={"note": "hi"})

    PRNG.set_seed(7)
    ss2 = SamplerState(
        positions=u.Quantity(jnp.zeros((3, 3)), u.nanometer),
        current_PRNG_key=PRNG.get_random_key(),
        velocities=u.Quantity(jnp.ones((3, 3)), u.nanometer / u.picosecond),
        box_vectors=u.Quantity(jnp.eye(3), u.nanometer),
    )
    meta = load_sampler_checkpoint(path, ss2)
    assert meta["iteration"] == 12
    assert meta["note"] == "hi"
    assert np.allclose(np.asarray(ss2.positions), 1.0)
    assert np.allclose(np.asarray(ss2.box_vectors), np.eye(3) * 2)


@pytest.mark.slow
def test_parallel_tempering_reporter_integration(tmp_path):
    """PT writes u_kn / state_index / per-replica trajectories through the
    MultistateReporter (reference schema chiron/reporters.py:210-269)."""
    import numpy as np

    from chiron_tpu import units as u
    from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
    from chiron_tpu.reporters import BaseReporter, MultistateReporter
    from chiron_tpu.testsystems import HarmonicOscillator

    BaseReporter.set_directory(str(tmp_path))
    reporter = MultistateReporter()
    reporter.reset_reporter_file()

    ho = HarmonicOscillator(
        k=100.0 * u.kilojoule_per_mole / u.nanometer ** 2
    )
    temps = [300.0 * (1.2 ** i) for i in range(4)]
    pt = ParallelTemperingSampler(
        potential=ho.potential,
        temperatures=[t * u.kelvin for t in temps],
        timestep=4.0 * u.femtoseconds,
        mesh=make_replica_mesh(1),
        reporter=reporter,
    )
    pt.initialize(ho.positions, seed=7)
    pt.run(5, steps_per_iteration=20, seed=3)

    u_kn = reporter.get_property("u_kn")
    assert u_kn.shape == (5, 4, 4)
    assert np.isfinite(u_kn).all()
    si = reporter.get_property("state_index")
    assert si.shape == (5, 4)
    assert set(si[-1]) == {0, 1, 2, 3}
    step = reporter.get_property("step")
    assert list(step) == [1, 2, 3, 4, 5]
    # per-replica trajectory fan-out wrote frames
    pos = reporter.get_property("positions")
    assert pos.shape[0] == 5 and pos.shape[1] == 4


def test_multistate_final_frames_reach_replica_files(tmp_path):
    """flush_buffer must drain the parent INTO the replica children
    BEFORE flushing them: with child buffer_size > pending frames, the
    last reported iteration was previously stranded in the children's
    in-memory buffers and never written."""
    BaseReporter.set_directory(str(tmp_path))
    rep = MultistateReporter(buffer_size=10)  # nothing auto-flushes
    rng = np.random.default_rng(1)
    n_iter, n_replicas, n_atoms = 3, 2, 4
    for t in range(n_iter):
        rep.report(
            {
                "positions": rng.normal(size=(n_replicas, n_atoms, 3)),
                "box_vectors": np.stack([np.eye(3) * 4.0] * n_replicas),
                "u_kn": rng.normal(size=(2, n_replicas)),
                "state_index": np.arange(n_replicas),
                "step": t,
            }
        )
    rep.flush_buffer()  # the ONE final flush a run performs
    for r in range(n_replicas):
        xyz = read_dcd(str(tmp_path / f"replica_{r}.dcd"))
        assert xyz.shape[0] == n_iter, (r, xyz.shape)


def test_langevin_positions_readable_before_first_flush(tmp_path):
    """get_property('positions') must include buffered frames (and not
    crash on the missing DCD) before the first flush, matching the
    pending-concat semantics of the scalar properties."""
    BaseReporter.set_directory(str(tmp_path))
    rep = LangevinDynamicsReporter("preflush", buffer_size=100)
    rng = np.random.default_rng(2)
    frames = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(3)]
    for i, f in enumerate(frames):
        rep.report({"positions": f, "potential_energy": float(i), "step": i})
    xyz = rep.get_property("positions")
    assert xyz.shape == (3, 5, 3)
    np.testing.assert_allclose(xyz, np.stack(frames), rtol=1e-6)
    # after a flush the same read concatenates flushed + pending
    rep.flush_buffer()
    rep.report({"positions": frames[0], "potential_energy": 9.0, "step": 3})
    xyz2 = rep.get_property("positions")
    assert xyz2.shape == (4, 5, 3)


def test_checkpoint_save_is_atomic_and_path_verbatim(tmp_path):
    """A non-.npz path must round-trip (np.savez's silent suffix append
    is bypassed), overwriting must go through a temp file, and no .tmp
    litter survives."""
    import jax.numpy as jnp
    import os

    path = str(tmp_path / "run.ckpt")  # no .npz suffix
    save_checkpoint(path, {"a": jnp.arange(3.0)}, metadata={"i": 1})
    assert os.path.exists(path) and not os.path.exists(path + ".npz")
    assert not os.path.exists(path + ".tmp")
    restored, meta = load_checkpoint(path, like={"a": jnp.zeros(3)})
    assert meta["i"] == 1 and np.allclose(restored["a"], np.arange(3.0))
    # overwrite in place keeps working
    save_checkpoint(path, {"a": jnp.ones(3)}, metadata={"i": 2})
    restored2, meta2 = load_checkpoint(path, like={"a": jnp.zeros(3)})
    assert meta2["i"] == 2 and np.allclose(restored2["a"], 1.0)


def test_checkpoint_structure_mismatch_raises(tmp_path):
    """Same leaf COUNT but different pytree STRUCTURE must raise instead
    of silently permuting leaves into the wrong slots."""
    import jax.numpy as jnp

    path = str(tmp_path / "s.npz")
    save_checkpoint(path, {"x": jnp.zeros((4, 3)), "v": jnp.ones((4, 3))})
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(path, like={"x": jnp.zeros((4, 3)),
                                    "box": jnp.zeros((4, 3))})


def test_sampler_checkpoint_restores_move_statistics(tmp_path):
    """Autotuned sigma, acceptance statistics, and attempt counters
    survive a save/load cycle when the move mapping is passed."""
    import jax

    from chiron_tpu import units as u
    from chiron_tpu.mcmc import MonteCarloDisplacementMove
    from chiron_tpu.states import SamplerState

    state = SamplerState(
        np.zeros((4, 3)) * u.nanometer,
        current_PRNG_key=jax.random.PRNGKey(0),
    )
    move = MonteCarloDisplacementMove(
        displacement_sigma=0.1 * u.nanometer, number_of_moves=10,
        autotune=True,
    )
    move.n_accepted, move.n_proposed = 37, 50
    move._number_of_attempts_made = 50
    move._move_iteration = 5
    move._set_param_value(0.271)
    path = str(tmp_path / "mv.npz")
    save_sampler_checkpoint(path, state, iteration=5,
                            moves={"disp": move})

    fresh_state = SamplerState(
        np.ones((4, 3)) * u.nanometer,
        current_PRNG_key=jax.random.PRNGKey(1),
    )
    fresh_move = MonteCarloDisplacementMove(
        displacement_sigma=0.1 * u.nanometer, number_of_moves=10,
        autotune=True,
    )
    meta = load_sampler_checkpoint(path, fresh_state,
                                   moves={"disp": fresh_move})
    assert meta["iteration"] == 5
    assert fresh_move.n_accepted == 37 and fresh_move.n_proposed == 50
    assert fresh_move._number_of_attempts_made == 50
    assert fresh_move._move_iteration == 5
    assert fresh_move._param_value() == pytest.approx(0.271)
