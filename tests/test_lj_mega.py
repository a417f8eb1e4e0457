"""Megakernel (one-Pallas-call segment) tests: the in-kernel list build
must reproduce the XLA-built list bit-for-bit (validated through force
equality), repair must be a pure permutation of the physical state, and
the runner path must hold every invariant (CLAUDE.md: jnp/classic paths
are the semantic oracles; interpret mode on CPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.lj_cull import CulledLJMD, slab_y_key, sort_by_key
from chiron_tpu.ops.lj_mega import mega_md_raw

N = 1000
SIGMA, EPS, CUTOFF = 0.34, 0.99579, 1.02
L = 5.0
TM = TN = 128  # megakernel requires >=128 tiles (C=128 register layout)


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(7)
    n_side = int(np.ceil(N ** (1 / 3)))
    g = (np.arange(n_side) + 0.5) * L / n_side
    xyz = np.stack(
        np.meshgrid(g, g, g, indexing="ij"), -1
    ).reshape(-1, 3)[:N]
    xyz = (xyz + rng.normal(0, 0.02, xyz.shape)).astype(np.float32) % L
    md = CulledLJMD(
        N, SIGMA, EPS, CUTOFF,
        masses_lane=np.full(N, 39.9), dt=0.002, gamma=1.0,
        kT=0.008314 * 120, tm=TM, tn=TN, slack=0.2,
    )
    pos3 = jnp.zeros((3, md.n_pad), jnp.float32)
    pos3 = pos3.at[:, :N].set(jnp.asarray(xyz.T))
    box_diag = jnp.asarray([L, L, L], jnp.float32)
    key = slab_y_key(pos3, N, nslab=0, L=L)  # pure-x sort
    pos3s, _ = sort_by_key(key, pos3, ())
    return md, pos3s, box_diag


def _run_mega(md, x3, v3, F3, box_diag, n_steps, capacity, passes,
              seed=3):
    w_in = v3 - (0.5 * md.dt) * F3 * md.minv
    x1, w1, F1, flag = mega_md_raw(
        x3, w_in, F3, box_diag,
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        jnp.zeros((1, 1), jnp.int32),
        md.minv, md.sigv,
        N, n_steps, md.tm, md.tn, md.sigma, md.epsilon, md.cutoff,
        md.dt, md.a, md.b, True, md.interpret, unroll=md.unroll,
        slack=md.slack, capacity=capacity, repair_passes=passes,
    )
    v1 = w1 + (0.5 * md.dt) * F1 * md.minv
    return x1, v1, F1, flag


@pytest.mark.slow
def test_mega_segment_matches_classic_path(system):
    """With repair off, a megakernel segment from a sorted state must
    match the classic [XLA build + run_segment] path EXACTLY -- same
    list (validated through identical forces), same noise stream, same
    arithmetic."""
    md, pos3s, box_diag = system
    pairs = md.build_pairs(pos3s, box_diag, capacity=512)
    assert not bool(pairs.overflowed)
    v0 = 0.01 * md.sigv * jnp.ones((3, md.n_pad), jnp.float32)
    F0 = md.force(pos3s, box_diag, pairs, approx_recip=True)

    xc, vc, Fc, stale = md.run_segment(
        pos3s, v0, F0, box_diag, pairs, seed=3, step_offset=0,
        n_steps=5, approx_recip=True, drift_slack=md.slack,
    )
    xm, vm, Fm, flag = _run_mega(
        md, pos3s, v0, F0, box_diag, n_steps=5, capacity=512, passes=0,
    )
    assert bool(flag[0, 0] > 0.5) == bool(stale)
    for a, b, name in ((xc, xm, "x"), (vc, vm, "v"), (Fc, Fm, "F")):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0, name


@pytest.mark.slow
def test_mega_repair_is_pure_permutation(system):
    """Repair passes must only PERMUTE real particles (identical
    physical multiset, padding lanes untouched) and leave the state
    better x-ordered."""
    md, pos3s, box_diag = system
    pairs = md.build_pairs(pos3s, box_diag, capacity=512)
    v0 = 0.01 * md.sigv * jnp.ones((3, md.n_pad), jnp.float32)
    F0 = md.force(pos3s, box_diag, pairs, approx_recip=True)

    x0, v0_, F0_, _ = _run_mega(
        md, pos3s, v0, F0, box_diag, n_steps=5, capacity=512, passes=0,
    )
    x1, v1, F1, _ = _run_mega(
        md, pos3s, v0, F0, box_diag, n_steps=5, capacity=512, passes=16,
    )
    # padding lanes never move
    assert bool(jnp.array_equal(x0[:, N:], x1[:, N:]))
    # real lanes: same multiset of (x, v, F) columns
    def canon(x, v, f):
        m = np.concatenate(
            [np.asarray(x)[:, :N], np.asarray(v)[:, :N],
             np.asarray(f)[:, :N]], axis=0
        )
        order = np.lexsort(m[::-1])
        return m[:, order]

    assert np.array_equal(canon(x0, v0_, F0_), canon(x1, v1, F1))
    # and the order improved (or stayed) relative to no repair
    def inversions(x):
        xs = np.asarray(x)[0, :N]
        return int(np.sum(xs[:-1] > xs[1:]))

    assert inversions(x1) <= inversions(x0)


@pytest.mark.slow
def test_mega_runner_end_to_end_and_latches(system):
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner, make_fast_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.4)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    # melt the lattice with the dense engine first (violent transients
    # belong to the dense engine -- BENCH.md invariants; bench.py does
    # the same)
    fast = make_fast_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120.0 * units.kelvin)
    fs = fast.init(
        fluid.positions.value_in_unit_system(units.md_unit_system), box,
        seed=5)
    fs = fast.run(fs, 200)
    eq = np.asarray(fast.positions(fs))
    runner = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120.0 * units.kelvin, tm=TM, tn=TN,
        segment_steps=10, sort_mode="x", megakernel=True,
    )
    state = runner.init(eq, box, seed=5)
    state = runner.run(state, 100)
    runner.check(state)
    E = float(runner.energy(state))
    assert np.isfinite(E)
    # order stays maintained by the in-kernel repair across segments
    # (cyclic/min-image metric: boundary-wrapped particles are
    # cyclically near their rank, not linear-order inversions)
    xs = np.asarray(state.x)[0, :N]
    L_box = float(np.asarray(state.box_diag)[0, 0])
    d = xs[1:] - xs[:-1]
    d -= L_box * np.round(d / L_box)
    assert np.mean(d >= 0) > 0.95

    # the drift latch still fires through the megakernel flag
    tight = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=300.0 * units.kelvin, tm=TM, tn=TN,
        segment_steps=200, sort_mode="x", megakernel=True, slack=0.02,
    )
    st = tight.init(eq, box, seed=5)
    st = tight.run(st, 200)
    with pytest.raises(RuntimeError, match="invariant violated"):
        tight.check(st)


@pytest.mark.slow
def test_mega_rejects_slab_regime(system):
    """The megakernel only supports the pure-x key; a slab-key layout
    must be rejected with a clear error (simulated by forcing nslab)."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.4)
    runner = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120.0 * units.kelvin, tm=TM, tn=TN,
        segment_steps=10, sort_mode="x", megakernel=True,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=5,
    )
    runner.nslab = 4  # as a slab-key workload would resolve
    with pytest.raises(ValueError, match="pure-x"):
        runner.run(state, 10)
