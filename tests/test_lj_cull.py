"""Culled tile-pair kernel tests: parity against the jnp dense oracle.

The jnp dense path is the semantic oracle for every Pallas kernel (CLAUDE.md
design invariants); these run in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.lj_cull import (
    CulledLJMD,
    build_tile_pairs,
    slab_y_key,
    sort_by_key,
)

N = 1000  # not a tile multiple: exercises padding/masking
SIGMA, EPS, CUTOFF = 0.34, 0.99579, 1.02
L = 5.0  # ~5 cutoffs wide; (x-slab, y) tiles satisfy the shift bound
NSLAB = 10
TM, TN = 8, 16  # small interpret-mode tiles (hardware sizes bench on TPU)


def dense_oracle(pos, box_diag, cutoff=CUTOFF):
    ids = jnp.arange(pos.shape[0])
    d = pos[:, None, :] - pos[None, :, :]
    d = d - box_diag * jnp.round(d / box_diag)
    r2 = jnp.sum(d * d, -1)
    m = (r2 < cutoff * cutoff) & (ids[:, None] != ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    inv2 = (SIGMA * SIGMA) / r2s
    inv6 = inv2 * inv2 * inv2
    coef = jnp.where(m, 24 * EPS * (2 * inv6 * inv6 - inv6) / r2s, 0.0)
    return jnp.sum(coef[..., None] * d, axis=1)


@pytest.fixture(scope="module")
def sorted_system():
    # jittered lattice: no deep overlaps, so the kernel's r2 clamp never
    # engages and the jnp oracle matches bit-for-bit-ish
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
    key = slab_y_key(pos3, N, nslab=NSLAB, L=L)
    pos3s, _ = sort_by_key(key, pos3, ())
    return md, pos3s, box_diag


@pytest.mark.slow
def test_culled_force_matches_dense_oracle(sorted_system):
    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=8192)
    assert not bool(pairs.overflowed)
    F = md.force(pos3s, box_diag, pairs, approx_recip=False)
    Fo = dense_oracle(pos3s[:, :N].T, box_diag).T
    scale = float(jnp.max(jnp.abs(Fo)))
    err = jnp.abs(F[:, :N] - Fo)
    # pairs within f32 rounding of the cutoff may flip inclusion between
    # arithmetic orders; each flip moves a force by at most the pair force
    # at the cutoff, |coef(rc)|*rc ~ 0.033 for these parameters.  All
    # non-boundary pairs must match to float precision.
    assert float(jnp.max(err)) < 0.05
    assert float(jnp.percentile(err, 99.0)) / scale < 1e-5
    # Newton's third law survives regardless of boundary flips
    assert float(jnp.max(jnp.abs(jnp.sum(F, axis=1)))) < 1e-3
    # padding slots accumulate nothing
    assert float(jnp.max(jnp.abs(F[:, N:]))) == 0.0


def test_culled_force_actually_culls(sorted_system):
    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=8192)
    nr = md.n_pad // md.tm
    nc = md.n_pad // md.tn
    assert int(pairs.count[0, 0]) < nr * nc  # some rectangles were culled


@pytest.mark.slow
def test_mxu_reduce_force_matches_vpu(sorted_system):
    """The mxu_reduce=True reduction path (dot_general against ones on
    the MXU) must produce the same forces as the default VPU reductions
    (CLAUDE.md: every kernel numeric path needs an interpret-mode oracle
    check)."""
    md, pos3s, box_diag = sorted_system
    md_mxu = CulledLJMD(
        N, SIGMA, EPS, CUTOFF,
        masses_lane=np.full(N, 39.9), dt=0.002, gamma=1.0,
        kT=0.008314 * 120, tm=TM, tn=TN, slack=0.2, mxu_reduce=True,
    )
    pairs = md.build_pairs(pos3s, box_diag, capacity=8192)
    F_vpu = md.force(pos3s, box_diag, pairs, approx_recip=False)
    F_mxu = md_mxu.force(pos3s, box_diag, pairs, approx_recip=False)
    assert float(jnp.max(jnp.abs(F_vpu - F_mxu))) < 1e-4


@pytest.mark.slow
def test_prefetch_force_and_segment_match_baseline(sorted_system):
    """The software-pipelined fast loop (prefetch=True) reorders only the
    SCHEDULE of column-slice loads; per-entry arithmetic is unchanged.
    (Exact bitwise equality is NOT guaranteed: the two variants are
    distinct XLA programs and FMA contraction may differ, so assert to
    float-precision tolerance like the mxu_reduce test.)"""
    md, pos3s, box_diag = sorted_system
    md_pf = CulledLJMD(
        N, SIGMA, EPS, CUTOFF,
        masses_lane=np.full(N, 39.9), dt=0.002, gamma=1.0,
        kT=0.008314 * 120, tm=TM, tn=TN, slack=0.2, prefetch=True,
    )
    pairs = md.build_pairs(pos3s, box_diag, capacity=8192)
    F0 = md.force(pos3s, box_diag, pairs, approx_recip=False)
    F1 = md_pf.force(pos3s, box_diag, pairs, approx_recip=False)
    assert float(jnp.max(jnp.abs(F0 - F1))) < 1e-4
    v3 = jnp.zeros_like(pos3s)
    out0 = md.run_segment(pos3s, v3, F0, box_diag, pairs, seed=3,
                          step_offset=0, n_steps=4, approx_recip=False)
    out1 = md_pf.run_segment(pos3s, v3, F0, box_diag, pairs, seed=3,
                             step_offset=0, n_steps=4, approx_recip=False)
    for a, b in zip(out0, out1):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_scatter_placement_matches_onehot(sorted_system, monkeypatch):
    """The large-N scatter placement must build the identical list as the
    one-hot-matmul placement (the builder switches on entries*capacity)."""
    import chiron_tpu.ops.lj_cull as lc

    md, pos3s, box_diag = sorted_system
    ref = md.build_pairs(pos3s, box_diag, capacity=8192)
    monkeypatch.setattr(lc, "_ONEHOT_LIMIT", 0)
    alt = md.build_pairs(pos3s, box_diag, capacity=8192)
    for name in ("rows", "cols", "ccx", "ptr2", "rowcx", "count"):
        assert bool(jnp.array_equal(getattr(ref, name), getattr(alt, name))), name
    assert bool(ref.overflowed) == bool(alt.overflowed)


def test_capacity_overflow_flagged(sorted_system):
    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=3)
    assert bool(pairs.overflowed)


@pytest.mark.slow
def test_shift_bound_violation_flagged():
    # box barely over 2 cutoffs: L/2 - cutoff - slack < 0, so the constant
    # x/y-shift convention cannot be valid -> must be flagged
    small_L = 2.3 * CUTOFF
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, small_L, size=(64, 3)).astype(np.float32)
    pos3 = jnp.asarray(xyz.T)
    pos3 = jnp.pad(pos3, ((0, 0), (0, 128 - 64)))
    box_diag = jnp.asarray([small_L] * 3, jnp.float32)
    pairs = build_tile_pairs(pos3, 64, 8, 128, box_diag, CUTOFF, 0.2, 512)
    assert bool(pairs.overflowed)


def _jnp_fused_step(md, x, w, F, box_diag, seed, step):
    """jnp oracle of ONE fused kernel step (same splitmix32 noise stream)."""
    n_pad = x.shape[1]
    v = w + md.dt * F * md.minv
    x = x + 0.5 * md.dt * v
    # two-output Box-Muller on half the lanes (cos half | sin half),
    # mirroring the fused kernel's stream exactly
    half = n_pad // 2
    lane = (
        jnp.arange(3, dtype=jnp.uint32)[:, None] * jnp.uint32(half)
        + jnp.arange(half, dtype=jnp.uint32)[None, :]
    )
    base = (
        jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
        + jnp.uint32(step) * jnp.uint32(0x85EBCA6B)
    )

    def mix(z):
        z = z ^ (z >> 16)
        z = z * jnp.uint32(0x85EBCA6B)
        z = z ^ (z >> 13)
        z = z * jnp.uint32(0xC2B2AE35)
        z = z ^ (z >> 16)
        return z

    c1 = (lane * jnp.uint32(2)) * jnp.uint32(0x9E3779B9) + base
    c2 = (lane * jnp.uint32(2) + jnp.uint32(1)) * jnp.uint32(0x9E3779B9) + base
    u1 = (mix(c1) >> 8).astype(jnp.int32).astype(jnp.float32) / 16777216.0
    u2 = (mix(c2) >> 8).astype(jnp.int32).astype(jnp.float32) / 16777216.0
    u1 = jnp.maximum(u1, 1e-7)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = 2.0 * jnp.pi * u2
    noise = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
    v = md.a * v + md.b * md.sigv * noise
    x = x + 0.5 * md.dt * v
    Lcol = box_diag.reshape(3, 1)
    x = x - jnp.floor(x / Lcol) * Lcol
    F = dense_oracle(x[:, :N].T, box_diag).T
    Fp = jnp.zeros_like(x).at[:, :N].set(F)
    return x, v, Fp


def test_fused_segment_matches_jnp_step_oracle(sorted_system):
    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=8192)
    F0 = md.force(pos3s, box_diag, pairs, approx_recip=False)
    v0 = jnp.zeros_like(pos3s)
    x1, v1, F1 = md.run_segment(
        pos3s, v0, F0, box_diag, pairs, seed=11, step_offset=0, n_steps=2,
        approx_recip=False,
    )
    # oracle: two steps in w-convention with the dense force
    w = v0 - 0.5 * md.dt * F0 * md.minv
    x, Fc = pos3s, F0
    for s in range(2):
        x, w, Fc = _jnp_fused_step(md, x, w, Fc, box_diag, seed=11, step=s)
    v = w + 0.5 * md.dt * Fc * md.minv
    assert float(jnp.max(jnp.abs(x1 - x))) < 1e-5
    assert float(jnp.max(jnp.abs(v1 - v))) < 1e-4
    # 0.05 absorbs cutoff-boundary inclusion flips (see force parity test)
    assert float(jnp.max(jnp.abs(F1 - Fc))) < 0.05


@pytest.mark.slow
def test_culled_runner_equilibrates_kinetic_temperature():
    """End-to-end culled runner: kT_kinetic -> thermostat kT, no overflow."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.64)
    runner = make_culled_lj_runner(
        potential=fluid.potential,
        n_particles=N,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        tm=8, tn=16, segment_steps=20,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3,
    )
    state = runner.run(state, 400)
    runner.check(state)
    v = runner.velocities(state)  # (N, 3)
    m = 39.9
    kT_kin = float(jnp.mean(m * jnp.sum(v * v, axis=1)) / 3.0)
    kT = 0.00831446 * 120.0
    assert abs(kT_kin - kT) / kT < 0.15
    E = float(runner.energy(state))
    assert np.isfinite(E)


def test_engine_auto_selection():
    from chiron_tpu import units
    from chiron_tpu.runtime import make_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    small = LennardJonesFluid(nparticles=256, reduced_density=0.4)
    r = make_lj_runner(small.potential, 256,
                       box_vectors=small.box_vectors,
                       topology=small.topology)
    assert type(r).__name__ == "LangevinRunner"  # dense

    mid = LennardJonesFluid(nparticles=4000, reduced_density=0.8)
    r = make_lj_runner(mid.potential, 4000,
                       box_vectors=mid.box_vectors,
                       topology=mid.topology, tm=8, tn=16)
    assert type(r).__name__ == "CulledRunner"

    with pytest.raises(ValueError, match="unknown engine"):
        make_lj_runner(mid.potential, 4000, topology=mid.topology,
                       engine="warp")


@pytest.mark.slow
def test_nan_positions_latch_overflow():
    """A NaN-poisoned state must latch overflowed (NaN comparisons would
    otherwise silently pass the drift check)."""
    import jax.numpy as jnp

    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.3)
    runner = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120.0 * units.kelvin, tm=8, tn=16, segment_steps=5,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=1,
    )
    # poison one coordinate
    state.x = state.x.at[0, 5].set(jnp.nan)
    state = runner.run(state, 5)
    with pytest.raises(RuntimeError, match="invariant violated"):
        runner.check(state)


def test_culled_force_energy_matches_jnp_oracle(sorted_system):
    """culled_force_energy_raw (the NpT barostat's energy provider) must
    match the jnp all-pairs oracle on BOTH outputs (CLAUDE.md: every
    Pallas kernel numeric path needs an interpret-mode jnp oracle)."""
    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=8192)
    F, U = md.force_energy(pos3s, box_diag, pairs)
    # force: same tolerance discipline as the force-only test
    Fo = dense_oracle(pos3s[:, :N].T, box_diag).T
    err = jnp.abs(F[:, :N] - Fo)
    scale = float(jnp.max(jnp.abs(Fo)))
    assert float(jnp.max(err)) < 0.05
    assert float(jnp.percentile(err, 99.0)) / scale < 1e-5
    # energy: jnp half-sum oracle over in-cutoff pairs
    pos = pos3s[:, :N].T
    d = pos[:, None, :] - pos[None, :, :]
    d = d - box_diag * jnp.round(d / box_diag)
    r2 = jnp.sum(d * d, -1)
    ids = jnp.arange(N)
    m = (r2 < CUTOFF * CUTOFF) & (ids[:, None] < ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    i6 = ((SIGMA * SIGMA) / r2s) ** 3
    Uo = float(jnp.sum(jnp.where(m, 4.0 * EPS * (i6 * i6 - i6), 0.0)))
    assert abs(float(U) - Uo) < 1e-5 * abs(Uo) + 1e-3, (float(U), Uo)


@pytest.mark.slow
def test_in_kernel_drift_check_latches_stale_list():
    """The tile-skin invariant now evaluated inside the MD kernel's final
    grid step must latch when the top-2 joint drift exceeds the slack
    (tiny slack + long segment forces a violation)."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.3)
    runner = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=300.0 * units.kelvin, tm=8, tn=16,
        segment_steps=400, slack=0.02,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3,
    )
    state = runner.run(state, 400)
    with pytest.raises(RuntimeError, match="invariant violated"):
        runner.check(state)


@pytest.mark.slow
def test_culled_energy_grad_is_negative_force(sorted_system):
    """grad(energy) == -force on the CULLED (flagship) path, not just
    the dense one (VERDICT r3 item 5; CLAUDE.md invariant; reference
    chiron/potential.py:21-24): the custom-VJP energy's gradient must be
    exactly the kernel's analytic exact-reciprocal force, and both must
    match the jnp dense oracle's autodiff gradient."""
    import jax

    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=4096)
    assert not bool(pairs.overflowed)

    F_kernel, _ = md.force_energy(pos3s, box_diag, pairs,
                                  approx_recip=False)
    g = jax.grad(
        lambda p: md.energy_differentiable(p, box_diag, pairs)
    )(pos3s)
    # exact by construction (the VJP returns the same force array)
    assert float(jnp.max(jnp.abs(g + F_kernel))) == 0.0

    # and the gradient agrees with the jnp dense oracle's autodiff
    def oracle_energy(p):
        pos = p[:, :N].T
        ids = jnp.arange(N)
        d = pos[:, None, :] - pos[None, :, :]
        d = d - box_diag * jnp.round(d / box_diag)
        r2 = jnp.sum(d * d, -1)
        m = (r2 < CUTOFF * CUTOFF) & (ids[:, None] < ids[None, :])
        r2s = jnp.where(m, r2, 1.0)
        inv2 = (SIGMA * SIGMA) / r2s
        inv6 = inv2 * inv2 * inv2
        return jnp.sum(jnp.where(m, 4 * EPS * (inv6 * inv6 - inv6), 0.0))

    g_oracle = jax.grad(oracle_energy)(pos3s)
    scale = float(jnp.max(jnp.abs(g_oracle)))
    err = jnp.abs(g[:, :N] - g_oracle[:, :N])
    # same boundary-flip tolerance as test_culled_force_matches_dense_
    # oracle: a pair within f32 rounding of the cutoff moves a gradient
    # element by at most |coef(rc)|*rc ~ 0.033 for these parameters
    assert float(jnp.max(err)) < 0.05
    assert float(jnp.percentile(err, 99.0)) / scale < 1e-5


@pytest.mark.slow
def test_segment_final_energy_matches_standalone(sorted_system):
    """run_segment(final_energy=True) must return the same exact-
    reciprocal potential as a standalone culled force+energy pass on the
    final configuration (the NpT carried-U contract, ADVICE r3)."""
    md, pos3s, box_diag = sorted_system
    pairs = md.build_pairs(pos3s, box_diag, capacity=4096)
    v0 = jnp.zeros_like(pos3s)
    F0 = md.force(pos3s, box_diag, pairs, approx_recip=False)
    x1, v1, F1, E_seg = md.run_segment(
        pos3s, v0, F0, box_diag, pairs, seed=11, step_offset=0,
        n_steps=5, final_energy=True,
    )
    _, E_ref = md.force_energy(x1, box_diag, pairs, approx_recip=False)
    assert float(jnp.abs(E_seg - E_ref)) <= 1e-6 * abs(float(E_ref))


@pytest.mark.slow
def test_culled_runner_nve_energy_conservation():
    """gamma=0 turns BAOAB into velocity Verlet: total energy (KE + PE)
    through the full culled engine -- sort, tile-pair build, fused
    segment kernel -- must be conserved to <0.5% over 1000 steps.  An
    independent physics check on the flagship path (the step oracle in
    test_fused_segment_matches_jnp_step_oracle could share a formulation
    bug; energy conservation cannot).  The NVE run starts from a
    thermostatted equilibration (a raw lattice melt under gamma=0 heats
    until it outruns any slack budget)."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    n = 512
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.64)
    common = dict(
        potential=fluid.potential,
        n_particles=n,
        topology=fluid.topology,
        temperature=60.0 * units.kelvin,
        exact_forces=True,
        tm=8, tn=16, segment_steps=20, slack=0.3,
    )
    # the lattice melt is a violent transient -- equilibrate on the
    # dense engine first (the bench.py pattern), then hand the relaxed
    # liquid to the culled engine
    from chiron_tpu.runtime import make_fast_lj_runner
    eq = make_fast_lj_runner(
        fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=60.0 * units.kelvin,
    )
    est = eq.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=5,
    )
    est = eq.run(est, 1000)

    nve = make_culled_lj_runner(
        collision_rate=0.0 / units.picoseconds, **common
    )
    state = nve.init(
        np.asarray(eq.positions(est)),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=6,
    )
    m = 39.948

    def total_energy(st):
        v = nve.velocities(st)
        ke = 0.5 * m * float(jnp.sum(v * v))
        return ke + float(nve.energy(st))

    # one short settle segment so E0 is measured on the engine itself
    state = nve.run(state, 20)
    e0 = total_energy(state)
    state = nve.run(state, 1000)
    nve.check(state)
    e1 = total_energy(state)
    # scale by the kinetic energy (E_tot can cross zero)
    ke_scale = 1.5 * n * 0.00831446 * 60.0
    assert abs(e1 - e0) / ke_scale < 0.005, (e0, e1)


@pytest.mark.slow
def test_segment_fn_is_public_and_matches_run():
    """segment_fn(S) is the public compiled-segment surface the graft
    driver's entry() consumes (VERDICT r4 item 4): it must be jittable,
    advance exactly one S-step segment (bitwise-equal to run(state, S)),
    and refuse to be built before init()."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.4)

    def mk():
        return make_culled_lj_runner(
            potential=fluid.potential, n_particles=N,
            topology=fluid.topology,
            temperature=120.0 * units.kelvin, tm=8, tn=16,
            segment_steps=10,
        )

    with pytest.raises(RuntimeError, match="init"):
        mk().segment_fn(10)

    pos = fluid.positions.value_in_unit_system(units.md_unit_system)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)

    runner = mk()
    state = runner.init(pos, box, seed=7)
    s_run = runner.run(state, 10)

    runner2 = mk()
    state2 = runner2.init(pos, box, seed=7)
    s_seg = jax.jit(runner2.segment_fn(10))(state2)

    for a, b in zip(jax.tree_util.tree_leaves(s_run),
                    jax.tree_util.tree_leaves(s_seg)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
