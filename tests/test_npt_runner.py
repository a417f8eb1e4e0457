"""Fused NpT runner: mechanics (fast) + near-ideal volume physics (slow).

The runner compiles Langevin + an on-device MC barostat into one scan;
the slow test checks <V> against the NpT ensemble expectation
<V> = (N+1) kT / P, exact for an ideal gas and within ~1% for LJ at the
dilute, hot state point used (B2 rho* ~ -0.006).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu import units
from chiron_tpu.runtime import make_npt_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid


def _make(n=125, rho=0.1, P_atm=50.0, interval=10, **kw):
    fluid = LennardJonesFluid(nparticles=n, reduced_density=rho)
    r = make_npt_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=300.0 * units.kelvin,
        pressure=P_atm * units.atmosphere,
        tm=64, barostat_interval=interval, **kw)
    st = r.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3)
    return r, st


def test_npt_mechanics():
    r, st = _make()
    V0 = float(r.volume(st))
    st = r.run(st, 200)
    assert int(st.n_proposed) == 20           # one attempt per interval
    assert 0 <= int(st.n_accepted) <= 20
    assert float(r.volume(st)) != V0          # volume actually moves
    assert np.isfinite(float(r.energy(st)))
    # positions remain inside the (current) box
    x = np.asarray(r.positions(st))
    L = float(st.box_diag[0, 0])
    assert x.min() > -1e-4 and x.max() < L * (1 + 1e-4) + 1e-4


def test_npt_autotune_raises_scale_at_high_acceptance():
    r, st = _make(P_atm=20.0)
    st = r.run(st, 400)
    acc = r.acceptance(st)
    if acc > 0.75:
        assert float(st.vmax_scale) > 0.01
    else:  # at least: the scale stayed in the legal band
        assert 0 < float(st.vmax_scale) <= 0.3


def test_npt_velocities_unscaled_by_volume_moves():
    """Volume moves must leave velocities untouched (reference
    semantics): kinetic temperature stays in the thermostat band even
    while the box moves."""
    r, st = _make()
    st = r.run(st, 300)
    v = np.asarray(r.velocities(st))
    kT_kin = float(np.mean(39.9 * np.sum(v * v, axis=1)) / 3.0)
    kT = 0.00831446 * 300.0
    assert abs(kT_kin - kT) / kT < 0.3


@pytest.mark.slow
def test_npt_mean_volume_matches_ensemble_expectation():
    n = 64
    kT = units.kB_MD * 300.0
    rho_target = 0.02 / 0.34 ** 3          # reduced 0.02 -> nm^-3
    P_md = rho_target * kT                 # near-ideal EOS
    P_atm = P_md / units.pressure_to_md(1.0 * units.atmosphere)
    r, st = _make(n=n, rho=0.02, P_atm=P_atm, interval=5)
    st = r.run(st, 2000)                   # equilibrate
    vols = []
    for _ in range(40):
        st = r.run(st, 250)
        vols.append(float(r.volume(st)))
    V_expect = (n + 1) * kT / P_md
    V_mean = float(np.mean(vols))
    assert abs(V_mean - V_expect) / V_expect < 0.10, (V_mean, V_expect)


# ---------------------------------------------------------------------------
# Culled-engine NpT (make_culled_npt_lj_runner)
# ---------------------------------------------------------------------------

from chiron_tpu.runtime import make_culled_npt_lj_runner


def _make_culled(n=125, rho=0.1, P_atm=50.0, interval=10, segment=20,
                 temperature_K=300.0, **kw):
    fluid = LennardJonesFluid(nparticles=n, reduced_density=rho)
    r = make_culled_npt_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=temperature_K * units.kelvin,
        pressure=P_atm * units.atmosphere,
        tm=8, tn=16, barostat_interval=interval, segment_steps=segment, **kw)
    # stratified-random start instead of the lattice: exact lattice
    # planes leave x-gaps that make plane-straddling x-sorted tiles
    # artificially fat (trips the x-frame bound in these small boxes);
    # one particle per cell, jittered, is liquid-like (near-uniform x,
    # pair distances > sigma) and deterministic
    box = np.asarray(
        fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    )
    side = int(round(n ** (1 / 3)))
    assert side ** 3 == n
    rng = np.random.default_rng(11)
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3,
                             indexing="ij"), -1).reshape(-1, 3)
    cell = np.diag(box) / side
    pos = (g + rng.uniform(0.25, 0.75, (n, 3))) * cell
    st = r.init(pos, box, seed=3)
    return r, st


def test_culled_npt_autotune_capped_to_slack_envelope():
    """The autotuned proposal size must stay inside the engine's slack
    envelope: every evaluated shrink charges |1-s|*reach against the
    segment's drift budget, so n_sub worst-case attempts must fit in
    half the slack.  Without the cap the reference x1.1-up-to-0.3 rule
    drives high-acceptance (dilute near-ideal) systems into the drift
    latch (found by test_culled_npt_mean_volume_matches_ensemble_
    expectation latching once rejected shrinks started charging)."""
    r, st = _make_culled(n=125, rho=0.05, P_atm=1.0, interval=5,
                         segment=10)
    reach = r.md.cutoff + r.md.slack
    n_sub = 2  # segment=10 / interval=5
    charge_cap = 0.5 * r.md.slack / n_sub
    expect = min(0.3, 1.0 - (1.0 - charge_cap / reach) ** 3)
    assert r.vmax_cap == pytest.approx(expect)
    # worst-case per-segment charge fits half the slack
    s_min = (1.0 - r.vmax_cap) ** (1.0 / 3.0)
    assert n_sub * (1.0 - s_min) * reach <= 0.5 * r.md.slack + 1e-6
    # init starts inside the envelope even if the user's value is above
    r2, st2 = _make_culled(n=125, rho=0.05, P_atm=1.0, interval=5,
                           segment=10, volume_max_scale=0.3)
    assert float(st2.vmax_scale) == pytest.approx(r2.vmax_cap)
    # autotune off: the user's value is taken verbatim
    r3, st3 = _make_culled(n=125, rho=0.05, P_atm=1.0, interval=5,
                           segment=10, volume_max_scale=0.3,
                           autotune=False)
    assert float(st3.vmax_scale) == pytest.approx(0.3)


@pytest.mark.slow
def test_culled_npt_mechanics():
    r, st = _make_culled()
    V0 = float(r.volume(st))
    st = r.run(st, 200)
    r.check(st)
    assert int(st.n_proposed) == 20           # one attempt per interval
    assert 0 <= int(st.n_accepted) <= 20
    assert float(r.volume(st)) != V0
    assert np.isfinite(float(r.energy(st)))
    x = np.asarray(r.positions(st))
    L = float(st.box_diag[0, 0])
    assert x.min() > -1e-4 and x.max() < L * (1 + 1e-4) + 1e-4


@pytest.mark.slow
def test_culled_npt_matches_dense_npt_energy_convention():
    """The culled barostat's energies must agree with the dense kernel's
    (same truncated-LJ convention), so the two NpT runners sample the
    same ensemble."""
    from chiron_tpu.ops.lj_dense import LJDensePallas

    r, st = _make_culled()
    st = r.run(st, 40)
    r.check(st)
    dense = LJDensePallas(
        125, r.md.sigma, r.md.epsilon, r.md.cutoff, tm=8, tn=16,
        n_pad=r.md.n_pad)
    U_culled = float(r.energy(st))
    U_dense = float(dense.force_energy_t(st.x, st.box_diag)[1])
    assert abs(U_culled - U_dense) < 1e-2 + 1e-5 * abs(U_dense)


@pytest.mark.slow
def test_culled_npt_scaled_list_matches_rebuilt_list():
    """A volume proposal rescales the live tile-pair list (ccx/rowcx * s)
    instead of rebuilding; the resulting energy must match a from-scratch
    rebuild on the scaled configuration."""
    r, st = _make_culled()
    st = r.run(st, 20)
    r.check(st)
    md = r.md
    from chiron_tpu.ops.lj_cull import build_tile_pairs

    for s_val in (0.9967, 1.0033):
        s = jnp.float32(s_val)
        x_new = st.x * s
        box_new = st.box_diag * s
        pairs_scaled = st.pairs._replace(
            ccx=st.pairs.ccx * s, rowcx=st.pairs.rowcx * s)
        _, U_scaled = md.force_energy(x_new, box_new[0], pairs_scaled)
        pairs_re = build_tile_pairs(
            x_new, 125, md.tm, md.tn, box_new[0], md.cutoff, md.slack,
            capacity=st.pairs.cols.shape[1])
        _, U_re = md.force_energy(x_new, box_new[0], pairs_re)
        assert abs(float(U_scaled) - float(U_re)) < 1e-3, s_val


@pytest.mark.slow
def test_culled_npt_interval_validation():
    with pytest.raises(ValueError, match="multiple of barostat_interval"):
        _make_culled(segment=25, interval=10)
    r, st = _make_culled()
    with pytest.raises(ValueError, match="multiple of segment_steps"):
        r.run(st, 30)


def test_culled_npt_box_never_shrinks_below_minimum_image_bound():
    """Volume proposals that would break min(box)/2 > cutoff + slack are
    rejected on-device (ADVICE r2): driving the barostat attempt alone
    with a huge volume_max_scale (proposals down to 0.46x the box
    length, far below the bound), the box must never cross it."""
    import dataclasses

    import jax

    r, st = _make_culled(P_atm=2000.0, volume_max_scale=0.9,
                         autotune=False)
    bound = 2.0 * (r.md.cutoff + r.md.slack)
    assert float(jnp.min(st.box_diag)) > bound
    carry = st
    crossed_guard_band = False
    for i in range(30):
        carry = dataclasses.replace(carry, key=jax.random.PRNGKey(100 + i))
        carry = r._barostat_attempt(carry)
        assert float(jnp.min(carry.box_diag)) > bound, i
        # huge-shrink proposals (to below the bound) occurred with
        # overwhelming probability across 30 uniform draws; the high
        # pressure makes unguarded deep shrinks energetically favorable
        if float(jnp.min(carry.box_diag)) < bound * 1.5:
            crossed_guard_band = True
    assert int(carry.n_proposed) == int(st.n_proposed) + 30
    assert crossed_guard_band  # the walk actually approached the bound


@pytest.mark.slow
def test_culled_npt_mean_volume_matches_ensemble_expectation():
    n = 125
    kT = units.kB_MD * 300.0
    rho_target = 0.05 / 0.34 ** 3          # reduced 0.05 -> nm^-3
    P_md = rho_target * kT                 # near-ideal EOS
    P_atm = P_md / units.pressure_to_md(1.0 * units.atmosphere)
    r, st = _make_culled(n=n, rho=0.05, P_atm=P_atm, interval=5,
                         segment=10)
    st = r.run(st, 2000)                   # equilibrate
    vols = []
    for _ in range(40):
        st = r.run(st, 250)
        vols.append(float(r.volume(st)))
    r.check(st)
    V_expect = (n + 1) * kT / P_md
    V_mean = float(np.mean(vols))
    assert abs(V_mean - V_expect) / V_expect < 0.12, (V_mean, V_expect)


def test_dense_npt_min_image_guards():
    """Dense NpT: init refuses a box at/below 2*cutoff, and volume
    proposals never take the sampled box below that bound (ADVICE r2)."""
    import dataclasses

    import jax

    n = 125
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.1)
    pos = fluid.positions.value_in_unit_system(units.md_unit_system)
    r = make_npt_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=300.0 * units.kelvin, pressure=2000.0 * units.atmosphere,
        tm=64, barostat_interval=10, volume_max_scale=0.9, autotune=False)
    with pytest.raises(ValueError, match="2\\*cutoff"):
        r.init(pos, np.diag([2.0, 2.0, 2.0]), seed=0)

    st = r.init(
        pos,
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3)
    bound = 2.0 * fluid.potential.cutoff
    carry = st
    for i in range(30):
        carry = dataclasses.replace(carry, key=jax.random.PRNGKey(200 + i))
        carry = r.run(carry, 10)  # exactly one attempt per call
        assert float(jnp.min(carry.box_diag)) > bound, i
    assert int(carry.n_proposed) == int(st.n_proposed) + 30


@pytest.mark.slow
def test_culled_npt_slab_key_scaled_list_matches_rebuilt():
    """The rescaled-list barostat must stay exact under the (x-slab, y)
    sort key (the large-N production key): uniform scaling maps the
    whole spatial hierarchy, slab structure included."""
    from chiron_tpu.ops.lj_cull import build_tile_pairs

    r, st = _make_culled(n=343, rho=0.1, sort_mode="slab")
    assert r.nslab >= 1  # the slab key is actually in play
    st = r.run(st, 20)
    r.check(st)
    md = r.md
    for s_val in (0.9967, 1.0033):
        s = jnp.float32(s_val)
        x_new = st.x * s
        box_new = st.box_diag * s
        pairs_scaled = st.pairs._replace(
            ccx=st.pairs.ccx * s, rowcx=st.pairs.rowcx * s)
        _, U_scaled = md.force_energy(x_new, box_new[0], pairs_scaled)
        pairs_re = build_tile_pairs(
            x_new, 343, md.tm, md.tn, box_new[0], md.cutoff, md.slack,
            capacity=st.pairs.cols.shape[1])
        _, U_re = md.force_energy(x_new, box_new[0], pairs_re)
        assert abs(float(U_scaled) - float(U_re)) < 1e-3, s_val


@pytest.mark.slow
def test_culled_npt_density_parity_vs_dense_runner():
    """Culled (rescaled-list) vs dense NpT runner: same state point, the
    mean volumes must agree (VERDICT r3 item 8; the hardware companion
    measured 0.038% at N=4000/100k steps and 0.189% at N=16384 -- this
    CPU-tier version asserts a looser bound on a shorter chain)."""
    from chiron_tpu.runtime import make_npt_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    n = 512
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.6)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    pos = fluid.positions.value_in_unit_system(units.md_unit_system)
    T = 120.0 * units.kelvin
    P = 100.0 * units.atmosphere

    cul = make_culled_npt_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=T, pressure=P, timestep=2.0 * units.femtoseconds,
        tm=8, tn=16, segment_steps=50, barostat_interval=25)
    cs = cul.init(pos, box, seed=11)
    cs = cul.run(cs, 1500)
    vols_c = []
    for _ in range(10):
        cs = cul.run(cs, 250)
        vols_c.append(float(cul.volume(cs)))
    cul.check(cs)

    den = make_npt_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=T, pressure=P, timestep=2.0 * units.femtoseconds,
        tm=128, barostat_interval=25)
    ds = den.init(pos, box, seed=22)
    ds = den.run(ds, 1500)
    vols_d = []
    for _ in range(10):
        ds = den.run(ds, 250)
        vols_d.append(float(den.volume(ds)))

    vc, vd = float(np.mean(vols_c)), float(np.mean(vols_d))
    assert abs(vc - vd) / vd < 0.02, (vc, vd)


@pytest.mark.slow
def test_culled_npt_in_kernel_drift_latch():
    """The NpT drift check now runs IN the MD kernel with the anchor and
    the remaining budget as data (cross-sub-segment anchor semantics of
    the former XLA end-of-segment check).  A slack too small for thermal
    motion must latch `overflowed` and make check() raise; the budget
    must also shrink with accepted volume scalings (tiny slack +
    aggressive barostat latches even faster)."""
    r, st = _make_culled(slack=0.02)
    st = r.run(st, 200)
    assert bool(st.overflowed)
    with pytest.raises(RuntimeError, match="invariant"):
        r.check(st)


def test_dense_npt_check_raises_on_nonfinite():
    """The dense NpT runner has the same check() contract as the other
    runners: a non-finite state (diverged MD; the NaN guard rejects every
    barostat proposal, silently freezing the box) must raise."""
    import dataclasses

    r, st = _make()
    r.check(st)  # healthy state passes
    bad = dataclasses.replace(st, U=jnp.float32(np.nan))
    with pytest.raises(RuntimeError, match="non-finite"):
        r.check(bad)
    bad_x = dataclasses.replace(
        st, x=st.x.at[0, 0].set(jnp.float32(np.inf))
    )
    with pytest.raises(RuntimeError, match="non-finite"):
        r.check(bad_x)


def test_culled_runner_rejects_thin_axis_box():
    """Minimum-image validity needs EVERY axis at least 2 reaches wide;
    a thin y axis must raise at init, not silently mis-count periodic
    images (the old check looked at Lx only)."""
    from chiron_tpu.runtime import make_culled_lj_runner

    n = 125
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.1)
    r = make_culled_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        tm=8, tn=16, slack=0.2,
    )
    rng = np.random.default_rng(5)
    box = np.diag([10.0, 2.0, 10.0])  # Ly=2.0 < 2*(cutoff+slack)=2.44
    pos = rng.uniform(0, 1, (n, 3)) * np.diagonal(box)
    with pytest.raises(ValueError, match="narrowest axis"):
        r.init(pos, box, seed=0)


@pytest.mark.slow
def test_culled_npt_rejected_shrink_charges_latch_budget():
    """The Metropolis DECISION on a volume proposal uses U_new from the
    rescaled stale list, so a REJECTED down-scale must still count
    against the drift-latch budget (eval_peak).  Strongly negative
    pressure guarantees every down-scale proposal is rejected; with the
    old accepted-only accounting nothing would ever latch."""
    r, st = _make_culled(
        P_atm=-5000.0, interval=5, segment=10, temperature_K=50.0,
        slack=0.02, volume_max_scale=0.5, autotune=False,
    )
    st = r.run(st, 30)  # 6 proposals; >=1 down-scale w.p. 1 - 2^-6
    assert float(st.eval_peak) > 0.02, float(st.eval_peak)
    assert bool(st.overflowed)
    with pytest.raises(RuntimeError, match="invariant"):
        r.check(st)


@pytest.mark.slow
def test_culled_npt_frame_floor_rejects_shrinks():
    """Volume proposals that would take the cumulative scale below the
    x-frame validity floor (tile_frame_scale_floor) are rejected via
    box_ok -- an accepted shrink past the floor would leave the
    constant-x-frame fold non-minimum-image."""
    import dataclasses

    r, st = _make_culled(interval=5, segment=10, autotune=False,
                         volume_max_scale=0.3)
    # a healthy layout's floor is <= 1 (the build validated s_total=1)
    assert 0.0 < float(st.s_min_frame) <= 1.0
    # force the floor above any reachable scale: every proposal
    # (max up-scale (1.3)^(1/3) ~ 1.09 < 2) must be rejected
    st_hi = dataclasses.replace(st, s_min_frame=jnp.float32(2.0))
    V0 = float(r.volume(st_hi))
    for _ in range(6):
        st_hi = r._barostat_attempt(st_hi)
    assert int(st_hi.n_accepted) == 0
    assert float(r.volume(st_hi)) == V0
