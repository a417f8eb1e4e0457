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


def test_fused_rebuild_rejects_cadence_params():
    """fused_rebuild sorts/rebuilds every segment; non-unit cadences must
    raise instead of being silently ignored."""
    from chiron_tpu.runtime import make_culled_lj_runner

    fluid = LennardJonesFluid(nparticles=4000, reduced_density=0.8)
    r = make_culled_lj_runner(
        potential=fluid.potential, n_particles=4000,
        topology=fluid.topology, fused_rebuild=True, sort_every=4,
    )
    st = r.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=0,
    )
    with pytest.raises(ValueError, match="sort_every"):
        r.run(st, 50)


def test_spatial_band_runner_rejects_nonuniform_masses():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from chiron_tpu.parallel import make_spatial_band_lj_runner
    from chiron_tpu.topology import Topology

    fluid = LennardJonesFluid(nparticles=64, reduced_density=0.2)
    topo = Topology.from_masses(np.linspace(10.0, 40.0, 64))
    mesh = Mesh(np.array(jax.devices()[:1]), ("spatial",))
    with pytest.raises(ValueError, match="identical masses"):
        make_spatial_band_lj_runner(
            mesh, fluid.potential, 64,
            temperature=120.0 * units.kelvin,
            timestep=2.0 * units.femtoseconds, topology=topo,
        )
