"""Fused whole-trajectory MD kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu import units
from chiron_tpu.ops.lj_dense import LJDensePallas
from chiron_tpu.ops.lj_md_fused import FusedLJMD
from chiron_tpu.runtime import make_fast_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid

SIGMA, EPS = 0.34, 0.99579


def _setup(n=216, rho=0.5, T=90.0, gamma=0.0):
    fluid = LennardJonesFluid(nparticles=n, reduced_density=rho)
    runner = make_fast_lj_runner(
        fluid.potential,
        n_particles=n,
        topology=fluid.topology,
        temperature=T * units.kelvin,
        timestep=1.0 * units.femtoseconds,
        collision_rate=gamma / units.picoseconds,
        tm=64,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3,
    )
    md = FusedLJMD(
        n, fluid.potential.sigma, fluid.potential.epsilon,
        fluid.potential.cutoff,
        masses_lane=jnp.full((1, runner.op.n_pad), 39.948),
        dt=0.001, gamma=gamma, kT=units.kB_MD * T, tm=64,
    )
    return fluid, runner, state, md


def test_fused_matches_scan_integrator_deterministic():
    """gamma=0 (no noise): the fused kernel reproduces the scan integrator
    step for step up to f32 reassociation."""
    fluid, runner, state, md = _setup(gamma=0.0)

    s_scan = runner.run(state, 20)
    x_f, v_f, f_f = md.run(
        state.x, state.v, state.F, state.box_vectors, seed=0, n_steps=20
    )
    # same trajectory within f32 reassociation drift over 20 chaotic steps
    dx = float(jnp.max(jnp.abs(x_f - s_scan.x)))
    assert dx < 5e-3, dx
    dv = float(jnp.max(jnp.abs(v_f - s_scan.v)))
    assert dv < 5e-1, dv


@pytest.mark.slow
def test_fused_energy_conservation_gamma_zero():
    """Total energy conserved by the fused velocity-Verlet limit."""
    fluid, runner, state, md = _setup(n=125, rho=0.4, T=60.0, gamma=0.0)
    op = runner.op
    mass = 39.948

    def total(x3, v3):
        v = op.unpad(v3)
        ke = float(0.5 * mass * jnp.sum(v * v))
        _, pe = op.force_energy_t(x3, state.box_vectors)
        return ke + float(pe)

    x3, v3, f3 = md.run(
        state.x, state.v, state.F, state.box_vectors, seed=0, n_steps=500
    )
    e0 = total(x3, v3)
    ke_scale = abs(
        float(0.5 * mass * jnp.sum(op.unpad(v3) ** 2))
    )
    x3b, v3b, _ = md.run(x3, v3, f3, state.box_vectors, seed=1, n_steps=1500)
    e1 = total(x3b, v3b)
    assert abs(e1 - e0) / max(ke_scale, 1.0) < 0.01


@pytest.mark.slow
def test_fused_thermostat_equipartition():
    """<KE> = (3/2) N kT from the in-kernel PRNG thermostat."""
    n, T = 216, 120.0
    fluid, runner, state, md = _setup(n=n, rho=0.4, T=T, gamma=2.0)
    op = runner.op
    mass = 39.948
    x3, v3, f3 = state.x, state.v, state.F
    x3, v3, f3 = md.run(x3, v3, f3, state.box_vectors, seed=0, n_steps=2000)
    kes = []
    for i in range(25):
        x3, v3, f3 = md.run(
            x3, v3, f3, state.box_vectors, seed=100 + i, n_steps=200
        )
        v = op.unpad(v3)
        kes.append(float(0.5 * mass * jnp.sum(v * v)))
    mean_ke = sum(kes) / len(kes)
    expected = 1.5 * n * units.kB_MD * T
    assert mean_ke == pytest.approx(expected, rel=0.05)
