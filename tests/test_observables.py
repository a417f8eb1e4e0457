"""Observable-layer tests: RDF, virial pressure, heat capacity.

Each estimator is validated against an exact construction: ideal-gas RDF
against g(r) = 1, the LJ virial against a finite-difference -3V dU/dV, and
the pressure of a zero-interaction system against rho*kT.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu import units as u
from chiron_tpu.observables import (
    PRESSURE_MD_TO_BAR,
    heat_capacity_nvt,
    lj_virial,
    lj_virial_pressure,
    radial_distribution_function,
)

L = 4.0
SIGMA, EPS, CUTOFF = 0.34, 0.99579, 1.02


def test_rdf_of_ideal_gas_is_unity():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, L, size=(40, 500, 3)).astype(np.float32)
    box = np.eye(3) * L
    r, g = radial_distribution_function(pos, box, n_bins=40)
    # skip the first bins (few ideal pairs -> noisy); the rest must be ~1
    assert np.all(np.abs(g[5:] - 1.0) < 0.1)
    assert r[-1] < 0.5 * L + 1e-6


def test_rdf_rmax_guard():
    pos = np.zeros((4, 3))
    with pytest.raises(ValueError, match="half the box"):
        radial_distribution_function(pos, np.eye(3) * L, r_max=3.0)


def test_lj_virial_matches_finite_difference():
    """W == -3V dU/dV under uniform scaling (exact virial identity)."""
    rng = np.random.default_rng(3)
    n = 64
    pos = rng.uniform(0, L, size=(n, 3)).astype(np.float64)
    box_diag = jnp.asarray([L, L, L], jnp.float32)

    def U(scale):
        p = jnp.asarray(pos * scale, jnp.float32)
        b = box_diag * scale
        d = p[:, None, :] - p[None, :, :]
        d = d - b * jnp.round(d / b)
        r2 = jnp.sum(d * d, -1)
        ids = jnp.arange(n)
        m = (r2 < CUTOFF * CUTOFF) & (ids[:, None] < ids[None, :])
        r2s = jnp.where(m, r2, 1.0)
        i6 = ((SIGMA * SIGMA) / r2s) ** 3
        return float(jnp.sum(jnp.where(m, 4 * EPS * (i6 * i6 - i6), 0.0)))

    W = float(lj_virial(jnp.asarray(pos, jnp.float32), box_diag,
                        SIGMA, EPS, CUTOFF))
    eps_s = 1e-4
    dU_dlnV = (U(1.0 + eps_s) - U(1.0 - eps_s)) / (
        ((1 + eps_s) ** 3 - (1 - eps_s) ** 3) / 1.0
    )  # dU/d(V/V0)
    # W = -3 V dU/dV = -3 dU/d(lnV-ish): with V = V0 s^3: dU/dV * V = W/-3
    W_fd = -3.0 * dU_dlnV
    assert W == pytest.approx(W_fd, rel=2e-2, abs=0.5)


def test_pressure_of_noninteracting_gas_is_ideal():
    rng = np.random.default_rng(1)
    n = 200
    pos = rng.uniform(0, L, size=(n, 3))
    box = np.eye(3) * L
    T = 120.0 * u.kelvin
    P = lj_virial_pressure(pos, box, T, sigma=SIGMA, epsilon=0.0,
                           cutoff=CUTOFF)
    rho_kT = n * u.kB_MD * 120.0 / L ** 3
    assert P == pytest.approx(rho_kT, rel=1e-6)
    assert P * PRESSURE_MD_TO_BAR == pytest.approx(
        rho_kT * 16.6054, rel=1e-3
    )


def test_heat_capacity_of_gaussian_energy_samples():
    rng = np.random.default_rng(7)
    T = 300.0
    sigma_E = 5.0  # kJ/mol
    E = rng.normal(100.0, sigma_E, size=200_000)
    cv = heat_capacity_nvt(E, T * u.kelvin)
    expected = sigma_E ** 2 / (u.kB_MD * T * T)
    assert cv == pytest.approx(expected, rel=2e-2)


def test_unwrap_trajectory_recovers_ballistic_path():
    """A particle crossing the boundary many times unwraps to a straight
    line."""
    from chiron_tpu.observables import unwrap_trajectory

    L = 2.0
    t = np.arange(50, dtype=np.float32)
    x_true = 0.3 * t  # crosses the box ~7 times
    frames = np.zeros((50, 1, 3), np.float32)
    frames[:, 0, 0] = x_true % L
    out = np.asarray(unwrap_trajectory(frames, [L, L, L]))
    assert np.allclose(out[:, 0, 0], x_true, atol=1e-4)


def test_msd_and_diffusion_of_random_walk():
    """A discrete random walk with step variance s^2 per axis has
    MSD(k) = 3 s^2 k and D = s^2 / (2 dt)."""
    from chiron_tpu.observables import (
        diffusion_coefficient, mean_squared_displacement)

    rng = np.random.default_rng(4)
    s, dt = 0.05, 0.1
    steps = rng.normal(0, s, size=(200, 400, 3)).astype(np.float32)
    frames = np.cumsum(steps, axis=0)
    msd = np.asarray(mean_squared_displacement(frames))
    k = np.arange(len(msd))
    # linear in lag with slope 3 s^2
    assert abs(msd[50] / (3 * s * s * 50) - 1.0) < 0.1
    times = k * dt
    D = diffusion_coefficient(frames, times)
    assert abs(D / (s * s / (2 * dt)) - 1.0) < 0.1


def test_msd_with_wrapped_random_walk_matches_unwrapped():
    from chiron_tpu.observables import mean_squared_displacement

    rng = np.random.default_rng(9)
    L = 1.5
    steps = rng.normal(0, 0.04, size=(100, 64, 3)).astype(np.float32)
    frames = np.cumsum(steps, axis=0)
    wrapped = frames % L
    msd_ref = np.asarray(mean_squared_displacement(frames))
    msd_w = np.asarray(mean_squared_displacement(wrapped, [L, L, L]))
    assert np.allclose(msd_ref, msd_w, rtol=1e-4, atol=1e-5)


def test_vacf_of_constant_velocity_is_one():
    from chiron_tpu.observables import velocity_autocorrelation

    v = np.ones((30, 10, 3), np.float32)
    c = np.asarray(velocity_autocorrelation(v))
    assert np.allclose(c, 1.0, atol=1e-6)


def test_vacf_of_independent_noise_decays():
    from chiron_tpu.observables import velocity_autocorrelation

    rng = np.random.default_rng(2)
    v = rng.normal(size=(100, 256, 3)).astype(np.float32)
    c = np.asarray(velocity_autocorrelation(v))
    assert abs(c[0] - 1.0) < 1e-6
    assert np.all(np.abs(c[1:10]) < 0.05)


def test_msd_translation_invariance():
    """MSD must not change when the whole trajectory is offset far from
    the origin (the f32 S1 - 2*S2 FFT form cancels catastrophically
    without per-particle centering)."""
    from chiron_tpu.observables import mean_squared_displacement

    rng = np.random.default_rng(5)
    steps = rng.normal(0, 0.05, size=(40, 5, 3))
    traj = np.cumsum(steps, axis=0)
    msd0 = np.asarray(mean_squared_displacement(traj))
    msd_off = np.asarray(mean_squared_displacement(traj + 50.0))
    np.testing.assert_allclose(msd_off[1:], msd0[1:], rtol=1e-4)


def test_mbar_expectation_2d_respects_estimator_layout():
    """A 2D (iterations, replicas) observable array must be flattened in
    the estimator's column order, not blind C-order."""
    import pytest

    from chiron_tpu.analysis import MBAREstimator
    from chiron_tpu.observables import mbar_expectation

    rng = np.random.default_rng(6)
    T, R = 50, 2
    # replica-major columns (n = r*T + t), the 3D reporter layout
    xs_r = rng.normal(0, 1, size=(R, T))             # per-replica series
    xs_flat = xs_r.reshape(-1)                       # n = r*T + t
    u_kn = 0.5 * np.asarray([1.0, 1.0])[:, None] * xs_flat[None, :] ** 2
    est = MBAREstimator()
    est.initialize(u_kn, np.array([T, T]), iteration_layout=(T, R))

    a_tr = xs_r.T                                    # natural (T, R) array
    got = mbar_expectation(est, a_tr ** 2, state_index=0)
    want = est.compute_expectation(xs_flat ** 2, state_index=0)
    assert got == pytest.approx(want, abs=1e-12)

    with pytest.raises(ValueError, match="iterations, replicas"):
        mbar_expectation(est, np.zeros((R, T + 1)))
    est2 = MBAREstimator()
    est2.initialize(u_kn, np.array([T, T]))
    with pytest.raises(ValueError, match="iteration layout"):
        mbar_expectation(est2, np.zeros((T, R)))
