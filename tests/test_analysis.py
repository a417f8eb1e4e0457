"""MBAR estimator tests against analytic harmonic-oscillator free energies."""

import numpy as np
import pytest

from chiron_tpu.analysis import MBAREstimator, mbar_solve, mbar_solve_jax


def _ho_samples(spring_constants, n_samples, seed=0):
    """Sample 1D harmonic oscillators (beta=1) and build u_kn.

    u_k(x) = 0.5 K_k x^2; analytic f_k = -0.5 ln(2 pi / K_k).
    """
    rng = np.random.default_rng(seed)
    xs = []
    for K in spring_constants:
        xs.append(rng.normal(0.0, 1.0 / np.sqrt(K), size=n_samples))
    x_n = np.concatenate(xs)
    u_kn = 0.5 * np.asarray(spring_constants)[:, None] * x_n[None, :] ** 2
    N_k = np.full(len(spring_constants), n_samples)
    f_analytic = -0.5 * np.log(2 * np.pi / np.asarray(spring_constants))
    f_analytic -= f_analytic[0]
    return u_kn, N_k, f_analytic


def test_mbar_recovers_analytic_free_energies():
    Ks = [1.0, 2.0, 4.0, 8.0]
    u_kn, N_k, f_analytic = _ho_samples(Ks, 4000)
    f_k = mbar_solve(u_kn, N_k)
    assert np.allclose(f_k, f_analytic, atol=0.05)
    assert f_k[0] == 0.0


def test_mbar_estimator_interface():
    Ks = [1.0, 4.0]
    u_kn, N_k, f_analytic = _ho_samples(Ks, 4000)
    est = MBAREstimator()
    est.initialize(u_kn, N_k)
    assert est.f_k.shape == (2,)
    assert est.get_free_energy_difference() == pytest.approx(
        f_analytic[-1], abs=0.05
    )


def test_mbar_3d_reporter_layout():
    """(n_iterations, n_states, n_replicas) stacked input
    (reference analysis.py:31-35)."""
    Ks = [1.0, 2.0]
    u_kn, N_k, f_analytic = _ho_samples(Ks, 1000)
    # reshape (2, 2000) -> (T=1000, S=2, R=2): sample n = r*T + t
    u_3d = u_kn.reshape(2, 2, 1000).transpose(2, 0, 1)
    est = MBAREstimator()
    est.initialize(u_3d, N_k)
    assert np.allclose(est.f_k, f_analytic, atol=0.08)


def test_mbar_jax_path_agrees_with_host():
    Ks = [1.0, 2.0, 4.0]
    u_kn, N_k, _ = _ho_samples(Ks, 1000)
    f_host = mbar_solve(u_kn, N_k)
    f_jax = np.asarray(mbar_solve_jax(u_kn.astype(np.float32), N_k))
    assert np.allclose(f_host, f_jax, atol=5e-3)


def test_mbar_input_validation():
    with pytest.raises(ValueError):
        mbar_solve(np.zeros((2, 10)), np.array([5, 4]))  # sum != N
    with pytest.raises(ValueError):
        mbar_solve(np.zeros((2, 10)), np.array([5, 5, 5]))  # wrong K


def test_mbar_expectation():
    """<x^2> at state k equals 1/K_k for the harmonic oscillator."""
    Ks = [1.0, 4.0]
    rng = np.random.default_rng(1)
    n = 4000
    xs = np.concatenate(
        [rng.normal(0, 1 / np.sqrt(K), size=n) for K in Ks]
    )
    u_kn = 0.5 * np.asarray(Ks)[:, None] * xs[None, :] ** 2
    est = MBAREstimator()
    est.initialize(u_kn, np.array([n, n]))
    x2 = est.compute_expectation(xs ** 2, state_index=0)
    assert x2 == pytest.approx(1.0, rel=0.1)
    x2b = est.compute_expectation(xs ** 2, state_index=1)
    assert x2b == pytest.approx(0.25, rel=0.1)
    # all-states form (pymbar compute_expectations shape): same values
    # in one shot, per-state error bars positive
    means, ses = est.compute_expectations(xs ** 2, return_uncertainty=True)
    assert means.shape == (2,) and ses.shape == (2,)
    assert means[0] == pytest.approx(x2, abs=1e-12)
    assert means[1] == pytest.approx(x2b, abs=1e-12)
    assert np.all(ses > 0)
    np.testing.assert_allclose(means, [1.0, 0.25], rtol=0.1)


def test_mbar_uncertainty_brackets_analytic(subtests=None):
    """The asymptotic error bar must bracket the true Delta f across
    independent realizations, and shrink ~1/sqrt(N) (VERDICT r3 item 6;
    pymbar capability, reference chiron/analysis.py:35)."""
    Ks = [1.0, 2.0, 4.0, 8.0]
    hits, ds = 0, []
    for seed in range(8):
        u_kn, N_k, f_analytic = _ho_samples(Ks, 1500, seed=seed)
        est = MBAREstimator()
        est.initialize(u_kn, N_k)
        df, ddf = est.get_free_energy_difference(return_uncertainty=True)
        assert 0.0 < ddf < 0.2
        ds.append(ddf)
        if abs(df - f_analytic[-1]) < 3.0 * ddf:
            hits += 1
    # 3-sigma bracketing should essentially always hold
    assert hits >= 7, (hits, ds)
    # error estimate scales down with more samples
    u_kn, N_k, _ = _ho_samples(Ks, 6000, seed=100)
    est_big = MBAREstimator()
    est_big.initialize(u_kn, N_k)
    _, ddf_big = est_big.get_free_energy_difference(return_uncertainty=True)
    assert ddf_big < 0.7 * np.mean(ds)


def test_mbar_delta_f_ij_consistency():
    Ks = [1.0, 2.0, 4.0]
    u_kn, N_k, _ = _ho_samples(Ks, 2000, seed=3)
    est = MBAREstimator()
    est.initialize(u_kn, N_k)
    delta, d = est.delta_f_ij()
    assert delta.shape == (3, 3) and d.shape == (3, 3)
    assert np.allclose(np.diag(delta), 0.0)
    assert np.allclose(np.diag(d), 0.0, atol=1e-6)
    assert np.allclose(delta, -delta.T)
    assert np.allclose(d, d.T)
    # end-state entry matches get_free_energy_difference
    df, ddf = est.get_free_energy_difference(return_uncertainty=True)
    assert delta[0, -1] == pytest.approx(df)
    assert d[0, -1] == pytest.approx(ddf)
    # uncertainties of f_k relative to state 0
    assert np.allclose(est.d_f_k, d[0, :])


def test_mbar_overlap_diagnostics():
    # pymbar convention: scalar = 1 - eigenvalues[1]; near 1 = connected.
    # well-overlapping ladder: scalar far from 0, rows sum to 1
    Ks = [1.0, 1.5, 2.25]
    u_kn, N_k, _ = _ho_samples(Ks, 2000, seed=5)
    est = MBAREstimator()
    est.initialize(u_kn, N_k)
    ov = est.compute_overlap()
    O = ov["matrix"]
    assert O.shape == (3, 3)
    assert np.allclose(O.sum(axis=1), 1.0, atol=1e-8)
    assert ov["eigenvalues"][0] == pytest.approx(1.0, abs=1e-8)
    assert ov["scalar"] > 0.5
    # (nearly) disjoint ladder: scalar approaches 0
    u2, N2, _ = _ho_samples([1.0, 10000.0], 2000, seed=6)
    est2 = MBAREstimator()
    est2.initialize(u2, N2)
    assert est2.compute_overlap()["scalar"] < 0.1


def test_mbar_expectation_uncertainty():
    """<x^2> at state 0 of a sampled HO ladder: the weighted-SE estimate
    must bracket the analytic value and shrink with more samples."""
    Ks = [1.0, 2.0]
    hits = 0
    ses = []
    for seed in range(6):
        u_kn, N_k, _ = _ho_samples(Ks, 1500, seed=seed)
        # reconstruct the samples used by _ho_samples for A_n = x^2
        rng = np.random.default_rng(seed)
        xs = [rng.normal(0.0, 1.0 / np.sqrt(K), size=1500) for K in Ks]
        x_n = np.concatenate(xs)
        est = MBAREstimator()
        est.initialize(u_kn, N_k)
        mean, se = est.compute_expectation(
            x_n ** 2, state_index=0, return_uncertainty=True
        )
        assert se > 0
        ses.append(se)
        if abs(mean - 1.0) < 3.0 * se:  # <x^2> = 1/K_0 = 1
            hits += 1
    assert hits >= 5, (hits, ses)


def test_registry_unregistered_class_returns_none():
    from chiron_tpu.potential import (
        HarmonicOscillatorPotential, stack_registered_params,
    )
    from chiron_tpu.testsystems import HarmonicOscillator
    from chiron_tpu import units as u

    class NotRegistered:
        pass

    ho = HarmonicOscillator()
    K = 1.0 * u.kilocalories_per_mole / u.angstrom ** 2
    pots = [HarmonicOscillatorPotential(ho.topology, k=K), NotRegistered()]
    assert stack_registered_params(pots) is None


def test_registry_inconsistent_shapes_returns_none():
    import jax.numpy as jnp
    from chiron_tpu.potential import (
        register_potential_kind, stack_registered_params,
    )

    class VecWell:
        def __init__(self, x0):
            self.x0 = jnp.asarray(x0, jnp.float32)

    register_potential_kind(
        VecWell,
        params_of=lambda p: {"x0": p.x0},
        energy_fn=lambda prm, x, box: jnp.sum((x - prm["x0"]) ** 2),
    )
    ok = stack_registered_params([VecWell([[0.0] * 3]), VecWell([[0.0] * 3])])
    assert ok is not None
    bad = stack_registered_params(
        [VecWell([[0.0] * 3]), VecWell([[0.0] * 3, [1.0] * 3])]
    )
    assert bad is None


def test_mbar_bootstrap_agrees_with_asymptotic():
    """Bootstrap d_f_k on an iid HO ladder must agree with the
    asymptotic (Eq. D6) estimate -- same order, within 2x either way --
    and the replicate mean must stay consistent with the analytic f."""
    from chiron_tpu.analysis import mbar_bootstrap

    Ks = [1.0, 2.0, 4.0]
    u_kn, N_k, f_analytic = _ho_samples(Ks, 2000, seed=9)
    est = MBAREstimator()
    est.initialize(u_kn, N_k)
    d_boot = est.bootstrap_d_f_k(n_bootstrap=40, seed=1)
    d_asym = est.d_f_k
    assert d_boot[0] == 0.0  # gauge state
    for k in range(1, len(Ks)):
        ratio = d_boot[k] / d_asym[k]
        assert 0.5 < ratio < 2.0, (k, d_boot[k], d_asym[k])
    # replicate spread brackets the truth
    _, fs = mbar_bootstrap(u_kn, N_k, n_bootstrap=40, seed=1)
    for k in range(1, len(Ks)):
        err = abs(fs[:, k].mean() - f_analytic[k])
        assert err < 4.0 * max(d_boot[k], 1e-6), (k, err, d_boot[k])


def test_mbar_bootstrap_layout_guard():
    from chiron_tpu.analysis import mbar_bootstrap

    u_kn, N_k, _ = _ho_samples([1.0, 2.0], 100)
    with pytest.raises(ValueError, match="origin-block"):
        mbar_bootstrap(u_kn[:, :-5], N_k)


def test_statistical_inefficiency_ar1():
    """AR(1) with coefficient phi has g = (1+phi)/(1-phi) exactly."""
    from chiron_tpu.analysis import statistical_inefficiency

    rng = np.random.default_rng(4)
    for phi, tol in [(0.0, 0.15), (0.6, 0.25), (0.9, 0.35)]:
        g_true = (1 + phi) / (1 - phi)
        x = np.empty(200_000)
        x[0] = rng.normal()
        eps = rng.normal(size=x.size)
        for t in range(1, x.size):
            x[t] = phi * x[t - 1] + eps[t]
        g = statistical_inefficiency(x)
        assert abs(g - g_true) / g_true < tol, (phi, g, g_true)


def test_detect_equilibration_finds_transient():
    from chiron_tpu.analysis import detect_equilibration

    rng = np.random.default_rng(5)
    burn = np.linspace(10.0, 0.0, 500)        # decaying transient
    prod = rng.normal(0.0, 1.0, 4000)          # equilibrated region
    t0, g, n_eff = detect_equilibration(np.concatenate([burn, prod]),
                                        nskip=10)
    assert 300 <= t0 <= 700, t0
    assert n_eff > 2000


def test_subsample_correlated_data_decorrelates():
    from chiron_tpu.analysis import (
        statistical_inefficiency, subsample_correlated_data,
    )

    rng = np.random.default_rng(6)
    phi = 0.8
    x = np.empty(100_000)
    x[0] = rng.normal()
    eps = rng.normal(size=x.size)
    for t in range(1, x.size):
        x[t] = phi * x[t - 1] + eps[t]
    idx = subsample_correlated_data(x)
    # stride ~g keeps ~N/g samples, and the subsampled series is
    # (nearly) uncorrelated
    g_full = statistical_inefficiency(x)
    assert abs(len(idx) - x.size / g_full) / (x.size / g_full) < 0.1
    g_sub = statistical_inefficiency(x[idx])
    assert g_sub < 1.6, g_sub


def test_bar_and_exp_recover_analytic_ho():
    """BAR and EXP on a 2-state HO pair: w_F = (K1-K0)/2 x^2 on state-0
    samples, w_R = (K0-K1)/2 x^2 on state-1 samples; analytic
    Delta f = -0.5 ln(K0/K1)."""
    from chiron_tpu.analysis import bar, exp_free_energy

    rng = np.random.default_rng(12)
    K0, K1, n = 1.0, 2.5, 6000
    x0 = rng.normal(0, 1 / np.sqrt(K0), n)
    x1 = rng.normal(0, 1 / np.sqrt(K1), n)
    w_F = 0.5 * (K1 - K0) * x0 ** 2
    w_R = 0.5 * (K0 - K1) * x1 ** 2
    f_true = -0.5 * np.log(2 * np.pi / K1) + 0.5 * np.log(2 * np.pi / K0)

    df_bar, ddf_bar = bar(w_F, w_R)
    assert 0.0 < ddf_bar < 0.1
    assert abs(df_bar - f_true) < 3.5 * ddf_bar, (df_bar, f_true, ddf_bar)

    df_exp, ddf_exp = exp_free_energy(w_F)
    assert abs(df_exp - f_true) < 0.1, (df_exp, f_true)
    # BAR (two-sided, optimal) must not be worse than one-sided EXP
    assert ddf_bar <= 2.0 * ddf_exp


def test_bar_agrees_with_mbar_two_state():
    """BAR IS MBAR at K=2 -- same point estimate."""
    from chiron_tpu.analysis import bar

    rng = np.random.default_rng(13)
    K0, K1, n = 1.0, 4.0, 3000
    x0 = rng.normal(0, 1 / np.sqrt(K0), n)
    x1 = rng.normal(0, 1 / np.sqrt(K1), n)
    x_n = np.concatenate([x0, x1])
    u_kn = np.stack([0.5 * K0 * x_n ** 2, 0.5 * K1 * x_n ** 2])
    f_k = mbar_solve(u_kn, np.array([n, n]))
    df_bar, _ = bar(0.5 * (K1 - K0) * x0 ** 2, 0.5 * (K0 - K1) * x1 ** 2)
    assert df_bar == pytest.approx(f_k[1], abs=1e-8)


def test_mbar_bootstrap_iteration_resampling_replica_exchange():
    """Replica-ordered columns with mid-run swaps: per-block resampling
    would mix states inside a block; iteration resampling preserves the
    one-sample-per-state-per-iteration structure exactly and the error
    bar stays consistent with the asymptotic one."""
    from chiron_tpu.analysis import mbar_bootstrap

    rng = np.random.default_rng(21)
    Ks = [1.0, 3.0]
    T = 2000
    # replica 0 samples state 0 for the first half then state 1 (swap);
    # replica 1 the mirror -- every iteration has one sample per state
    half = T // 2
    s_of = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (1, 1): 0}  # (replica, half)
    x = np.empty((2, T))
    for r in range(2):
        for h in range(2):
            K = Ks[s_of[(r, h)]]
            x[r, h * half:(h + 1) * half] = rng.normal(
                0, 1 / np.sqrt(K), half
            )
    # reporter layout: (T, S, R) -> initialize flattens to n = r*T + t
    u_3d = np.empty((T, 2, 2))
    for k, K in enumerate(Ks):
        u_3d[:, k, :] = 0.5 * K * (x.T ** 2)
    est = MBAREstimator()
    est.initialize(u_3d, np.array([T, T]))
    assert est._iteration_layout == (T, 2)
    f_true = -0.5 * np.log(2 * np.pi / np.asarray(Ks))
    f_true -= f_true[0]
    assert abs(est.f_k[1] - f_true[1]) < 0.1
    d_boot = est.bootstrap_d_f_k(n_bootstrap=40, seed=2)
    d_asym = est.d_f_k
    assert d_boot[0] == 0.0
    assert 0.4 < d_boot[1] / d_asym[1] < 2.5, (d_boot[1], d_asym[1])
    # truth bracketed by the bootstrap error bar
    assert abs(est.f_k[1] - f_true[1]) < 4.0 * d_boot[1]
    # bad tiling is rejected
    with pytest.raises(ValueError, match="does not tile"):
        mbar_bootstrap(est._u_kn, est._N_k, iteration_layout=(T, 3))
    # iteration-MAJOR ordering (n = t*R + r, the ParallelTempering
    # layout) of the same data gives the same error bar: the two
    # orderings are column permutations of each other and iteration
    # resampling picks the same per-iteration column groups
    R = 2
    perm = np.arange(T * R).reshape(R, T).T.ravel()  # r*T+t -> t*R+r
    d_major, _ = mbar_bootstrap(
        est._u_kn[:, perm], est._N_k, n_bootstrap=40, seed=2,
        iteration_layout=(T, R), iteration_major=True,
    )
    # fp-reduction noise only (permuted-column summation order); measured
    # ~1e-13 here, asserted with margin for other BLAS reduction orders
    np.testing.assert_allclose(d_major, d_boot, rtol=1e-9)


def test_pt_estimator_bootstrap_uses_iteration_resampling():
    """ParallelTemperingSampler.compute_free_energies builds swap-mixed
    iteration-major columns; its estimator must carry the (T, R) layout
    so bootstrap_d_f_k resamples iterations, never origin blocks."""
    from chiron_tpu.analysis import MBAREstimator

    est = MBAREstimator()
    T, R = 500, 3
    rng = np.random.default_rng(5)
    u_kn = rng.normal(size=(R, T * R))
    est.initialize(u_kn, np.full(R, T),
                   iteration_layout=(T, R), iteration_major=True)
    assert est._iteration_layout == (T, R)
    assert est._iteration_major is True
    d = est.bootstrap_d_f_k(n_bootstrap=5, seed=0)
    assert d.shape == (R,) and d[0] == 0.0 and np.all(np.isfinite(d))


def test_mbar_bootstrap_iteration_layout_rejects_nonuniform_N_k():
    """Iteration resampling preserves N_k only for one-sample-per-state-
    per-iteration data; a layout that tiles the sample count but whose
    N_k is not uniform T must be rejected, not silently resampled."""
    from chiron_tpu.analysis import mbar_bootstrap

    rng = np.random.default_rng(3)
    u_kn = rng.normal(size=(2, 400))
    with pytest.raises(ValueError, match="one sample per"):
        mbar_bootstrap(u_kn, np.array([300, 100]),
                       iteration_layout=(200, 2))


def test_mbar_perturbed_free_energies_unsampled_state():
    """Reweight a 2-state sampled HO ladder to an UNSAMPLED stiffness:
    f of the perturbed state matches the analytic value within its own
    error bar, and feeding a sampled state's u row back reproduces the
    solved f_k for that state."""
    from chiron_tpu.analysis import mbar_solve

    Ks = [1.0, 4.0]
    K_new = 2.0
    rng = np.random.default_rng(11)
    n = 4000
    xs = np.concatenate(
        [rng.normal(0, 1 / np.sqrt(K), size=n) for K in Ks]
    )
    u_kn = 0.5 * np.asarray(Ks)[:, None] * xs[None, :] ** 2
    est = MBAREstimator()
    est.initialize(u_kn, np.array([n, n]))
    u_new = 0.5 * K_new * xs ** 2
    f_l, d_f_l = est.compute_perturbed_free_energies(u_new)
    assert f_l.shape == (1,) and d_f_l.shape == (1,)
    f_true = 0.5 * np.log(K_new / Ks[0])  # 1D HO, f_k[0] gauge
    assert abs(f_l[0] - f_true) < max(3.0 * d_f_l[0], 0.05), (
        f_l[0], f_true, d_f_l[0]
    )
    assert d_f_l[0] > 0
    # a sampled state reweights to itself
    f_same, d_same = est.compute_perturbed_free_energies(u_kn[1])
    assert f_same[0] == pytest.approx(est.f_k[1], abs=1e-8)
    # its uncertainty matches the sampled-state estimate
    assert d_same[0] == pytest.approx(est.d_f_k[1], rel=0.05)
    # shape guard
    with pytest.raises(ValueError, match="pooled samples"):
        est.compute_perturbed_free_energies(u_new[:-3])


def test_exp_free_energy_small_n_guard():
    from chiron_tpu.analysis import exp_free_energy

    with pytest.raises(ValueError, match="at least 2"):
        exp_free_energy(np.array([1.0]))
    with pytest.raises(ValueError, match="at least 2"):
        exp_free_energy(np.array([]))


def test_entropy_enthalpy_decomposition_ho():
    """1D HO at beta=1: <u>_k = 1/2 exactly (equipartition), and
    f = u - s must close identically."""
    Ks = [1.0, 2.0, 4.0]
    u_kn, N_k, f_analytic = _ho_samples(Ks, 6000, seed=30)
    est = MBAREstimator()
    est.initialize(u_kn, N_k)
    f_k, u_k, s_k = est.compute_entropy_and_enthalpy()
    assert np.allclose(u_k, 0.5, atol=0.03), u_k
    assert np.allclose(f_k, u_k - s_k, atol=1e-12)
    # entropy difference: s_k - s_0 = (u_k - u_0) - (f_k - f_0) =
    # -f_analytic since the enthalpies are all 1/2
    assert np.allclose(s_k - s_k[0], -f_analytic, atol=0.08)


# -- differentiable MBAR (implicit-function-theorem VJP) -----------------


def test_mbar_implicit_matches_host():
    """The jittable implicit-diff solve reproduces the f64 host solver."""
    from chiron_tpu.analysis import mbar_solve_implicit
    import jax.numpy as jnp

    Ks = [1.0, 2.0, 4.0]
    u_kn, N_k, _ = _ho_samples(Ks, 1000)
    f_host = mbar_solve(u_kn, N_k)
    f_imp = np.asarray(
        mbar_solve_implicit(jnp.asarray(u_kn, jnp.float32), jnp.asarray(N_k))
    )
    # the Newton polish converges the f32 solve to its roundoff floor
    assert np.allclose(f_host, f_imp, atol=1e-5)
    assert f_imp[0] == 0.0


@pytest.mark.slow
def test_mbar_implicit_grad_matches_host_fd():
    """Implicit gradient == central finite differences of the f64 host
    solver (the exactness oracle: both differentiate the same converged
    estimator; the observed agreement is ~1e-7 relative)."""
    import jax
    import jax.numpy as jnp
    from chiron_tpu.analysis import mbar_solve_implicit

    Ks = [1.0, 2.0, 4.0]
    u_kn, N_k, _ = _ho_samples(Ks, 400)

    def f_jax(theta):
        u = jnp.asarray(u_kn, jnp.float32)
        u = u.at[2].set(theta * u[2])
        return mbar_solve_implicit(u, jnp.asarray(N_k))[-1]

    g = float(jax.grad(f_jax)(jnp.float32(1.0)))

    def f_host(theta):
        u = u_kn.copy()
        u[2] = theta * u[2]
        return mbar_solve(u, N_k)[-1]

    h = 1e-5
    fd = (f_host(1 + h) - f_host(1 - h)) / (2 * h)
    assert g == pytest.approx(fd, rel=1e-3)


@pytest.mark.slow
def test_mbar_implicit_grad_matches_unrolled():
    """Full-matrix cotangent parity: the implicit VJP agrees with plain
    autodiff unrolled through the fixed-iteration scan solver."""
    import jax
    import jax.numpy as jnp
    from chiron_tpu.analysis import mbar_solve_implicit

    Ks = [1.0, 3.0]
    u_kn, N_k, _ = _ho_samples(Ks, 150, seed=7)
    u32 = jnp.asarray(u_kn, jnp.float32)
    N = jnp.asarray(N_k)

    g_imp = jax.grad(lambda u: mbar_solve_implicit(u, N)[-1])(u32)
    g_unr = jax.grad(
        lambda u: mbar_solve_jax(u, N, n_iterations=400)[-1]
    )(u32)
    np.testing.assert_allclose(
        np.asarray(g_imp), np.asarray(g_unr), atol=5e-6
    )


@pytest.mark.slow
def test_perturbed_jax_grad_is_target_weights():
    """For an UNSAMPLED target state, df_l/du_ln must equal the target
    state's MBAR weights W_ln (the textbook reweighting identity) --
    machine-precision pin of the differentiable perturbed path."""
    import jax
    import jax.numpy as jnp
    from chiron_tpu.analysis import (
        mbar_perturbed_free_energies_jax,
        mbar_solve_implicit,
    )

    Ks = [1.0, 2.0, 4.0]
    rng = np.random.default_rng(3)
    n = 300
    xs = np.concatenate(
        [rng.normal(0, 1 / np.sqrt(K), size=n) for K in Ks]
    )
    u_kn = jnp.asarray(
        0.5 * np.asarray(Ks)[:, None] * xs[None, :] ** 2, jnp.float32
    )
    N_k = jnp.asarray(np.full(3, n))
    f_k = mbar_solve_implicit(u_kn, N_k)
    u_ln = jnp.asarray(0.5 * 3.0 * xs[None, :] ** 2, jnp.float32)

    f_l = mbar_perturbed_free_energies_jax(u_kn, N_k, f_k, u_ln)
    grad = jax.grad(
        lambda ul: mbar_perturbed_free_energies_jax(u_kn, N_k, f_k, ul)[0]
    )(u_ln)

    log_denom = jax.nn.logsumexp(
        (f_k + jnp.log(N_k.astype(jnp.float32)))[:, None] - u_kn, axis=0
    )
    W_l = jnp.exp(f_l[0] - u_ln[0] - log_denom)
    np.testing.assert_allclose(
        np.asarray(grad[0]), np.asarray(W_l), atol=1e-6
    )
    assert float(W_l.sum()) == pytest.approx(1.0, abs=1e-4)


@pytest.mark.slow
def test_differentiable_free_energy_through_potential():
    """End-to-end: jax.grad flows positions -> LJ energies -> u_kn ->
    MBAR -> Delta f.  d(Delta f)/d(epsilon_ladder) matches finite
    differences of the f64 host pipeline (the gradient identity holds
    for ANY fixed sample set, so synthetic cluster configurations
    suffice and keep the test fast)."""
    import jax
    import jax.numpy as jnp
    from chiron_tpu.analysis import mbar_solve, mbar_solve_implicit

    rng = np.random.default_rng(11)
    n_cfg, n_atoms = 60, 8
    # configurations = small jitters of a 2x2x2 lattice at the LJ minimum
    # spacing (overlap-free, so u_kn stays O(1) and f32-representable)
    sigma, beta = 0.34, 0.4
    lattice = (
        np.stack(np.meshgrid(*[np.arange(2)] * 3), -1).reshape(-1, 3)
        * (2 ** (1 / 6) * sigma)
    )
    x_n = lattice[None] + rng.normal(
        0.0, 0.02, size=(3 * n_cfg, n_atoms, 3)
    )
    eps0 = np.array([0.25, 0.5, 1.0])
    N_k = np.full(3, n_cfg)

    def lj_energy(x, eps):
        ids = np.arange(n_atoms)
        half = jnp.asarray(ids[:, None] < ids[None, :])
        d = x[:, None, :] - x[None, :, :]
        r2 = (d * d).sum(-1) + jnp.where(half, 0.0, 1.0)
        s6 = (sigma**2 / r2) ** 3
        return jnp.where(half, 4.0 * eps * (s6 * s6 - s6), 0.0).sum()

    xs = jnp.asarray(x_n, jnp.float32)

    def delta_f(eps_k):
        u_kn = beta * jax.vmap(
            lambda e: jax.vmap(lambda x: lj_energy(x, e))(xs)
        )(eps_k)
        return mbar_solve_implicit(u_kn, jnp.asarray(N_k))[-1]

    grad = np.asarray(jax.grad(delta_f)(jnp.asarray(eps0, jnp.float32)))

    def delta_f_host(eps_k):
        u_kn = beta * np.stack(
            [
                np.asarray(
                    jax.vmap(lambda x: lj_energy(x, float(e)))(
                        jnp.asarray(x_n)
                    )
                )
                for e in eps_k
            ]
        )
        return mbar_solve(u_kn.astype(np.float64), N_k)[-1]

    h = 1e-4
    for j in range(3):
        ep, em = eps0.copy(), eps0.copy()
        ep[j] += h
        em[j] -= h
        fd = (delta_f_host(ep) - delta_f_host(em)) / (2 * h)
        assert grad[j] == pytest.approx(fd, rel=2e-2, abs=1e-4), (j, grad, fd)


@pytest.mark.slow
def test_sampled_state_gradient_vs_physical_frozen_origin():
    """A sampled state's u_kn row is both target potential AND origin
    declaration, so differentiating it through the solve gives the
    estimator's sensitivity -- NOT the physical d f/d theta (for this
    analytic HO pair the two limits are ~0.69 vs 0.5).  The consistent
    physical gradient freezes the origins and differentiates the
    perturbed-state path (reweighted TI); this test pins BOTH facts the
    docstrings claim."""
    import jax
    import jax.numpy as jnp
    from chiron_tpu.analysis import (
        mbar_perturbed_free_energies_jax,
        mbar_solve_implicit,
    )

    rng = np.random.default_rng(5)
    n = 4000
    Ks = [1.0, 4.0]
    xs = np.concatenate(
        [rng.normal(0, 1 / np.sqrt(K), size=n) for K in Ks]
    )
    u_kn = jnp.asarray(
        0.5 * np.asarray(Ks)[:, None] * xs[None, :] ** 2, jnp.float32
    )
    N_k = jnp.asarray(np.full(2, n))
    f0 = mbar_solve_implicit(u_kn, N_k)

    # estimator sensitivity: theta redefines the sampled state
    g_est = float(jax.grad(
        lambda t: mbar_solve_implicit(u_kn.at[1].mul(t), N_k)[-1]
    )(jnp.float32(1.0)))

    # physical gradient: origins frozen, theta moves a TARGET state
    def f_phys(t):
        return mbar_perturbed_free_energies_jax(
            u_kn, N_k, f0, (t * u_kn[1])[None, :]
        )[0]

    g_phys = float(jax.grad(f_phys)(jnp.float32(1.0)))

    # analytic: d f/d theta of u = theta * 0.5 K x^2 at theta=1 is 1/2
    assert g_phys == pytest.approx(0.5, abs=0.03)
    # and the estimator's own sensitivity is a DIFFERENT object
    assert g_est > 0.6, (g_est, g_phys)


def test_mbar_solve_jax_zero_count_state_matches_host_reweighting():
    """A zero-count (perturbed) state must be EXCLUDED from the mixture
    denominator (-inf masking, not log(tiny)) and its f must equal the
    host reweighting value."""
    from chiron_tpu.analysis import mbar_perturbed_free_energies

    Ks = [1.0, 4.0]
    rng = np.random.default_rng(2)
    n = 2000
    xs = np.concatenate(
        [rng.normal(0, 1 / np.sqrt(K), size=n) for K in Ks]
    )
    u_kn = 0.5 * np.asarray(Ks)[:, None] * xs[None, :] ** 2
    u_aug = np.vstack([u_kn, 0.5 * 9.0 * xs[None, :] ** 2])  # K=9 target
    N_aug = np.array([n, n, 0])

    f_host = mbar_solve(u_kn, np.array([n, n]))
    f_target, _ = mbar_perturbed_free_energies(
        u_kn, np.array([n, n]), f_host, u_aug[2:3]
    )
    f_jax = np.asarray(mbar_solve_jax(u_aug.astype(np.float32), N_aug))
    assert np.isfinite(f_jax).all()
    assert np.allclose(f_jax[:2], f_host, atol=5e-3)
    assert f_jax[2] == pytest.approx(float(f_target[0]), abs=5e-3)


def test_mbar_solve_implicit_zero_count_state_is_finite_and_correct():
    """The Newton polish must not go NaN when N_k contains a zero
    (singular Hessian row); the zero-count state's f comes from
    reweighting and gradients still flow."""
    import jax
    import jax.numpy as jnp

    from chiron_tpu.analysis import (mbar_perturbed_free_energies,
                                     mbar_solve_implicit)

    Ks = [1.0, 4.0]
    rng = np.random.default_rng(3)
    n = 2000
    xs = np.concatenate(
        [rng.normal(0, 1 / np.sqrt(K), size=n) for K in Ks]
    )
    u_kn = 0.5 * np.asarray(Ks)[:, None] * xs[None, :] ** 2
    u_aug = jnp.asarray(
        np.vstack([u_kn, 0.5 * 9.0 * xs[None, :] ** 2]), jnp.float32
    )
    N_aug = jnp.asarray([n, n, 0], jnp.float32)

    f = np.asarray(mbar_solve_implicit(u_aug, N_aug))
    assert np.isfinite(f).all()
    f_host = mbar_solve(u_kn, np.array([n, n]))
    f_target, _ = mbar_perturbed_free_energies(
        u_kn, np.array([n, n]), f_host, np.asarray(u_aug)[2:3]
    )
    assert np.allclose(f[:2], f_host, atol=5e-3)
    assert f[2] == pytest.approx(float(f_target[0]), abs=5e-3)
    # gradient of the perturbed state's f is finite
    g = jax.grad(lambda u: mbar_solve_implicit(u, N_aug)[2])(u_aug)
    assert np.isfinite(np.asarray(g)).all()


def test_detect_equilibration_uses_pymbar_neff_formula():
    """The returned N_eff must be (T - t0 + 1)/g -- pymbar's exact
    formula -- and the scan must include t0 = T - 2."""
    from chiron_tpu.analysis import (detect_equilibration,
                                     statistical_inefficiency)

    rng = np.random.default_rng(4)
    A = rng.normal(size=120)
    t0, g, n_eff = detect_equilibration(A)
    assert n_eff == pytest.approx((A.size - t0 + 1) / g)
    g_check = statistical_inefficiency(A[t0:])
    assert g == pytest.approx(g_check)
