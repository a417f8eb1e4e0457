"""Differentiable free energies: jax.grad THROUGH the MBAR estimator.

The companion of examples/differentiable_md.py (gradients through the
*sampler*): here gradients flow through the *analysis* layer.  The
reference bills chiron as a differentiable-MCMC engine (reference
README.md:8) but wraps pymbar (reference chiron/analysis.py:35), whose
numpy solver is a dead end for ``jax.grad``.  ``mbar_solve_implicit``
(chiron_tpu/analysis.py) closes the chain with an implicit-function-
theorem VJP, so force-field sensitivities of free energies come from one
backward pass:

    samples -> U(x; eps, sigma) -> u_kn -> MBAR -> Delta f
                                                   |
    d Delta f / d (eps_k, sigma)  <----- jax.grad -+

The workload is an alchemical epsilon ladder on a small LJ fluid sampled
by the framework's own Metropolis displacement chains.

TWO DISTINCT GRADIENTS exist here, and the example demonstrates both
(the mbar_solve_implicit docstring derives the distinction):

* the ESTIMATOR's sensitivity -- jax.grad through the solve, where a
  sampled state's u_kn row is both target and origin declaration.
  Exact for the estimator (checked against f64 finite differences
  below) and the right object for solver/ladder sensitivity analysis,
  but NOT a consistent estimator of the physical d(Delta f)/d theta;
* the PHYSICAL gradient -- freeze the origins (one solve at the
  sampled parameters), express the endpoints as theta-dependent TARGET
  states on the pooled samples (mbar_perturbed_free_energies_jax), and
  differentiate.  Its gradient is the reweighted TI estimator
  sum_n W_ln du_ln/d theta, consistent -- this is the one to use for
  force-field fitting, and the Newton fit at the end drives it.

Checks: (1) estimator-gradient exactness vs f64 finite differences;
(2) the physical gradient equals the reweighted TI expectation exactly
and the direct TI sample average statistically; (3) the unsampled-state
gradient identity df_l/du_ln == W_ln; (4) a Newton fit of eps_K to a
target Delta f on the physical objective.
"""

import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu import units
from chiron_tpu.analysis import (
    mbar_perturbed_free_energies_jax,
    mbar_solve,
    mbar_solve_implicit,
)
from chiron_tpu.mcmc import MonteCarloDisplacementMove
from chiron_tpu.neighbors import OrthogonalPeriodicSpace, PairListNsqrd
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.utils import PRNG


def sample_ladder(fluid, lambdas, T, n_snapshots, moves_per_snapshot,
                  n_equil_snapshots):
    """Sample each epsilon-scaled state with a compiled displacement
    chain; snapshot positions between segments.  One jitted program
    serves every state (identical shapes/static config)."""
    snaps = []
    for i, lam in enumerate(lambdas):
        potential = type(fluid.potential)(
            fluid.topology, sigma=fluid.sigma,
            epsilon=lam * fluid.epsilon, cutoff=fluid.cutoff,
        )
        thermo = ThermodynamicState(potential, temperature=T)
        state = SamplerState(
            fluid.positions,
            current_PRNG_key=PRNG.get_random_key(),
            box_vectors=fluid.box_vectors,
        )
        pairs = PairListNsqrd(OrthogonalPeriodicSpace(), cutoff=fluid.cutoff)
        pairs.build_from_state(state)
        move = MonteCarloDisplacementMove(
            displacement_sigma=0.05 * units.nanometer,
            number_of_moves=moves_per_snapshot,
            autotune=True, autotune_interval=moves_per_snapshot,
        )
        xs = []
        for s in range(n_snapshots + n_equil_snapshots):
            state, thermo, pairs = move.update(state, thermo, pairs)
            if s >= n_equil_snapshots:
                xs.append(np.asarray(state.positions))  # unitless md system
        snaps.append(np.stack(xs))
        print(f"  lambda={lam:.2f}: {len(xs)} snapshots, "
              f"acceptance {move.n_accepted / move.n_proposed:.2f}")
    return np.concatenate(snaps)  # (K * n_snapshots, N, 3)


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    lambdas = [0.4, 0.6, 0.8, 1.0]
    fluid = LennardJonesFluid(nparticles=27, reduced_density=0.4)
    T = 300.0 * units.kelvin
    beta = 1.0 / (units.kB_MD * 300.0)
    sig0 = float(fluid.sigma.value_in_unit_system(units.md_unit_system))
    eps0 = float(fluid.epsilon.value_in_unit_system(units.md_unit_system))
    cut = float(fluid.cutoff.value_in_unit_system(units.md_unit_system))
    box = jnp.diagonal(jnp.asarray(
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        jnp.float32))
    n = 27

    PRNG.set_seed(7)
    print("sampling the epsilon ladder with Metropolis displacement chains")
    x_n = sample_ladder(fluid, lambdas, T, n_snapshots=60,
                        moves_per_snapshot=100, n_equil_snapshots=20)
    n_cfg = x_n.shape[0] // len(lambdas)
    N_k = jnp.asarray(np.full(len(lambdas), n_cfg))
    xs = jnp.asarray(x_n, jnp.float32)

    def lj_energy(x, eps, sigma):
        ids = jnp.arange(n)
        d = x[:, None, :] - x[None, :, :]
        d = d - box * jnp.round(d / box)
        r2 = jnp.sum(d * d, axis=-1)
        mask = (r2 < cut * cut) & (ids[:, None] < ids[None, :])
        s6 = ((sigma * sigma) / jnp.where(mask, r2, 1.0)) ** 3
        return jnp.sum(jnp.where(mask, 4.0 * eps * (s6 * s6 - s6), 0.0))

    def delta_f(eps_k, sigma):
        """Reduced free energy of the last ladder rung vs the first,
        as a differentiable function of every state's epsilon and the
        shared sigma."""
        u_kn = beta * jax.vmap(
            lambda e: jax.vmap(lambda x: lj_energy(x, e, sigma))(xs)
        )(eps_k)
        return mbar_solve_implicit(u_kn, N_k)[-1]

    eps_k0 = jnp.asarray([lam * eps0 for lam in lambdas], jnp.float32)
    df = float(delta_f(eps_k0, jnp.float32(sig0)))
    g_eps, g_sig = jax.jit(jax.grad(delta_f, argnums=(0, 1)))(
        eps_k0, jnp.float32(sig0))
    print(f"Delta f (lambda {lambdas[0]} -> {lambdas[-1]}) = {df:.4f} kT")
    print("d Delta f / d eps_k =", np.round(np.asarray(g_eps), 4))
    print(f"d Delta f / d sigma = {float(g_sig):+.3f} kT/nm")

    # -- check 1: exactness vs f64 host finite differences ---------------
    def delta_f_host(eps_k, sigma):
        u_kn = np.stack([
            beta * np.asarray(jax.vmap(
                lambda x: lj_energy(x, float(e), float(sigma)))(xs))
            for e in eps_k
        ]).astype(np.float64)
        return mbar_solve(u_kn, np.asarray(N_k))[-1]

    h = 1e-3 * sig0
    fd_sig = (delta_f_host(eps_k0, sig0 + h)
              - delta_f_host(eps_k0, sig0 - h)) / (2 * h)
    rel = abs(fd_sig - float(g_sig)) / abs(fd_sig)
    print(f"finite diff sigma   = {fd_sig:+.3f}  (rel err {rel:.1e})")
    assert rel < 2e-2, (fd_sig, float(g_sig))
    j = len(lambdas) - 1
    he = 1e-3 * eps0
    ep = np.asarray(eps_k0).copy(); ep[j] += he
    em = np.asarray(eps_k0).copy(); em[j] -= he
    fd_eps = (delta_f_host(ep, sig0) - delta_f_host(em, sig0)) / (2 * he)
    rel = abs(fd_eps - float(g_eps[j])) / abs(fd_eps)
    print(f"finite diff eps_K   = {fd_eps:+.3f}  (rel err {rel:.1e})")
    assert rel < 2e-2, (fd_eps, float(g_eps[j]))

    # -- check 2: the PHYSICAL gradient (frozen origins) ------------------
    # One solve at the SAMPLED parameters pins the origins; endpoints
    # become theta-dependent TARGET states on the pooled samples.  The
    # gradient of this objective is the reweighted TI estimator -- the
    # consistent physical d(Delta f)/d(eps); the estimator's own
    # gradient above is a different object (see module docstring).
    u_kn0 = beta * jax.vmap(
        lambda e: jax.vmap(lambda x: lj_energy(x, e, sig0))(xs))(eps_k0)
    f_k = mbar_solve_implicit(u_kn0, N_k)

    def delta_f_phys(e_K):
        u_l = beta * jax.vmap(
            lambda x: lj_energy(x, e_K, sig0))(xs)[None, :]
        return mbar_perturbed_free_energies_jax(u_kn0, N_k, f_k, u_l)[0]

    g_phys = float(jax.grad(delta_f_phys)(eps_k0[j]))
    # exact identity: == the MBAR-reweighted TI expectation at state K
    log_N = jnp.log(N_k.astype(jnp.float32))
    log_den0 = jax.nn.logsumexp((f_k + log_N)[:, None] - u_kn0, axis=0)
    W_K = jnp.exp(f_k[j] - u_kn0[j] - log_den0)
    dU_all = jax.vmap(lambda x: jax.grad(lj_energy, argnums=1)(
        x, eps_k0[j], jnp.float32(sig0)))(xs)
    reweighted = float(jnp.sum(W_K * beta * dU_all))
    # direct TI sample average over state K's own block (statistical)
    ti = beta * float(dU_all[j * n_cfg:(j + 1) * n_cfg].mean())
    print(f"physical d Delta f/d eps_K = {g_phys:+.3f} == reweighted TI "
          f"{reweighted:+.3f}; direct TI <beta dU/deps>_K = {ti:+.3f} "
          f"(estimator-sensitivity grad, a DIFFERENT object: "
          f"{float(g_eps[j]):+.3f})")
    assert abs(g_phys - reweighted) < 1e-3 * max(abs(reweighted), 1.0)
    assert abs(g_phys - ti) / abs(ti) < 0.15  # statistical agreement

    # -- check 3: unsampled state -- gradient == reweighted expectation --
    lam_new = 0.7

    def f_unsampled(eps_new):
        u_ln = beta * jax.vmap(
            lambda x: lj_energy(x, eps_new, sig0))(xs)[None, :]
        return mbar_perturbed_free_energies_jax(u_kn0, N_k, f_k, u_ln)[0]

    eps_new = jnp.float32(lam_new * eps0)
    g_new = float(jax.grad(f_unsampled)(eps_new))
    # the exact identity: df_l/d eps = sum_n W_ln * beta dU_n/d eps
    u_ln = beta * jax.vmap(lambda x: lj_energy(x, eps_new, sig0))(xs)
    log_N = jnp.log(N_k.astype(jnp.float32))
    log_denom = jax.nn.logsumexp((f_k + log_N)[:, None] - u_kn0, axis=0)
    f_l = -jax.nn.logsumexp(-u_ln - log_denom)
    W_l = jnp.exp(f_l - u_ln - log_denom)
    dU_all = jax.vmap(lambda x: jax.grad(lj_energy, argnums=1)(
        x, eps_new, jnp.float32(sig0)))(xs)
    expected = float(jnp.sum(W_l * beta * dU_all))
    rel = abs(g_new - expected) / max(abs(expected), 1e-9)
    print(f"unsampled lambda={lam_new}: d f/d eps = {g_new:+.3f} == "
          f"reweighted beta <dU/deps> = {expected:+.3f} (rel {rel:.1e})")
    assert rel < 1e-3

    # -- what the gradient is FOR: force-field fitting ---------------------
    # Solve for the target-state epsilon that yields a prescribed Delta f
    # by scalar Newton on the PHYSICAL (frozen-origin) objective -- the
    # consistent one -- valid while the reweighted target keeps overlap
    # with the fixed sample set (the shift is ~1 kT, well inside the
    # ladder's span; a production fit would resample and repeat).
    target = df + 1.0
    val = jax.jit(delta_f_phys)
    grad_fn = jax.jit(jax.grad(delta_f_phys))
    e_cur = eps_k0[j]
    for it in range(8):
        fcur = float(val(e_cur))
        if abs(fcur - target) < 1e-4:
            break
        e_cur = e_cur - (fcur - target) / float(grad_fn(e_cur))
    print(f"fit: eps_K {float(eps_k0[j]):.4f} -> {float(e_cur):.4f} "
          f"reaches Delta f = {float(val(e_cur)):.4f} "
          f"(target {target:.4f}) in {it} Newton steps")
    assert abs(float(val(e_cur)) - target) < 1e-3
    print("differentiable free-energy pipeline: PASS")


if __name__ == "__main__":
    main()
