"""Differentiable MD: gradients THROUGH a Langevin trajectory.

The reference's tagline is "differentiable Markov Chain Monte Carlo"
(reference README.md:8), but it never differentiates through sampling --
its per-step Python loop breaks the chain.  Here the whole BAOAB
trajectory is one `lax.scan` of pure functions with potential parameters
as traced data (the same parameters-as-data machinery the open
potential registry uses, chiron_tpu/potential.py), so
``jax.grad(loss)(params)`` flows end-to-end through every step:

    d <U_final> / d epsilon   via reverse-mode AD over a 200-step chain

and is validated against a central finite difference.  This is the
capability the TPU-native design buys: reparameterized (fixed-noise)
trajectories are exactly differentiable, enabling force-field fitting
through simulation.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu import units
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.utils import PRNG


def make_traj_energy(n, box_diag, kT, masses, dt=0.002, gamma=1.0,
                     n_steps=200, cutoff=1.02):
    """Returns loss(eps, sigma, x0, key) = potential energy after an
    n_steps BAOAB chain, differentiable in (eps, sigma)."""
    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt))
    m = masses[:, None]
    sigv = jnp.sqrt(kT / m)

    def energy(eps, sigma, x):
        ids = jnp.arange(n)
        d = x[:, None, :] - x[None, :, :]
        d = d - box_diag * jnp.round(d / box_diag)
        r2 = jnp.sum(d * d, axis=-1)
        mask = (r2 < cutoff * cutoff) & (ids[:, None] < ids[None, :])
        r2s = jnp.where(mask, r2, 1.0)
        s2 = (sigma * sigma) / r2s
        s6 = s2 * s2 * s2
        return jnp.sum(jnp.where(mask, 4.0 * eps * (s6 * s6 - s6), 0.0))

    def loss(eps, sigma, x0, key):
        force = jax.grad(lambda x: -energy(eps, sigma, x))

        def step(carry, noise):
            x, v, F = carry
            v = v + 0.5 * dt * F / m
            x = x + 0.5 * dt * v
            v = a * v + b * sigv * noise
            x = x + 0.5 * dt * v
            x = x - box_diag * jnp.floor(x / box_diag)
            F = force(x)
            v = v + 0.5 * dt * F / m
            return (x, v, F), None

        noises = jax.random.normal(key, (n_steps, n, 3))
        v0 = sigv * jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
        (x, _, _), _ = jax.lax.scan(step, (x0, v0, force(x0)), noises)
        return energy(eps, sigma, x)

    return loss


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    n = 125
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.5)
    box_diag = jnp.diagonal(jnp.asarray(
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        jnp.float32))
    x0 = jnp.asarray(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        jnp.float32)
    kT = units.kB_MD * 120.0
    masses = jnp.full((n,), 39.9, jnp.float32)
    PRNG.set_seed(1234)
    key = PRNG.get_random_key()

    loss = make_traj_energy(n, box_diag, kT, masses)
    eps0, sig0 = jnp.float32(0.99579), jnp.float32(0.34)

    t0 = time.time()
    g_eps, g_sig = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        eps0, sig0, x0, key)
    g_eps, g_sig = float(g_eps), float(g_sig)
    print(f"reverse-mode through 200 BAOAB steps in {time.time()-t0:.1f}s")
    print(f"dU_final/d_eps  = {g_eps:+.3f}")
    print(f"dU_final/d_sigma= {g_sig:+.1f}")

    # central finite difference on epsilon
    h = 1e-3
    f = jax.jit(loss)
    fd = (float(f(eps0 + h, sig0, x0, key))
          - float(f(eps0 - h, sig0, x0, key))) / (2 * h)
    print(f"finite diff     = {fd:+.3f}  "
          f"(rel err {abs(fd - g_eps) / max(abs(fd), 1e-9):.2e})")
    assert abs(fd - g_eps) / max(abs(fd), 1e-9) < 0.05


if __name__ == "__main__":
    main()
