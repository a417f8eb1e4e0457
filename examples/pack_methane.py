"""Deterministically pack the reference NpT methane workload's start state.

The reference example loads a packmol-packed 1100-particle united-atom
methane configuration in a 4.275 nm cubic box (reference
Examples/LJ_MCMC.py:29-42, min spacing 0.4 nm).  packmol is not available
here, so this script produces an equivalent liquid configuration
deterministically: an 11^3 lattice restricted to 1100 sites, jittered,
then equilibrated for 5000 BAOAB steps at 140 K with the TraPPE-UA
methane potential (plain jnp all-pairs force -- runs on any backend).

Writes ``chiron_tpu/data/methane_1100_box4p275.npy`` (float32, (1100, 3),
nm), which ``examples/lj_mcmc.py`` loads.  Committed output makes the
example reproducible without re-running this script.
"""

import numpy as np

BOX_L = 4.275021399280942   # nm (reference Examples/LJ_MCMC.py:33-40)
N = 1100
SIGMA = 0.373               # nm   (TraPPE-UA methane)
EPSILON = 148.0 * 0.008314462618  # kJ/mol (eps/kB = 148 K)
CUTOFF = 1.4                # nm
MASS = 16.04                # amu
T = 140.0                   # K
KB = 0.008314462618         # kJ/mol/K


def pack(seed: int = 2026) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    side = 11
    g = (np.arange(side) + 0.5) * (BOX_L / side)
    lattice = np.stack(
        np.meshgrid(g, g, g, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    keep = rng.permutation(side ** 3)[:N]
    x0 = lattice[np.sort(keep)] + rng.normal(0.0, 0.01, (N, 3))

    kT = KB * T
    dt = 0.002
    gamma = 1.0
    a = float(np.exp(-gamma * dt))
    b = float(np.sqrt(1.0 - a * a))
    sig_v = float(np.sqrt(kT / MASS))
    L = jnp.float32(BOX_L)

    def force(x):
        d = x[:, None, :] - x[None, :, :]
        d = d - L * jnp.round(d / L)
        r2 = jnp.sum(d * d, axis=-1)
        ids = jnp.arange(N)
        m = (r2 < CUTOFF * CUTOFF) & (ids[:, None] != ids[None, :])
        r2s = jnp.where(m, r2, 1.0)
        s2 = (SIGMA * SIGMA) / r2s
        s6 = s2 * s2 * s2
        coef = jnp.where(m, 24.0 * EPSILON * (2 * s6 * s6 - s6) / r2s, 0.0)
        return jnp.sum(coef[..., None] * d, axis=1)

    def step(carry, _):
        x, v, F, key = carry
        key, sub = jax.random.split(key)
        v = v + (0.5 * dt) * F / MASS
        x = x + (0.5 * dt) * v
        v = a * v + b * sig_v * jax.random.normal(sub, x.shape)
        x = x + (0.5 * dt) * v
        x = x - L * jnp.floor(x / L)
        F = force(x)
        v = v + (0.5 * dt) * F / MASS
        return (x, v, F, key), None

    x = jnp.asarray(x0, jnp.float32)
    v = jnp.zeros_like(x)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(carry):
        return jax.lax.scan(step, carry, length=5000)[0]

    carry = (x, v, force(x), key)
    carry = run(carry)
    xf = np.asarray(carry[0])
    # sanity: liquid-like, no deep overlaps, inside the box
    d = xf[:, None, :] - xf[None, :, :]
    d = d - BOX_L * np.round(d / BOX_L)
    r = np.sqrt((d ** 2).sum(-1) + np.eye(N) * 1e3)
    assert r.min() > 0.3, r.min()
    assert xf.min() >= 0.0 and xf.max() <= BOX_L
    return xf


if __name__ == "__main__":
    import os

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "chiron_tpu", "data", "methane_1100_box4p275.npy",
    )
    xf = pack()
    np.save(out, xf.astype(np.float32))
    print(f"wrote {out}  min image dist OK, shape {xf.shape}")
