"""Semantic oracles: the plain-jnp reference implementations every Pallas
kernel is validated against (CLAUDE.md design invariant: "the jnp/vmap
implementations are the semantic oracles for all Pallas kernels").

One importable definition so the kernel tests, the graft driver's
multi-chip dryrun, and any future consumer assert against the SAME
physics -- cutoff strictness (r^2 < cutoff^2), minimum image via
round(), self-exclusion -- and a convention change can never drift
between copies.
"""

import jax.numpy as jnp


def lj_dense_oracle(pos, box, sigma, epsilon, cutoff):
    """Masked dense LJ force + energy with minimum image.

    ``pos`` is (N, 3), ``box`` a (3, 3) orthogonal box (diagonal used).
    Returns (force (N, 3), total energy scalar), both f32 jnp.
    Truncated, unshifted LJ -- the same convention as the reference's
    pair sum (reference chiron/potential.py:215-279) and every fused
    kernel in ops/.
    """
    ids = jnp.arange(pos.shape[0])
    Lv = jnp.diagonal(box)
    d = pos[:, None, :] - pos[None, :, :]
    d = d - Lv * jnp.round(d / Lv)
    r2 = jnp.sum(d * d, -1)
    m = (r2 < cutoff * cutoff) & (ids[:, None] != ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    inv2 = (sigma * sigma) / r2s
    inv6 = inv2 * inv2 * inv2
    coef = jnp.where(m, 24 * epsilon * (2 * inv6 * inv6 - inv6) / r2s, 0.0)
    F = jnp.sum(coef[..., None] * d, axis=1)
    E = 0.5 * jnp.sum(jnp.where(m, 4 * epsilon * (inv6 * inv6 - inv6), 0.0))
    return F, E
