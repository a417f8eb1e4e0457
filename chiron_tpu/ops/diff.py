"""Shared builder for the ``grad(energy) == -force`` custom-VJP surface.

Every engine exposes a differentiable total energy whose ``jax.grad`` is
exactly the negative of its fused kernel's analytic force (the CLAUDE.md
invariant; reference grad-force contract chiron/potential.py:21-24).
The scheme is identical everywhere -- one fused force+energy pass, with
the force replayed as the VJP -- so it lives in one place instead of a
divergence-prone copy per engine (review finding, round 4).

The custom-VJP wrapper is rebuilt per evaluation; that is deliberate:
the engines close over per-call data (box vectors, live pair lists)
whose pytree structure would otherwise need zero-cotangent plumbing,
and the rebuild is a thin retrace around kernels that are jitted
separately.  Callers embedding the surface in a compiled loop jit the
enclosing function, which traces this wrapper exactly once.
"""

from __future__ import annotations

import jax


def energy_with_force_gradient(force_energy_fn, positions):
    """Evaluate a differentiable energy at ``positions``.

    ``force_energy_fn(p) -> (force, energy)`` is one fused pass (exact
    reciprocal); the returned value is ``energy`` and its gradient under
    ``jax.grad`` is exactly ``-force``.
    """

    @jax.custom_vjp
    def energy_fn(p):
        return force_energy_fn(p)[1]

    def fwd(p):
        force, energy = force_energy_fn(p)
        return energy, force

    def bwd(force, g):
        return (-g * force,)

    energy_fn.defvjp(fwd, bwd)
    return energy_fn(positions)
