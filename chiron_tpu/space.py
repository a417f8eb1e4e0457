"""Simulation spaces: displacement + periodic wrapping as pure functions.

TPU-native counterpart of reference chiron/neighbors.py:15-175 (`Space`,
`OrthogonalPeriodicSpace`, `OrthogonalNonPeriodicSpace`).

Design: the space classes are *stateless singletons* whose methods are pure
jittable functions of ``(xyz, box_vectors)``.  They carry no arrays, so they
can ride through ``jax.jit``/``lax.scan`` as static pytree metadata without
the static-``self`` footguns the reference documents at neighbors.py:504-511.
Minimum-image displacement uses the same mod-based formulation as the
reference (neighbors.py:79) which is branch-free and vectorizes on the VPU.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional, Tuple

import jax.numpy as jnp


class Space(ABC):
    """How to measure displacements and wrap coordinates under the BCs.

    Both operations are pure functions; box vectors are always passed as data
    (never baked in as compile-time constants) so that barostat moves that
    rescale the box do not trigger recompilation (SURVEY.md section 7).
    """

    @abstractmethod
    def displacement(
        self, xyz_1: jnp.ndarray, xyz_2: jnp.ndarray, box_vectors: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Return (r_ij, dist): displacement vectors and their norms."""

    @abstractmethod
    def wrap(self, xyz: jnp.ndarray, box_vectors: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Apply the boundary conditions to coordinates."""

    # Stateless singletons: all instances are interchangeable, which makes
    # them valid static jit arguments and pytree aux data.
    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))


class OrthogonalPeriodicSpace(Space):
    """Orthogonal periodic box (reference chiron/neighbors.py:39-113)."""

    def displacement(self, xyz_1, xyz_2, box_vectors):
        if box_vectors is None:
            raise ValueError("box_vectors must be provided for a periodic system")
        r_ij = xyz_1 - xyz_2
        box_lengths = jnp.diagonal(box_vectors, axis1=-2, axis2=-1)
        # Minimum-image via mod: branch-free, fuses into the distance kernel.
        r_ij = jnp.mod(r_ij + box_lengths * 0.5, box_lengths) - box_lengths * 0.5
        dist = jnp.linalg.norm(r_ij, axis=-1)
        return r_ij, dist

    def wrap(self, xyz, box_vectors):
        if box_vectors is None:
            raise ValueError("box_vectors must be provided for a periodic system")
        box_lengths = jnp.diagonal(box_vectors, axis1=-2, axis2=-1)
        return xyz - jnp.floor(xyz / box_lengths) * box_lengths


class OrthogonalNonPeriodicSpace(Space):
    """Open (non-periodic) space (reference chiron/neighbors.py:115-175)."""

    def displacement(self, xyz_1, xyz_2, box_vectors=None):
        r_ij = xyz_1 - xyz_2
        dist = jnp.linalg.norm(r_ij, axis=-1)
        return r_ij, dist

    def wrap(self, xyz, box_vectors=None):
        return xyz
