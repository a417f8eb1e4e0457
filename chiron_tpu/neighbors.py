"""Interaction discovery: all-pairs list and Verlet neighbor list.

TPU-native counterpart of reference chiron/neighbors.py:178-1289
(`PairsBase`, `NeighborListNsqrd`, `PairListNsqrd`).

Design differences from the reference (deliberate, TPU-first):

* The list state is a frozen **pytree dataclass** (`NeighborListState` /
  `PairListState`) instead of mutable attributes on a static-``self`` object,
  so whole simulation steps -- including the rebuild decision -- can live
  inside one ``jax.jit``/``lax.scan`` program.  The reference instead jits
  methods with ``static_argnums=(0,)`` and documents the resulting footguns
  (reference neighbors.py:504-511).
* ``check`` has a pure on-device variant (`check_fn`) returning a scalar
  bool array, so the integrator can gate the rebuild with ``lax.cond``
  rather than a device->host sync every step (the reference syncs per step,
  reference neighbors.py:872-907 / integrators.py:190-191).
* Buffers are fixed-shape and padded to ``n_max_neighbors``; a ``True``
  ``overflow`` flag signals that capacity was exceeded (instead of silently
  truncating).  The host-side ``build`` wrapper reproduces the reference's
  grow-by-10 retry loop (reference neighbors.py:709-727).

Half-list semantics match the reference exactly: no self pairs, no double
counting (pair (i,j) appears only in the smaller index's row), and padding
uses the first neighbor's id as fill value (reference neighbors.py:606-620).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from . import units

# Spaces are re-exported here for parity with the reference, where they live
# in chiron/neighbors.py:15-175.
from .space import OrthogonalNonPeriodicSpace, OrthogonalPeriodicSpace, Space


# ---------------------------------------------------------------------------
# State pytrees
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["neighbor_list", "neighbor_mask", "n_neighbors", "ref_positions",
                 "box_vectors", "overflow"],
    meta_fields=[],
)
@dataclass(frozen=True)
class NeighborListState:
    """Device-resident Verlet-list state (all fields are arrays).

    neighbor_list : (N, K) int32 -- padded neighbor ids (half list).
    neighbor_mask : (N, K) int32 -- 1 for real neighbors, 0 for padding.
    n_neighbors   : (N,)   int32 -- true neighbor counts (may exceed K!).
    ref_positions : (N, 3) -- positions at build time (skin reference).
    box_vectors   : (3, 3) or None -- box at build time.
    overflow      : ()     bool  -- True if any row needed more than K slots.
    """

    neighbor_list: jnp.ndarray
    neighbor_mask: jnp.ndarray
    n_neighbors: jnp.ndarray
    ref_positions: jnp.ndarray
    box_vectors: Optional[jnp.ndarray]
    overflow: jnp.ndarray


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["box_vectors"],
    meta_fields=[],
)
@dataclass(frozen=True)
class DensePairsState:
    """State of the dense (list-free) scheme: just the box.

    The fused Pallas kernel recomputes all pairs every evaluation, so the
    only dynamic datum is the box -- which makes barostat moves trivially
    compatible (no rebuilds ever).
    """

    box_vectors: jnp.ndarray


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["all_pairs", "reduction_mask", "box_vectors"],
    meta_fields=[],
)
@dataclass(frozen=True)
class PairListState:
    """All-pairs list state.

    all_pairs      : (N, N-1) int32 -- row i lists every j != i.
    reduction_mask : (N, N-1) bool  -- True where i < j (no double counting).
    box_vectors    : (3, 3) or None.
    """

    all_pairs: jnp.ndarray
    reduction_mask: jnp.ndarray
    box_vectors: Optional[jnp.ndarray]


# ---------------------------------------------------------------------------
# Pure kernels (module-level so `space` and sizes are the only static args)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("space", "n_max_neighbors"))
def neighbor_build_fn(
    positions: jnp.ndarray,
    box_vectors: Optional[jnp.ndarray],
    cutoff_and_skin: jnp.ndarray,
    space: Space,
    n_max_neighbors: int,
) -> NeighborListState:
    """Build a half neighbor list with fixed capacity ``n_max_neighbors``.

    O(N^2) masked distance computation (reference neighbors.py:548-626), fully
    on device.  The N x N stage is expressed as one broadcast displacement so
    XLA tiles it across the VPU; the padded row extraction reuses the
    reference's `jnp.where(size=K, fill_value=first_neighbor)` semantics.
    """
    n = positions.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    # (N, N) displacement/distance under the boundary conditions.
    r_ij, dist = space.displacement(
        positions[:, None, :], positions[None, :, :], box_vectors
    )
    half = ids[:, None] < ids[None, :]
    neighbor_mask = (dist < cutoff_and_skin) & half

    n_neighbors = neighbor_mask.sum(axis=1).astype(jnp.int32)

    # Fill value: the first True column per row (0 if the row is empty); if it
    # equals the row id, bump by one to avoid a self interaction
    # (reference neighbors.py:606-609).
    fill = jnp.argmax(neighbor_mask, axis=1).astype(jnp.int32)
    fill = jnp.where(fill == ids, fill + 1, fill)

    def row_where(mask_row, fill_value):
        (idx,) = jnp.where(mask_row, size=n_max_neighbors, fill_value=fill_value)
        return idx.astype(jnp.int32)

    neighbor_list = jax.vmap(row_where)(neighbor_mask, fill)
    padding = (
        jnp.arange(n_max_neighbors, dtype=jnp.int32)[None, :] < n_neighbors[:, None]
    ).astype(jnp.int32)
    overflow = jnp.any(n_neighbors > n_max_neighbors)

    return NeighborListState(
        neighbor_list=neighbor_list,
        neighbor_mask=padding,
        n_neighbors=n_neighbors,
        ref_positions=positions,
        box_vectors=box_vectors,
        overflow=overflow,
    )


@partial(jax.jit, static_argnames=("space",))
def neighbor_calculate_fn(
    state: NeighborListState,
    positions: jnp.ndarray,
    cutoff: jnp.ndarray,
    space: Space,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distances/vectors for the listed neighbors at the current positions.

    Counterpart of reference neighbors.py:731-826 (vmap of
    `_calc_distance_per_particle`), as one gather + broadcast displacement.
    Returns (n_pairs, mask, dist, r_ij) with shapes (N,), (N,K), (N,K), (N,K,3).
    """
    neighbor_pos = positions[state.neighbor_list]  # (N, K, 3) gather
    r_ij, dist = space.displacement(
        positions[:, None, :], neighbor_pos, state.box_vectors
    )
    mask = jnp.where((dist < cutoff) & (state.neighbor_mask != 0), 1, 0)
    n_pairs = mask.sum(axis=1)
    return n_pairs, mask, dist, r_ij


@partial(jax.jit, static_argnames=("space",))
def neighbor_check_fn(
    state: NeighborListState,
    positions: jnp.ndarray,
    skin: jnp.ndarray,
    space: Space,
) -> jnp.ndarray:
    """On-device rebuild predicate: any particle moved >= skin/2 since build.

    Counterpart of reference neighbors.py:828-907, but returns a scalar bool
    *array* so it can feed ``lax.cond`` with no host sync.
    """
    _, disp = space.displacement(positions, state.ref_positions, state.box_vectors)
    return jnp.any(disp >= skin * 0.5)


@jax.jit
def pairlist_build_fn(
    positions: jnp.ndarray, box_vectors: Optional[jnp.ndarray]
) -> PairListState:
    """Build the static all-pairs structure (reference neighbors.py:1018-1104)."""
    n = positions.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    not_self = ids[:, None] != ids[None, :]

    def row_where(mask_row):
        (idx,) = jnp.where(mask_row, size=n - 1, fill_value=n - 1)
        return idx.astype(jnp.int32)

    all_pairs = jax.vmap(row_where)(not_self)
    reduction_mask = ids[:, None] < all_pairs
    return PairListState(
        all_pairs=all_pairs, reduction_mask=reduction_mask, box_vectors=box_vectors
    )


@partial(jax.jit, static_argnames=("space", "use_cutoff"))
def pairlist_calculate_fn(
    state: PairListState,
    positions: jnp.ndarray,
    cutoff: jnp.ndarray,
    space: Space,
    use_cutoff: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-pairs distances (reference neighbors.py:1106-1270)."""
    neighbor_pos = positions[state.all_pairs]  # (N, N-1, 3)
    r_ij, dist = space.displacement(
        positions[:, None, :], neighbor_pos, state.box_vectors
    )
    if use_cutoff:
        mask = jnp.where((dist < cutoff) & state.reduction_mask, 1, 0)
    else:
        mask = jnp.where(state.reduction_mask, 1, 0)
    n_pairs = mask.sum(axis=1)
    return n_pairs, mask, dist, r_ij


# ---------------------------------------------------------------------------
# Host-facing classes (reference-compatible API shells)
# ---------------------------------------------------------------------------


def _positions_to_md(positions) -> jnp.ndarray:
    positions = units.coerce(positions)
    if isinstance(positions, units.Quantity):
        if not positions.unit.is_compatible(units.nanometer):
            raise ValueError(
                f"Positions require distance units, not {positions.unit}"
            )
        positions = positions.value_in_unit_system(units.md_unit_system)
    positions = jnp.asarray(positions)
    if positions.ndim != 2 or positions.shape[1] != 3:
        raise ValueError(
            f"positions should be a Nx3 array, shape provided: {positions.shape}"
        )
    return positions


def _box_to_md(box_vectors) -> Optional[jnp.ndarray]:
    if box_vectors is None:
        return None
    box_vectors = units.coerce(box_vectors)
    if isinstance(box_vectors, units.Quantity):
        if not box_vectors.unit.is_compatible(units.nanometer):
            raise ValueError(
                f"Box vectors require distance unit, not {box_vectors.unit}"
            )
        box_vectors = box_vectors.value_in_unit_system(units.md_unit_system)
    box_vectors = jnp.asarray(box_vectors)
    if box_vectors.shape != (3, 3):
        raise ValueError(
            f"box_vectors should be a 3x3 array, shape provided: {box_vectors.shape}"
        )
    return box_vectors


def _distance_quantity(value, name: str, optional: bool = False):
    """Coerce + validate a construction-boundary distance quantity.

    Mirrors the reference's validation (reference neighbors.py:178-375)
    but raises a clean TypeError for unitless input instead of tripping
    an AttributeError on ``.unit``; openmm-style quantities are accepted
    via :func:`units.coerce`.
    """
    if value is None:
        if optional:
            return None
        raise TypeError(
            f"{name} must be a unit.Quantity with units of distance, got None"
        )
    value = units.coerce(value)
    if not isinstance(value, units.Quantity):
        raise TypeError(
            f"{name} must be a unit.Quantity with units of distance, "
            f"got {type(value)} instead."
        )
    if not value.unit.is_compatible(units.nanometer):
        raise ValueError(
            f"{name} must be a unit.Quantity with units of distance, "
            f"{name}.unit = {value.unit}"
        )
    return value


class PairsBase:
    """Shared API of pair-discovery schemes (reference neighbors.py:178-375)."""

    def __init__(self, space: Space, cutoff=units.Quantity(1.2, units.nanometer)):
        if not isinstance(space, Space):
            raise TypeError(f"space must be of type Space, found {type(space)}")
        self.space = space
        self.cutoff = cutoff  # validated by the (possibly overridden) setter
        self.is_built = False

    # -- unit-validated setter: the ONE validation point for cutoff.
    # Subclasses override to tighten the policy (e.g. non-optional).
    @property
    def cutoff(self):
        return self._cutoff

    @cutoff.setter
    def cutoff(self, cutoff):
        self._cutoff = _distance_quantity(cutoff, "cutoff", optional=True)

    def build_from_state(self, sampler_state):
        """Build from a SamplerState (reference neighbors.py:310-331)."""
        from .states import SamplerState

        if not isinstance(sampler_state, SamplerState):
            raise TypeError(
                f"Expected SamplerState, got {type(sampler_state)} instead"
            )
        self.build(sampler_state.positions, sampler_state.box_vectors)

    def build(self, positions, box_vectors):  # pragma: no cover - abstract
        raise NotImplementedError

    def calculate(self, positions):  # pragma: no cover - abstract
        raise NotImplementedError

    def check(self, positions) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError


class NeighborListNsqrd(PairsBase):
    """Verlet neighbor list with skin buffer (reference neighbors.py:378-907).

    The class is a thin host shell: all math lives in the pure
    ``neighbor_*_fn`` kernels above, which the on-device integrator calls
    directly with the :class:`NeighborListState` pytree.
    """

    def __init__(
        self,
        space: Space,
        cutoff=units.Quantity(1.2, units.nanometer),
        skin=units.Quantity(0.4, units.nanometer),
        n_max_neighbors: int = 200,
    ):
        super().__init__(space, cutoff)
        self.skin = skin  # validated by the setter
        self.n_max_neighbors = int(n_max_neighbors)
        self._state: Optional[NeighborListState] = None

    # -- unit-validated setters (reference neighbors.py:470-502) -----------
    @property
    def cutoff(self):
        return self._cutoff

    @cutoff.setter
    def cutoff(self, cutoff):
        self._cutoff = _distance_quantity(cutoff, "cutoff")
        self.is_built = False

    @property
    def skin(self):
        return self._skin

    @skin.setter
    def skin(self, skin):
        self._skin = _distance_quantity(skin, "skin")
        self.is_built = False

    # -- MD-unit scalars ----------------------------------------------------
    @property
    def cutoff_md(self) -> float:
        return float(self.cutoff.value_in_unit_system(units.md_unit_system))

    @property
    def skin_md(self) -> float:
        return float(self.skin.value_in_unit_system(units.md_unit_system))

    @property
    def state(self) -> NeighborListState:
        if self._state is None:
            raise ValueError("Neighborlist must be built before use")
        return self._state

    # -- reference-parity attributes (reference neighbors.py:694-706) --------
    @property
    def neighbor_list(self) -> jnp.ndarray:
        return self.state.neighbor_list

    @property
    def neighbor_mask(self) -> jnp.ndarray:
        return self.state.neighbor_mask

    @property
    def n_neighbors(self) -> jnp.ndarray:
        return self.state.n_neighbors

    # -- reference-compatible API -------------------------------------------
    def build(self, positions, box_vectors) -> None:
        """Build, growing capacity by the reference's +10 rule on overflow
        (reference neighbors.py:709-727)."""
        positions = _positions_to_md(positions)
        box_vectors = _box_to_md(box_vectors)
        cutoff_and_skin = self.cutoff_md + self.skin_md

        state = neighbor_build_fn(
            positions, box_vectors, cutoff_and_skin, self.space, self.n_max_neighbors
        )
        # Reference semantics: any row hitting capacity triggers a regrow to
        # (max observed) + 10.  One extra build suffices since n_neighbors is
        # exact regardless of capacity.
        if bool(jnp.any(state.n_neighbors >= self.n_max_neighbors)):
            self.n_max_neighbors = int(state.n_neighbors.max()) + 10
            state = neighbor_build_fn(
                positions, box_vectors, cutoff_and_skin, self.space,
                self.n_max_neighbors,
            )
        self._state = state
        self.ref_positions = positions
        self.box_vectors = box_vectors
        self.is_built = True

    def calculate(self, positions: jnp.ndarray):
        """(n_neighbors, neighbor_list, padding_mask, dist, r_ij) -- reference
        neighbors.py:789-826."""
        state = self.state
        n_pairs, mask, dist, r_ij = neighbor_calculate_fn(
            state, jnp.asarray(positions), self.cutoff_md, self.space
        )
        return n_pairs, state.neighbor_list, mask, dist, r_ij

    def check(self, positions: jnp.ndarray) -> bool:
        """Host-facing rebuild predicate (reference neighbors.py:872-907)."""
        if self._state is None:
            return True
        if self._state.ref_positions.shape[0] != positions.shape[0]:
            return True
        return bool(
            neighbor_check_fn(
                self._state, jnp.asarray(positions), self.skin_md, self.space
            )
        )


class DensePairs(PairsBase):
    """List-free dense pair scheme backed by the fused Pallas kernel.

    The TPU-first alternative to both list classes for periodic LJ systems:
    no neighbor tables, no rebuild predicate, no capacity tuning -- the
    kernel recomputes all pairs each evaluation, which is faster than any
    indexed structure below N ~ 20k on this hardware (BENCH.md).  Drop it in
    wherever a `NeighborListNsqrd`/`PairListNsqrd` is accepted:

    >>> pairs = DensePairs(OrthogonalPeriodicSpace())
    >>> pairs.build_from_state(sampler_state)
    >>> integrator.run(..., nbr_list=pairs)         # or MC moves
    """

    def __init__(self, space: Space,
                 cutoff=units.Quantity(1.2, units.nanometer)):
        if not isinstance(space, OrthogonalPeriodicSpace):
            raise TypeError(
                "DensePairs requires an OrthogonalPeriodicSpace (the fused "
                "kernel applies minimum-image PBC)"
            )
        super().__init__(space, cutoff)
        self._state: Optional[DensePairsState] = None

    @property
    def cutoff(self):
        return self._cutoff

    @cutoff.setter
    def cutoff(self, cutoff):
        self._cutoff = _distance_quantity(cutoff, "cutoff")

    @property
    def cutoff_md(self) -> float:
        return float(self.cutoff.value_in_unit_system(units.md_unit_system))

    @property
    def state(self) -> DensePairsState:
        if self._state is None:
            raise ValueError("DensePairs must be built before use")
        return self._state

    def build(self, positions, box_vectors) -> None:
        positions = _positions_to_md(positions)
        if box_vectors is None:
            raise ValueError("DensePairs requires box vectors")
        box_vectors = _box_to_md(box_vectors)
        self.n_particles = positions.shape[0]
        self.ref_positions = positions
        self.box_vectors = box_vectors
        self._state = DensePairsState(box_vectors=box_vectors)
        self.is_built = True

    def calculate(self, positions: jnp.ndarray):
        """Dense distances via the jnp oracle path (API parity; the hot
        paths use the potential's fused kernel instead).

        NOTE: materializes the full N x N pair matrix -- O(N^2) memory.
        Fine for parity tests and small systems; at large N use
        NeighborListNsqrd (bounded per-particle capacity) or the fused
        kernels, which never materialize pair arrays.
        """
        positions = jnp.asarray(positions)
        if positions.shape[0] > 20_000:
            raise ValueError(
                f"DensePairs.calculate materializes an N x N pair matrix; "
                f"N={positions.shape[0]} would need "
                f"{positions.shape[0] ** 2 * 16 / 1e9:.1f}+ GB. Use "
                "NeighborListNsqrd or the fused kernel paths at this size."
            )
        if positions.shape[0] != self.n_particles:
            raise ValueError(
                f"Number of particles cannot changes without rebuilding. "
                f"Positions must have shape ({self.n_particles}, 3), "
                f"found {positions.shape}"
            )
        n = positions.shape[0]
        ids = jnp.arange(n, dtype=jnp.int32)
        r_ij, dist = self.space.displacement(
            positions[:, None, :], positions[None, :, :],
            self.state.box_vectors,
        )
        mask = (ids[:, None] < ids[None, :]) & (dist < self.cutoff_md)
        pairs = jnp.broadcast_to(ids[None, :], (n, n))
        n_pairs = mask.sum(axis=1)
        return n_pairs, pairs, mask.astype(jnp.int32), dist, r_ij

    def check(self, positions: jnp.ndarray) -> bool:
        """Never needs rebuilding (box updates flow through the state)."""
        return positions.shape[0] != getattr(self, "n_particles", -1)


class PairListNsqrd(PairsBase):
    """All-pairs list, optional cutoff (reference neighbors.py:910-1289)."""

    def __init__(self, space: Space, cutoff: Optional[units.Quantity] = None):
        if not isinstance(space, Space):
            raise TypeError(f"space must be of type Space, found {type(space)}")
        # PairsBase validates; cutoff=None means no cutoff at calculate time
        # (reference neighbors.py:987-1007).
        super().__init__(space, cutoff)
        self._state: Optional[PairListState] = None

    # cutoff property inherited from PairsBase (optional=True policy)

    @property
    def cutoff_md(self) -> Optional[float]:
        if self.cutoff is None:
            return None
        return float(self.cutoff.value_in_unit_system(units.md_unit_system))

    @property
    def state(self) -> PairListState:
        if self._state is None:
            raise ValueError("Pair list must be built before use")
        return self._state

    # -- reference-parity attributes (reference neighbors.py:1099-1102) ------
    @property
    def all_pairs(self) -> jnp.ndarray:
        return self.state.all_pairs

    @property
    def reduction_mask(self) -> jnp.ndarray:
        return self.state.reduction_mask

    def build(self, positions, box_vectors) -> None:
        positions = _positions_to_md(positions)
        box_vectors = _box_to_md(box_vectors)
        self.n_particles = positions.shape[0]
        self.ref_positions = positions
        self.box_vectors = box_vectors
        self._state = pairlist_build_fn(positions, box_vectors)
        self.is_built = True

    def calculate(self, positions: jnp.ndarray):
        positions = jnp.asarray(positions)
        if positions.shape[0] != self.n_particles:
            raise ValueError(
                f"Number of particles cannot changes without rebuilding. "
                f"Positions must have shape ({self.n_particles}, 3), "
                f"found {positions.shape}"
            )
        state = self.state
        use_cutoff = self.cutoff is not None
        cutoff = self.cutoff_md if use_cutoff else jnp.inf
        n_pairs, mask, dist, r_ij = pairlist_calculate_fn(
            state, positions, cutoff, self.space, use_cutoff
        )
        return n_pairs, state.all_pairs, mask, dist, r_ij

    def check(self, positions: jnp.ndarray) -> bool:
        """Rebuild only when N changes (reference neighbors.py:1272-1289)."""
        return positions.shape[0] != getattr(self, "n_particles", -1)
