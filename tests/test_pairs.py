"""Pair/neighbor-list tests: exact structural assertions.

Mirrors reference chiron/tests/test_pairs.py (spaces, 2-particle and
8-particle mesh cases, input validation, pairlist/neighborlist consistency).
"""

import jax.numpy as jnp
import pytest

from chiron_tpu import units as u
from chiron_tpu.neighbors import (
    NeighborListNsqrd,
    OrthogonalNonPeriodicSpace,
    OrthogonalPeriodicSpace,
    PairListNsqrd,
)
from chiron_tpu.states import SamplerState
from chiron_tpu.utils import PRNG


BOX = jnp.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])


def test_orthogonal_periodic_displacement():
    space = OrthogonalPeriodicSpace()
    p1 = jnp.array([[0.0, 0, 0], [0, 0, 0]])
    p2 = jnp.array([[1.0, 0, 0], [6, 0, 0]])
    r_ij, distance = space.displacement(p1, p2, BOX)
    assert jnp.all(r_ij == jnp.array([[-1.0, 0.0, 0.0], [4.0, 0.0, 0.0]]))
    assert jnp.all(distance == jnp.array([1.0, 4.0]))

    assert jnp.all(space.wrap(jnp.array([11.0, 0, 0]), BOX) == jnp.array([1.0, 0, 0]))
    assert jnp.all(space.wrap(jnp.array([-1.0, 0, 0]), BOX) == jnp.array([9.0, 0, 0]))
    assert jnp.all(space.wrap(jnp.array([5.0, 0, 0]), BOX) == jnp.array([5.0, 0, 0]))
    assert jnp.all(
        space.wrap(jnp.array([5.0, 12, -1]), BOX) == jnp.array([5.0, 2, 9])
    )
    with pytest.raises(ValueError):
        space.displacement(p1, p2, None)


def test_orthogonal_nonperiodic_displacement():
    space = OrthogonalNonPeriodicSpace()
    p1 = jnp.array([[0.0, 0, 0], [0, 0, 0]])
    p2 = jnp.array([[1.0, 0, 0], [6, 0, 0]])
    r_ij, distance = space.displacement(p1, p2, BOX)
    assert jnp.all(r_ij == jnp.array([[-1.0, 0.0, 0.0], [-6.0, 0.0, 0.0]]))
    assert jnp.all(distance == jnp.array([1.0, 6.0]))
    assert jnp.all(
        space.wrap(jnp.array([11.0, -1, 2]), BOX) == jnp.array([11.0, -1, 2])
    )


def _two_particle_state():
    PRNG.set_seed(1234)
    coordinates = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    return coordinates, SamplerState(
        positions=u.Quantity(coordinates, u.nanometer),
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=u.Quantity(BOX, u.nanometer),
    )


def test_neighborlist_pair():
    coordinates, state = _two_particle_state()
    cutoff, skin = 1.1 * u.nanometer, 0.1 * u.nanometer
    nbr_list = NeighborListNsqrd(
        OrthogonalPeriodicSpace(), cutoff=cutoff, skin=skin, n_max_neighbors=5
    )
    assert nbr_list.cutoff == cutoff
    assert nbr_list.skin == skin
    assert nbr_list.n_max_neighbors == 5

    nbr_list.build_from_state(state)
    assert jnp.all(nbr_list.ref_positions == coordinates)
    assert jnp.all(nbr_list.box_vectors == BOX)
    assert nbr_list.is_built

    # Padded rows reuse the first neighbor id (reference neighbors.py:606-620).
    assert jnp.all(
        nbr_list.neighbor_list == jnp.array([[1, 1, 1, 1, 1], [0, 0, 0, 0, 0]])
    )
    assert jnp.all(nbr_list.n_neighbors == jnp.array([1, 0]))
    assert jnp.all(
        nbr_list.neighbor_mask == jnp.array([[1, 0, 0, 0, 0], [0, 0, 0, 0, 0]])
    )

    n_neighbors, neighbor_list, padding_mask, dist, r_ij = nbr_list.calculate(
        coordinates
    )
    assert jnp.all(n_neighbors == jnp.array([1, 0]))
    assert neighbor_list.shape == (2, 5)
    assert jnp.all(padding_mask == jnp.array([[1, 0, 0, 0, 0], [0, 0, 0, 0, 0]]))
    assert jnp.all(dist == jnp.ones((2, 5)))
    assert jnp.all(r_ij[0] == jnp.array([-1.0, 0.0, 0.0]))
    assert jnp.all(r_ij[1] == jnp.array([1.0, 0.0, 0.0]))

    assert nbr_list.check(coordinates) is False
    assert nbr_list.check(coordinates + 0.1) is True
    assert nbr_list.check(jnp.zeros((3, 3))) is True  # N changed


def test_neighborlist_inputs():
    space = OrthogonalPeriodicSpace()
    cutoff, skin = 2.1 * u.nanometer, 0.1 * u.nanometer
    nbr_list = NeighborListNsqrd(space, cutoff=cutoff, skin=skin, n_max_neighbors=5)

    with pytest.raises(TypeError):
        nbr_list.build_from_state(123)

    coordinates = jnp.array([[1.0, 2, 3], [0.0, 0, 0]])
    with pytest.raises(ValueError):
        # periodic space requires box vectors
        nbr_list.build(coordinates, None)

    bad_box = jnp.zeros((4, 3))
    with pytest.raises(ValueError):
        nbr_list.build(coordinates, bad_box)
    with pytest.raises(ValueError):
        nbr_list.build(u.Quantity(coordinates, u.picosecond), BOX)
    with pytest.raises(ValueError):
        nbr_list.build(
            u.Quantity(coordinates, u.nanometer), u.Quantity(BOX, u.picosecond)
        )
    with pytest.raises(TypeError):
        NeighborListNsqrd(123, cutoff=cutoff, skin=skin, n_max_neighbors=5)
    with pytest.raises(ValueError):
        NeighborListNsqrd(
            space, cutoff=u.Quantity(123, u.picosecond), skin=skin
        )
    with pytest.raises(ValueError):
        NeighborListNsqrd(
            space, cutoff=cutoff, skin=u.Quantity(123, u.picosecond)
        )


def test_unitless_cutoff_and_skin_raise_cleanly():
    """A bare number at the construction boundary must raise a TypeError
    naming the argument (not an AttributeError on ``.unit``)."""
    space = OrthogonalPeriodicSpace()
    with pytest.raises(TypeError, match="cutoff"):
        NeighborListNsqrd(space, cutoff=1.2, skin=0.1 * u.nanometer)
    with pytest.raises(TypeError, match="skin"):
        NeighborListNsqrd(space, cutoff=1.2 * u.nanometer, skin=0.1)
    with pytest.raises(TypeError, match="cutoff"):
        PairListNsqrd(space, cutoff=1.2)
    # a Verlet list cannot drop its cutoff, but the pair list may
    nbr = NeighborListNsqrd(
        space, cutoff=1.2 * u.nanometer, skin=0.1 * u.nanometer)
    with pytest.raises(TypeError, match="cutoff"):
        nbr.cutoff = None
    with pytest.raises(TypeError, match="skin"):
        nbr.skin = 0.3
    pl = PairListNsqrd(space, cutoff=None)
    assert pl.cutoff is None
    pl.cutoff = 1.0 * u.nanometer
    pl.cutoff = None
    assert pl.cutoff is None


def _mesh_coordinates():
    n_xyz, scale_factor = 2, 2.0
    coord_mesh = jnp.mgrid[0:n_xyz, 0:n_xyz, 0:n_xyz] * scale_factor / n_xyz
    return jnp.stack(coord_mesh.reshape(3, -1), axis=1, dtype=jnp.float32)


def test_neighborlist_multiple_particles():
    coordinates = _mesh_coordinates()
    PRNG.set_seed(1234)
    state = SamplerState(
        positions=u.Quantity(coordinates, u.nanometer),
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=u.Quantity(BOX, u.nanometer),
    )
    space = OrthogonalPeriodicSpace()

    # Everybody interacts.
    nbr_list = NeighborListNsqrd(
        space, cutoff=2.1 * u.nanometer, skin=0.1 * u.nanometer, n_max_neighbors=5
    )
    nbr_list.build_from_state(state)
    assert jnp.all(nbr_list.n_neighbors == jnp.array([7, 6, 5, 4, 3, 2, 1, 0]))
    n_interacting, _, _, _, _ = nbr_list.calculate(coordinates)
    assert jnp.all(n_interacting == jnp.array([7, 6, 5, 4, 3, 2, 1, 0]))

    # Shorter interaction cutoff with larger skin: everyone is *listed*, a
    # subset interacts.  Capacity must have grown via the +10 rule to 17
    # (reference tests assert shape (8, 17)).
    nbr_list = NeighborListNsqrd(
        space, cutoff=1.1 * u.nanometer, skin=1.1 * u.nanometer, n_max_neighbors=5
    )
    nbr_list.build_from_state(state)
    assert jnp.all(nbr_list.n_neighbors == jnp.array([7, 6, 5, 4, 3, 2, 1, 0]))
    n_interacting, neighbor_list, mask, dist, rij = nbr_list.calculate(coordinates)
    assert jnp.all(n_interacting == jnp.array([3, 2, 2, 1, 2, 1, 1, 0]))
    assert neighbor_list.shape == (8, 17)
    expected = jnp.array(
        [
            [1, 2, 3, 4, 5, 6, 7] + [1] * 10,
            [2, 3, 4, 5, 6, 7] + [2] * 11,
            [3, 4, 5, 6, 7] + [3] * 12,
            [4, 5, 6, 7] + [4] * 13,
            [5, 6, 7] + [5] * 14,
            [6, 7] + [6] * 15,
            [7] + [7] * 16,
            [0] * 17,
        ]
    )
    assert jnp.all(neighbor_list == expected)


def test_pairlist_pair():
    coordinates, state = _two_particle_state()
    space = OrthogonalPeriodicSpace()
    cutoff = 1.1 * u.nanometer
    pair_list = PairListNsqrd(space, cutoff=cutoff)
    assert pair_list.cutoff == cutoff

    pair_list.build_from_state(state)
    assert jnp.all(pair_list.all_pairs == jnp.array([[1], [0]]))
    assert jnp.all(pair_list.reduction_mask == jnp.array([[True], [False]]))
    assert pair_list.is_built

    n_pairs, all_pairs, mask, dist, displacement = pair_list.calculate(
        state.positions
    )
    assert jnp.all(n_pairs == jnp.array([1, 0]))
    assert all_pairs.shape == (2, 1)
    assert jnp.all(mask == jnp.array([[1], [0]]))
    assert jnp.all(dist == jnp.array([[1.0], [1.0]]))
    assert displacement.shape == (2, 1, 3)
    assert jnp.all(
        displacement == jnp.array([[[-1.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]]])
    )

    assert pair_list.check(coordinates) is False
    assert pair_list.check(jnp.zeros((3, 3))) is True

    # No cutoff: identical for two particles in range.
    pair_list = PairListNsqrd(space, cutoff=None)
    pair_list.build_from_state(state)
    assert pair_list.cutoff is None
    n_pairs, _, mask, dist, _ = pair_list.calculate(state.positions)
    assert jnp.all(n_pairs == jnp.array([1, 0]))
    assert jnp.all(mask == jnp.array([[1], [0]]))

    # Cutoff too short: no interactions; switching cutoff to None restores.
    pair_list = PairListNsqrd(space, cutoff=0.5 * u.nanometer)
    pair_list.build_from_state(state)
    _, _, mask, _, _ = pair_list.calculate(state.positions)
    assert jnp.all(mask == jnp.array([[0], [0]]))
    pair_list.cutoff = None
    _, _, mask, _, _ = pair_list.calculate(state.positions)
    assert jnp.all(mask == jnp.array([[1], [0]]))


def test_pairlist_vs_neighborlist_consistency():
    """Masked distance sums must agree between the two schemes
    (reference test_pairs.py:460-471)."""
    coordinates = _mesh_coordinates()
    PRNG.set_seed(1234)
    state = SamplerState(
        positions=u.Quantity(coordinates, u.nanometer),
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=u.Quantity(BOX, u.nanometer),
    )
    space = OrthogonalPeriodicSpace()
    cutoff = 2.1 * u.nanometer

    pair_list = PairListNsqrd(space, cutoff=cutoff)
    pair_list.build_from_state(state)
    _, all_pairs, mask, dist, _ = pair_list.calculate(coordinates)
    assert all_pairs.shape == (8, 7)
    expected_pairs = jnp.array(
        [
            [1, 2, 3, 4, 5, 6, 7],
            [0, 2, 3, 4, 5, 6, 7],
            [0, 1, 3, 4, 5, 6, 7],
            [0, 1, 2, 4, 5, 6, 7],
            [0, 1, 2, 3, 5, 6, 7],
            [0, 1, 2, 3, 4, 6, 7],
            [0, 1, 2, 3, 4, 5, 7],
            [0, 1, 2, 3, 4, 5, 6],
        ]
    )
    assert jnp.all(all_pairs == expected_pairs)

    nbr_list = NeighborListNsqrd(
        space, cutoff=cutoff, skin=0.1 * u.nanometer, n_max_neighbors=20
    )
    nbr_list.build_from_state(state)
    _, _, mask1, dist1, _ = nbr_list.calculate(coordinates)

    assert jnp.where(mask, dist, 0).sum() == pytest.approx(
        float(jnp.where(mask1, dist1, 0).sum()), rel=1e-6
    )


def test_pairlist_invalid_n_particles():
    coordinates, state = _two_particle_state()
    pair_list = PairListNsqrd(OrthogonalPeriodicSpace(), cutoff=1.1 * u.nanometer)
    pair_list.build_from_state(state)
    with pytest.raises(ValueError):
        pair_list.calculate(jnp.zeros((5, 3)))
