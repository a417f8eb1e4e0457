"""Minimizer tests (reference chiron/tests/test_minization.py)."""

import jax.numpy as jnp
import pytest

from chiron_tpu import units as u
from chiron_tpu.minimize import fire_descent, minimize_energy
from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
from chiron_tpu.potential import HarmonicOscillatorPotential, LJPotential
from chiron_tpu.topology import Topology

SIGMA = 0.34
EPS = 0.238 * 4.184


def _lj():
    top = Topology.uniform(2, 39.948)
    return LJPotential(
        top,
        sigma=SIGMA * u.nanometer,
        epsilon=0.238 * u.kilocalories_per_mole,
        cutoff=3.0 * SIGMA * u.nanometer,
    )


def test_two_particle_lj_minimization():
    """E -> -eps +- 1e-3; r -> 2^(1/6) sigma +- 1e-3
    (reference test_minization.py:127-128)."""
    lj = _lj()
    x0 = jnp.array([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0]])
    res = minimize_energy(x0, lj.compute_energy, None, maxiter=2000)
    r = float(jnp.linalg.norm(res.params[1] - res.params[0]))
    assert abs(float(res.energy) - (-EPS)) < 1e-3
    assert abs(r - SIGMA * 2 ** (1 / 6)) < 1e-3


def test_fire_descent():
    lj = _lj()
    x0 = jnp.array([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0]])
    res = fire_descent(x0, lj.compute_energy, None, maxiter=2000)
    r = float(jnp.linalg.norm(res.params[1] - res.params[0]))
    assert abs(float(res.energy) - (-EPS)) < 1e-3
    assert abs(r - SIGMA * 2 ** (1 / 6)) < 1e-3


def test_minimize_with_neighbor_list():
    lj = _lj()
    x0 = jnp.array([[0.0, 0.0, 0.0], [0.4, 0.0, 0.0]])
    box = jnp.eye(3) * 10.0
    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=3.0 * SIGMA * u.nanometer,
        skin=0.5 * u.nanometer,
        n_max_neighbors=5,
    )
    nl.build(x0, box)
    res = minimize_energy(x0, lj.compute_energy, nl, maxiter=2000)
    r = float(jnp.linalg.norm(res.params[1] - res.params[0]))
    assert abs(r - SIGMA * 2 ** (1 / 6)) < 1e-3


def test_minimize_harmonic():
    top = Topology.uniform(1)
    ho = HarmonicOscillatorPotential(
        top,
        k=100.0 * u.kilojoule_per_mole / u.nanometer ** 2,
        x0=u.Quantity(jnp.array([[0.5, 0.5, 0.5]]), u.nanometer),
    )
    res = minimize_energy(jnp.zeros((1, 3)), ho.compute_energy, None, maxiter=1000)
    assert jnp.allclose(res.params, jnp.full((1, 3), 0.5), atol=1e-3)
