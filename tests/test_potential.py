"""Potential tests: analytic closed-form checks + autodiff/analytic force parity.

Mirrors reference chiron/tests/test_potential.py; oracle values come from a
float64 numpy implementation instead of OpenMM (not installable here --
SURVEY.md section 4 cross-validation note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu import units as u
from chiron_tpu.neighbors import (
    NeighborListNsqrd,
    OrthogonalPeriodicSpace,
    PairListNsqrd,
)
from chiron_tpu.potential import (
    HarmonicOscillatorPotential,
    IdealGasPotential,
    LJPotential,
)
from chiron_tpu.topology import Topology


SIGMA = 0.34  # nm
EPS_KCAL = 0.238
EPS = EPS_KCAL * 4.184  # kJ/mol


def lj_energy_numpy(positions, sigma, eps, cutoff, box=None):
    """Float64 reference oracle: half-sum LJ with minimum image."""
    positions = np.asarray(positions, dtype=np.float64)
    n = len(positions)
    e = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = positions[i] - positions[j]
            if box is not None:
                L = np.diag(box)
                d = np.mod(d + L / 2, L) - L / 2
            r = np.linalg.norm(d)
            if r < cutoff:
                sr6 = (sigma / r) ** 6
                e += 4 * eps * (sr6 ** 2 - sr6)
    return e


def make_lj(n=2):
    top = Topology.uniform(n, 39.948)
    return LJPotential(
        top,
        sigma=SIGMA * u.nanometer,
        epsilon=EPS_KCAL * u.kilocalories_per_mole,
        cutoff=3.0 * SIGMA * u.nanometer,
    )


def test_lj_input_validation():
    top = Topology.uniform(2)
    with pytest.raises(TypeError):
        LJPotential(top, sigma=0.34)
    with pytest.raises(TypeError):
        LJPotential(top, epsilon=1.0)
    with pytest.raises(TypeError):
        LJPotential(top, cutoff=1.0)
    with pytest.raises(ValueError):
        LJPotential(top, sigma=1.0 * u.kelvin)
    with pytest.raises(ValueError):
        LJPotential(top, epsilon=1.0 * u.kelvin)
    with pytest.raises(ValueError):
        LJPotential(top, cutoff=1.0 * u.kelvin)
    with pytest.raises(TypeError):
        LJPotential(topology=123)


def test_lj_two_particle_energy():
    lj = make_lj()
    pos = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    sr6 = (SIGMA / 0.5) ** 6
    expected = 4 * EPS * (sr6 ** 2 - sr6)
    assert float(lj.compute_energy(pos)) == pytest.approx(expected, rel=1e-5)

    # identical through the pair list and neighbor list paths
    box = jnp.eye(3) * 10.0
    pl = PairListNsqrd(OrthogonalPeriodicSpace(), cutoff=3.0 * SIGMA * u.nanometer)
    pl.build(pos, box)
    assert float(lj.compute_energy(pos, pl)) == pytest.approx(expected, rel=1e-5)

    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=3.0 * SIGMA * u.nanometer,
        skin=0.5 * u.nanometer,
        n_max_neighbors=5,
    )
    nl.build(pos, box)
    assert float(lj.compute_energy(pos, nl)) == pytest.approx(expected, rel=1e-5)


def test_lj_energy_vs_float64_oracle():
    """Random 50-particle fluid vs float64 numpy half-sum, all list schemes."""
    rng = np.random.default_rng(42)
    n = 50
    L = 3.0
    pos_np = rng.uniform(0, L, size=(n, 3))
    box_np = np.eye(3) * L
    cutoff = 3.0 * SIGMA
    expected = lj_energy_numpy(pos_np, SIGMA, EPS, cutoff, box_np)

    lj = make_lj(n)
    pos = jnp.asarray(pos_np, dtype=jnp.float32)
    box = jnp.asarray(box_np, dtype=jnp.float32)

    pl = PairListNsqrd(OrthogonalPeriodicSpace(), cutoff=cutoff * u.nanometer)
    pl.build(pos, box)
    e_pl = float(lj.compute_energy(pos, pl))

    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=cutoff * u.nanometer,
        skin=0.5 * u.nanometer,
        n_max_neighbors=10,
    )
    nl.build(pos, box)
    e_nl = float(lj.compute_energy(pos, nl))

    assert e_pl == pytest.approx(expected, rel=2e-5)
    assert e_nl == pytest.approx(expected, rel=2e-5)
    assert e_pl == pytest.approx(e_nl, rel=1e-6)


def test_lj_force_autodiff_vs_analytical():
    """-grad(E) matches the closed-form LJ force
    (reference test_potential.py:222-230, atol 1e-5)."""
    lj = make_lj(3)
    pos = jnp.array(
        [[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.2, 0.45, 0.1]], dtype=jnp.float32
    )
    f_auto = lj.compute_force(pos)
    f_analytic = lj.compute_force_analytical(pos)
    assert jnp.allclose(f_auto, f_analytic, atol=1e-4)


def test_lj_force_with_neighbor_list():
    rng = np.random.default_rng(7)
    n = 20
    pos = jnp.asarray(rng.uniform(0, 3.0, size=(n, 3)), dtype=jnp.float32)
    box = jnp.eye(3) * 3.0
    lj = make_lj(n)
    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=3.0 * SIGMA * u.nanometer,
        skin=0.5 * u.nanometer,
        n_max_neighbors=25,
    )
    nl.build(pos, box)
    F = lj.compute_force(pos, nl)
    assert F.shape == (n, 3)
    assert bool(jnp.all(jnp.isfinite(F)))
    # Newton's third law: net force ~ 0 relative to the force scale (the
    # random config contains overlaps with |F| ~ 1e4, so the tolerance must
    # scale with f32 roundoff on that magnitude)
    atol = 1e-5 * float(jnp.max(jnp.abs(F)))
    assert jnp.allclose(F.sum(axis=0), jnp.zeros(3), atol=atol)


def test_lj_cutoff_mismatch_raises():
    lj = make_lj()
    pos = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=1.2 * u.nanometer,  # != potential cutoff
        skin=0.5 * u.nanometer,
    )
    nl.build(pos, jnp.eye(3) * 10.0)
    with pytest.raises(ValueError):
        lj.compute_energy(pos, nl)
    # unbuilt list
    nl2 = NeighborListNsqrd(
        OrthogonalPeriodicSpace(), cutoff=3.0 * SIGMA * u.nanometer
    )
    with pytest.raises(ValueError):
        lj.compute_energy(pos, nl2)


def test_harmonic_oscillator():
    top = Topology.uniform(1)
    k = 100.0 * u.kilojoule_per_mole / u.nanometer ** 2
    x0 = u.Quantity(jnp.array([[0.0, 0.0, 0.0]]), u.nanometer)
    U0 = 1.0 * u.kilojoule_per_mole
    ho = HarmonicOscillatorPotential(top, k=k, x0=x0, U0=U0)
    pos = jnp.array([[0.3, 0.0, 0.0]])
    # U = 0.5*100*0.09 + 1 = 5.5
    assert float(ho.compute_energy(pos)) == pytest.approx(5.5, rel=1e-6)
    F = ho.compute_force(pos)
    assert jnp.allclose(F, jnp.array([[-30.0, 0.0, 0.0]]), atol=1e-4)

    with pytest.raises(TypeError):
        HarmonicOscillatorPotential(top, k=1.0)
    with pytest.raises(ValueError):
        HarmonicOscillatorPotential(top, k=1.0 * u.kelvin)
    with pytest.raises(ValueError):
        HarmonicOscillatorPotential(
            top, U0=1.0 * u.nanometer
        )


def test_ideal_gas():
    top = Topology.uniform(10)
    ig = IdealGasPotential(top)
    pos = jnp.zeros((10, 3))
    assert ig.compute_energy(pos) == 0.0
    assert ig.compute_force(pos) == 0.0
    with pytest.raises(TypeError):
        IdealGasPotential(topology=123)


def test_energy_fn_closures_jit_and_grad():
    """make_energy_fn closures are jittable and differentiable end-to-end."""
    n = 10
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 2.0, size=(n, 3)), dtype=jnp.float32)
    box = jnp.eye(3) * 2.0
    lj = make_lj(n)
    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=3.0 * SIGMA * u.nanometer,
        skin=0.5 * u.nanometer,
        n_max_neighbors=15,
    )
    nl.build(pos, box)
    energy_fn = lj.make_energy_fn(nl)
    e = jax.jit(energy_fn)(pos, nl.state)
    assert float(e) == pytest.approx(float(lj.compute_energy(pos, nl)), rel=1e-6)
    g = jax.jit(jax.grad(energy_fn))(pos, nl.state)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("density", [0.05, 0.1, 0.4, 0.8])
def test_lj_fluid_energy_four_densities(density):
    """LJ fluid energies vs the float64 oracle at four densities
    (reference test_testsystems.py:168-219 ran the same sweep vs OpenMM)."""
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=216, reduced_density=density)
    pos_np = np.asarray(
        fluid.positions.value_in_unit_system(u.md_unit_system), dtype=np.float64
    )
    # jitter so the lattice isn't a special configuration
    rng = np.random.default_rng(int(density * 100))
    pos_np = pos_np + rng.normal(0, 0.02, pos_np.shape)
    pos_np = np.mod(pos_np, fluid.box_length)
    box_np = np.eye(3) * fluid.box_length

    cutoff = 3.0 * SIGMA
    expected = lj_energy_numpy(pos_np, SIGMA, EPS, cutoff, box_np)

    pos = jnp.asarray(pos_np, dtype=jnp.float32)
    box = jnp.asarray(box_np, dtype=jnp.float32)

    nl = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=cutoff * u.nanometer,
        skin=0.3 * u.nanometer,
        n_max_neighbors=220,
    )
    nl.build(pos, box)
    e_nl = float(fluid.potential.compute_energy(pos, nl))
    assert e_nl == pytest.approx(expected, rel=5e-5)

    # and the Pallas dense kernel agrees too
    from chiron_tpu.ops.lj_dense import LJDensePallas

    op = LJDensePallas(216, SIGMA, EPS, cutoff, tm=64, tn=128)
    _, e_k = op.force_energy(pos, box)
    assert float(e_k) == pytest.approx(expected, rel=5e-5)
