"""SamplerState / ThermodynamicState tests (reference chiron/tests/test_states.py)."""

import jax
import jax.numpy as jnp
import pytest

from chiron_tpu import units as u
from chiron_tpu.potential import HarmonicOscillatorPotential, LJPotential
from chiron_tpu.states import (
    SamplerState,
    ThermodynamicState,
    calculate_reduced_potential_at_states,
)
from chiron_tpu.topology import Topology
from chiron_tpu.utils import PRNG


@pytest.fixture
def key():
    PRNG.set_seed(1234)
    return PRNG.get_random_key()


def test_sampler_state_validation(key):
    pos = jnp.zeros((3, 3))
    # positions must carry units
    with pytest.raises(TypeError):
        SamplerState(positions=pos, current_PRNG_key=key)
    # wrong units
    with pytest.raises(ValueError):
        SamplerState(positions=u.Quantity(pos, u.picosecond), current_PRNG_key=key)
    # velocities wrong units
    with pytest.raises(ValueError):
        SamplerState(
            positions=u.Quantity(pos, u.nanometer),
            current_PRNG_key=key,
            velocities=u.Quantity(pos, u.nanometer),
        )
    # velocities shape mismatch
    with pytest.raises(ValueError):
        SamplerState(
            positions=u.Quantity(pos, u.nanometer),
            current_PRNG_key=key,
            velocities=u.Quantity(jnp.zeros((4, 3)), u.nanometer / u.picosecond),
        )
    # box wrong shape
    with pytest.raises(ValueError):
        SamplerState(
            positions=u.Quantity(pos, u.nanometer),
            current_PRNG_key=key,
            box_vectors=u.Quantity(jnp.zeros((4, 3)), u.nanometer),
        )
    # box wrong type
    with pytest.raises(TypeError):
        SamplerState(
            positions=u.Quantity(pos, u.nanometer),
            current_PRNG_key=key,
            box_vectors=jnp.eye(3),
        )
    # missing key
    with pytest.raises(ValueError):
        SamplerState(positions=u.Quantity(pos, u.nanometer), current_PRNG_key=None)


def test_sampler_state_md_conversion(key):
    """Positions given in Angstrom come back as nm arrays
    (reference test pattern: unit conversion at the boundary)."""
    pos = jnp.ones((2, 3)) * 10.0
    ss = SamplerState(
        positions=u.Quantity(pos, u.angstrom), current_PRNG_key=key
    )
    assert jnp.allclose(ss.positions, jnp.ones((2, 3)))
    assert ss.number_of_particles == 2
    assert ss.velocities is None
    assert ss.box_vectors is None


def test_sampler_state_prng_stream(key):
    ss = SamplerState(
        positions=u.Quantity(jnp.zeros((2, 3)), u.nanometer), current_PRNG_key=key
    )
    k1 = ss.new_PRNG_key
    k2 = ss.new_PRNG_key
    assert not jnp.all(k1 == k2)


def test_sampler_state_pytree_roundtrip(key):
    ss = SamplerState(
        positions=u.Quantity(jnp.zeros((2, 3)), u.nanometer),
        current_PRNG_key=key,
        box_vectors=u.Quantity(jnp.eye(3), u.nanometer),
    )
    data = ss.as_data()
    leaves, treedef = jax.tree_util.tree_flatten(data)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert jnp.all(rebuilt.positions == data.positions)
    assert rebuilt.volume == pytest.approx(1.0)


def test_thermodynamic_state_validation():
    top = Topology.uniform(1)
    ho = HarmonicOscillatorPotential(top)
    with pytest.raises(TypeError):
        ThermodynamicState(potential=ho, temperature=300.0)
    with pytest.raises(ValueError):
        ThermodynamicState(potential=ho, temperature=300.0 * u.nanometer)
    with pytest.raises(TypeError):
        ThermodynamicState(potential=ho, temperature=300.0 * u.kelvin, pressure=1.0)
    with pytest.raises(ValueError):
        ThermodynamicState(
            potential=ho, temperature=300.0 * u.kelvin, pressure=1.0 * u.kelvin
        )
    with pytest.raises(ValueError):
        ThermodynamicState(
            potential=ho, temperature=300.0 * u.kelvin, volume=1.0 * u.kelvin
        )
    ts = ThermodynamicState(potential=ho, temperature=300.0 * u.kelvin)
    assert ts.check_variables() == ["temperature"]
    assert ts.beta is not None
    assert ts.kT_md == pytest.approx(2.49434, rel=1e-4)


def test_reduced_potential_nvt(key):
    """u = beta U for NVT (reference states.py:275-325)."""
    top = Topology.uniform(1)
    ho = HarmonicOscillatorPotential(
        top, k=1.0 * u.kilocalories_per_mole / u.angstrom ** 2
    )
    ts = ThermodynamicState(potential=ho, temperature=300.0 * u.kelvin)
    pos = jnp.array([[0.1, 0.0, 0.0]])
    ss = SamplerState(positions=u.Quantity(pos, u.nanometer), current_PRNG_key=key)
    U = float(ho.compute_energy(pos))  # 0.5*k*0.1^2 in MD units
    k_md = 4.184 * 100  # kcal/mol/A^2 -> kJ/mol/nm^2
    assert U == pytest.approx(0.5 * k_md * 0.01, rel=1e-5)
    expected_u = U / 2.494338785
    assert float(ts.get_reduced_potential(ss)) == pytest.approx(
        expected_u, rel=1e-4
    )


def test_reduced_potential_npt(key):
    """u = beta (U + pV) with the pV term in molar MD units."""
    top = Topology.uniform(2)
    lj = LJPotential(top)
    ts = ThermodynamicState(
        potential=lj, temperature=300.0 * u.kelvin, pressure=1.0 * u.bar
    )
    pos = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    box = jnp.eye(3) * 2.0
    ss = SamplerState(
        positions=u.Quantity(pos, u.nanometer),
        current_PRNG_key=key,
        box_vectors=u.Quantity(box, u.nanometer),
    )
    U = float(lj.compute_energy(pos, None))
    beta = 1.0 / 2.494338785
    pV = 0.0602214076 * 8.0  # 1 bar * 8 nm^3 in kJ/mol
    assert float(ts.get_reduced_potential(ss)) == pytest.approx(
        beta * (U + pV), rel=1e-4
    )


def test_reduced_potential_at_states(key):
    """Vectorized counterpart of reference states.py:335-366."""
    top = Topology.uniform(1)
    ho = HarmonicOscillatorPotential(top)
    states = [
        ThermodynamicState(potential=ho, temperature=t * u.kelvin)
        for t in (200.0, 300.0, 400.0)
    ]
    pos = jnp.array([[0.2, 0.0, 0.0]])
    ss = SamplerState(positions=u.Quantity(pos, u.nanometer), current_PRNG_key=key)
    us = calculate_reduced_potential_at_states(ss, states)
    assert us.shape == (3,)
    U = float(ho.compute_energy(pos))
    for i, t in enumerate((200.0, 300.0, 400.0)):
        beta = 1.0 / (0.008314462618 * t)
        assert float(us[i]) == pytest.approx(beta * U, rel=1e-5)
