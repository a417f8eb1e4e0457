"""openmm.unit interop at the construction boundary (VERDICT r4 item 8).

Reference chiron constructors accept ``openmm.unit.Quantity`` everywhere
(reference chiron/states.py:44-87, chiron/potential.py:154-178).  openmm is
not installed on TPU hosts, so these tests drive the adapter through a stub
that implements exactly the openmm Quantity protocol the adapter duck-types
on: ``.unit``, ``.value_in_unit_system(system)``, and
``unit.iter_base_dimensions()`` yielding ``(BaseDimension, exponent)`` pairs
-- the same surface a real openmm Quantity exposes.  ``md_unit_system`` is
resolved from the quantity's defining module, mirroring how the adapter
finds ``openmm.unit.md_unit_system`` for the real thing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu import units

# --------------------------------------------------------------------------
# protocol stub (module-level so _openmm_md_system can resolve
# ``md_unit_system`` from type(q).__module__, as it does for openmm.unit)
# --------------------------------------------------------------------------


class _BaseDim:
    def __init__(self, name):
        self.name = name


_LENGTH = _BaseDim("length")
_MASS = _BaseDim("mass")
_TIME = _BaseDim("time")
_TEMPERATURE = _BaseDim("temperature")
_AMOUNT = _BaseDim("amount")
_ANGLE = _BaseDim("angle")
_CHARGE = _BaseDim("charge")


class _StubUnit:
    """openmm-Unit stand-in: named base dimensions + a factor to the MD
    unit system (what ``value_in_unit_system(md_unit_system)`` applies)."""

    def __init__(self, base_dims, md_factor, name):
        self._base_dims = base_dims  # [(BaseDim, exponent), ...]
        self.md_factor = md_factor
        self.name = name

    def iter_base_dimensions(self):
        return iter(self._base_dims)

    def __repr__(self):
        return self.name


class _StubQuantity:
    def __init__(self, value, unit):
        self._value = value
        self.unit = unit

    def value_in_unit_system(self, system):
        assert system is md_unit_system, (
            "adapter must resolve the quantity's OWN md_unit_system"
        )
        f = self.unit.md_factor
        v = self._value
        if isinstance(v, (list, tuple)):
            # openmm scales sequence containers elementwise and hands the
            # container back (list of Vec3 for positions/boxes)
            return [
                type(e)(*[c * f for c in e]) if isinstance(e, tuple)
                else e * f
                for e in v
            ]
        return v * f


md_unit_system = object()  # the sentinel _openmm_md_system must find

# openmm conventions: dalton = gram/mole (mass carries amount -1), so
# kJ/mol = dalton nm^2/ps^2 decomposes as below -- md factors are the
# value conversions openmm's value_in_unit_system(md_unit_system) applies
ANGSTROM = _StubUnit([(_LENGTH, 1)], 0.1, "angstrom")
NANOMETER = _StubUnit([(_LENGTH, 1)], 1.0, "nanometer")
FEMTOSECOND = _StubUnit([(_TIME, 1)], 1e-3, "femtosecond")
KELVIN = _StubUnit([(_TEMPERATURE, 1)], 1.0, "kelvin")
DALTON = _StubUnit([(_MASS, 1), (_AMOUNT, -1)], 1.0, "dalton")
KJ_PER_MOL = _StubUnit(
    [(_LENGTH, 2), (_MASS, 1), (_TIME, -2), (_AMOUNT, -1)], 1.0,
    "kilojoule/mole",
)
KCAL_PER_MOL_PER_A2 = _StubUnit(
    [(_MASS, 1), (_TIME, -2), (_AMOUNT, -1)], 4.184 / 0.01,
    "kilocalorie/(mole angstrom**2)",
)
NM_PER_PS = _StubUnit([(_LENGTH, 1), (_TIME, -1)], 1.0, "nanometer/picosecond")
RADIAN = _StubUnit([(_ANGLE, 1)], 1.0, "radian")
COULOMB = _StubUnit([(_CHARGE, 1)], 1.0, "coulomb")


# --------------------------------------------------------------------------
# adapter unit tests
# --------------------------------------------------------------------------


def test_from_openmm_value_and_dims():
    q = units.from_openmm(_StubQuantity(5.0, ANGSTROM))
    assert isinstance(q, units.Quantity)
    assert q.unit.is_compatible(units.nanometer)
    assert np.isclose(q.value_in_unit_system(units.md_unit_system), 0.5)
    assert np.isclose(q.value_in_unit(units.angstrom), 5.0)


def test_from_openmm_energy_and_mass_conventions():
    e = units.from_openmm(_StubQuantity(2.5, KJ_PER_MOL))
    assert e.unit.is_compatible(units.kilojoule_per_mole)
    assert np.isclose(e.value_in_unit_system(units.md_unit_system), 2.5)
    m = units.from_openmm(_StubQuantity(39.948, DALTON))
    assert m.unit.is_compatible(units.dalton)
    assert np.isclose(m.value_in_unit_system(units.md_unit_system), 39.948)
    assert np.isclose(m.value_in_unit(units.gram / units.mole), 39.948)


def test_from_openmm_is_identity_on_native_quantities():
    q = 1.0 * units.nanometer
    assert units.from_openmm(q) is q
    assert units.coerce(3.5) == 3.5
    arr = np.ones(3)
    assert units.coerce(arr) is arr


def test_from_openmm_rejects_non_quantities_and_unknown_dims():
    with pytest.raises(TypeError, match="openmm-style"):
        units.from_openmm(1.0)
    with pytest.raises(ValueError, match="charge"):
        units.from_openmm(_StubQuantity(1.0, COULOMB))
    # radians are treated as dimensionless, matching the MD system's view
    r = units.from_openmm(_StubQuantity(2.0, RADIAN))
    assert r.unit.is_dimensionless()


def test_strip_md_accepts_foreign_quantities():
    from chiron_tpu.units import strip_md

    assert np.isclose(
        strip_md(_StubQuantity(2.0, FEMTOSECOND), units.picosecond), 2e-3
    )
    with pytest.raises(ValueError, match="compatible"):
        strip_md(_StubQuantity(2.0, FEMTOSECOND), units.nanometer)


# --------------------------------------------------------------------------
# construction boundaries: the reference quick-start surface
# --------------------------------------------------------------------------


def test_sampler_state_accepts_openmm_style_quantities():
    from chiron_tpu.states import SamplerState
    from chiron_tpu.utils import PRNG

    PRNG.set_seed(0)
    pos = _StubQuantity(np.arange(12.0).reshape(4, 3), ANGSTROM)
    vel = _StubQuantity(np.ones((4, 3)), NM_PER_PS)
    box = _StubQuantity(np.eye(3) * 20.0, ANGSTROM)
    ss = SamplerState(pos, current_PRNG_key=PRNG.get_random_key(),
                      velocities=vel, box_vectors=box)
    np.testing.assert_allclose(
        np.asarray(ss.positions), np.arange(12.0).reshape(4, 3) * 0.1,
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(ss.box_vectors), np.eye(3) * 2.0,
                               rtol=1e-6)
    # setters coerce too
    ss.positions = _StubQuantity(np.zeros((4, 3)), NANOMETER)
    assert float(jnp.max(jnp.abs(ss.positions))) == 0.0


def test_thermodynamic_state_accepts_openmm_style_quantities():
    from chiron_tpu.potential import HarmonicOscillatorPotential
    from chiron_tpu.states import ThermodynamicState
    from chiron_tpu.testsystems import HarmonicOscillator

    ho = HarmonicOscillator()
    ts = ThermodynamicState(
        HarmonicOscillatorPotential(ho.topology),
        temperature=_StubQuantity(300.0, KELVIN),
    )
    assert np.isclose(
        ts.temperature.value_in_unit_system(units.md_unit_system), 300.0
    )
    assert ts.beta is not None


def test_potential_constructors_accept_openmm_style_quantities():
    from chiron_tpu.potential import HarmonicOscillatorPotential, LJPotential
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=8, reduced_density=0.1)
    lj = LJPotential(
        fluid.topology,
        sigma=_StubQuantity(3.4, ANGSTROM),
        epsilon=_StubQuantity(0.997, KJ_PER_MOL),
        cutoff=_StubQuantity(1.0, NANOMETER),
    )
    assert np.isclose(lj.sigma, 0.34)
    assert np.isclose(lj.epsilon, 0.997)
    assert np.isclose(lj.cutoff, 1.0)

    from chiron_tpu.testsystems import HarmonicOscillator

    ho = HarmonicOscillator()
    pot = HarmonicOscillatorPotential(
        ho.topology,
        k=_StubQuantity(1.0, KCAL_PER_MOL_PER_A2),
        x0=_StubQuantity(np.zeros((1, 3)), ANGSTROM),
        U0=_StubQuantity(0.5, KJ_PER_MOL),
    )
    assert np.isclose(float(pot.k), 418.4)
    assert np.isclose(float(pot.U0), 0.5)


def test_neighbor_list_accepts_openmm_style_quantities():
    from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace

    nbr = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=_StubQuantity(12.0, ANGSTROM),
        skin=_StubQuantity(4.0, ANGSTROM),
        n_max_neighbors=20,
    )
    assert np.isclose(
        nbr.cutoff.value_in_unit_system(units.md_unit_system), 1.2
    )
    assert np.isclose(
        nbr.skin.value_in_unit_system(units.md_unit_system), 0.4
    )
    rng = np.random.default_rng(0)
    nbr.build(
        _StubQuantity(rng.uniform(0, 30, (16, 3)), ANGSTROM),
        _StubQuantity(np.eye(3) * 30.0, ANGSTROM),
    )
    assert nbr.is_built


@pytest.mark.slow
def test_integrator_run_with_openmm_style_inputs_end_to_end():
    """The reference quick-start shape: build everything from openmm-style
    quantities and run dynamics (reference Examples/LJ_langevin.py)."""
    from chiron_tpu.integrators import LangevinIntegrator
    from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
    from chiron_tpu.states import SamplerState, ThermodynamicState
    from chiron_tpu.testsystems import LennardJonesFluid
    from chiron_tpu.utils import PRNG

    fluid = LennardJonesFluid(nparticles=27, reduced_density=0.3)
    box_nm = np.asarray(
        fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    )
    pos_nm = np.asarray(
        fluid.positions.value_in_unit_system(units.md_unit_system)
    )
    PRNG.set_seed(1)
    ss = SamplerState(
        _StubQuantity(pos_nm * 10.0, ANGSTROM),
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=_StubQuantity(box_nm * 10.0, ANGSTROM),
    )
    ts = ThermodynamicState(
        fluid.potential, temperature=_StubQuantity(120.0, KELVIN)
    )
    nbr = NeighborListNsqrd(
        OrthogonalPeriodicSpace(), cutoff=fluid.cutoff,
        skin=_StubQuantity(5.0, ANGSTROM), n_max_neighbors=60,
    )
    integ = LangevinIntegrator(
        timestep=_StubQuantity(2.0, FEMTOSECOND),
    )
    out, _ = integ.run(ss, ts, nbr_list=nbr, number_of_steps=20)
    assert np.isfinite(np.asarray(out.positions)).all()


def test_sampler_state_accepts_openmm_style_box_vector_list():
    """getDefaultPeriodicBoxVectors() returns a LIST of per-row
    quantities (reference states.py:81-95 parses it); each row here is
    an openmm-protocol stub wrapping a length-3 vector."""
    from chiron_tpu.states import SamplerState
    from chiron_tpu.utils import PRNG

    PRNG.set_seed(0)
    box_rows = [
        _StubQuantity(np.array([30.0, 0.0, 0.0]), ANGSTROM),
        _StubQuantity(np.array([0.0, 30.0, 0.0]), ANGSTROM),
        _StubQuantity(np.array([0.0, 0.0, 30.0]), ANGSTROM),
    ]
    ss = SamplerState(
        _StubQuantity(np.zeros((4, 3)), NANOMETER),
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=box_rows,
    )
    np.testing.assert_allclose(np.asarray(ss.box_vectors), np.eye(3) * 3.0,
                               rtol=1e-6)


def test_from_openmm_normalizes_vec3_style_sequences():
    """openmm positions are a Quantity wrapping a list of Vec3
    (namedtuples): the adapter must hand back array math, not Python
    sequence repetition."""
    from collections import namedtuple

    Vec3 = namedtuple("Vec3", ["x", "y", "z"])
    q = units.from_openmm(
        _StubQuantity([Vec3(1.0, 2.0, 3.0), Vec3(4.0, 5.0, 6.0)], NANOMETER)
    )
    v = q.value_in_unit_system(units.md_unit_system)
    assert v.shape == (2, 3)
    np.testing.assert_allclose(v, [[1, 2, 3], [4, 5, 6]])
