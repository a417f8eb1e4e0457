"""Unit-system tests: the construction boundary everything else leans on."""

import numpy as np
import pytest

from chiron_tpu import units as u


def test_md_unit_system_identities():
    # 1 kJ/mol is the MD energy unit (dalton nm^2 / ps^2).
    assert (1.0 * u.kilojoule_per_mole).value_in_unit_system(
        u.md_unit_system
    ) == pytest.approx(1.0)
    assert (1.0 * u.kilocalories_per_mole).value_in_unit_system(
        u.md_unit_system
    ) == pytest.approx(4.184)
    assert (1.0 * u.nanometer).value_in_unit_system(u.md_unit_system) == 1.0
    assert (1.0 * u.angstrom).value_in_unit_system(u.md_unit_system) == pytest.approx(
        0.1
    )
    assert (2.0 * u.femtoseconds).value_in_unit_system(
        u.md_unit_system
    ) == pytest.approx(0.002)
    assert (39.9 * u.amu).value_in_unit_system(u.md_unit_system) == pytest.approx(39.9)


def test_kbt_in_md_units():
    kbT = u.BOLTZMANN_CONSTANT_kB * u.AVOGADRO_CONSTANT_NA * (300 * u.kelvin)
    # RT at 300 K = 2.494 kJ/mol
    assert kbT.value_in_unit_system(u.md_unit_system) == pytest.approx(
        2.49434, rel=1e-4
    )
    assert u.kB_MD == pytest.approx(0.008314462618, rel=1e-9)


def test_pressure_conversion():
    # 1 bar = 0.0602214 kJ/mol/nm^3
    assert u.pressure_to_md(1.0 * u.bar) == pytest.approx(0.0602214076, rel=1e-6)
    assert u.pressure_to_md(1.0 * u.atmosphere) == pytest.approx(
        0.0610193, rel=1e-4
    )
    with pytest.raises(ValueError):
        u.pressure_to_md(1.0 * u.kelvin)


def test_compatibility_checks():
    assert u.nanometer.is_compatible(u.angstrom)
    assert not u.nanometer.is_compatible(u.picosecond)
    assert (u.kilocalorie_per_mole / u.angstrom ** 2).is_compatible(
        u.kilojoule_per_mole / u.nanometer ** 2
    )
    assert (u.nanometer / u.picosecond).is_compatible(u.meter / u.second)
    assert u.bar.is_compatible(u.atmosphere)


def test_quantity_arithmetic():
    q = 0.5 * u.nanometer + 1.0 * u.angstrom
    assert q.value_in_unit(u.nanometer) == pytest.approx(0.6)
    assert (2.0 * u.nanometer / (1.0 * u.picosecond)).unit.is_compatible(
        u.meter / u.second
    )
    assert ((2.0 * u.nanometer) ** 3).value_in_unit(
        u.nanometer ** 3
    ) == pytest.approx(8.0)
    with pytest.raises(TypeError):
        _ = 1.0 * u.nanometer + 1.0  # bare number


def test_array_quantities():
    pos = np.ones((4, 3)) * u.nanometer
    assert isinstance(pos, u.Quantity)
    assert pos.value_in_unit_system(u.md_unit_system).shape == (4, 3)
    assert pos[0].value_in_unit(u.angstrom) == pytest.approx(10.0)


def test_reduced_potential_dimensionless():
    beta = 1.0 / (u.BOLTZMANN_CONSTANT_kB * (300 * u.kelvin))
    e = u.Quantity(10.0, u.kilojoule_per_mole) / u.AVOGADRO_CONSTANT_NA
    red = beta * e
    assert red.unit.is_dimensionless()
    assert red.value_in_unit_system(u.md_unit_system) == pytest.approx(
        10.0 / 2.49434, rel=1e-4
    )


def test_strip_md():
    assert u.strip_md(1.5) == 1.5
    assert u.strip_md(3.0 * u.angstrom, u.nanometer) == pytest.approx(0.3)
    with pytest.raises(ValueError):
        u.strip_md(3.0 * u.picosecond, u.nanometer)


def test_run_config_roundtrip():
    from chiron_tpu.config import RunConfig

    cfg = RunConfig()
    cfg.system.n_particles = 4000
    text = cfg.to_json()
    cfg2 = RunConfig.from_json(text)
    assert cfg2.system.n_particles == 4000
    assert cfg2.dynamics.timestep_fs == 2.0


def test_misc_util_parity():
    import numpy as np

    from chiron_tpu.topology import PerceivedTopology
    from chiron_tpu.utils import get_full_path, slice_array

    assert slice_array(np.arange(12).reshape(3, 4), 1, 3).shape == (3, 2)
    assert get_full_path("README.md").endswith("README.md")
    top = PerceivedTopology.uniform(3, 10.0)
    com = top.get_center_of_mass(np.ones((3, 3)))
    assert np.allclose(com, 1.0)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        top.get_water_molecules()


def test_quantity_rejects_implicit_array_conversion():
    """np.asarray / jnp.asarray on a Quantity must fail fast with guidance.
    Quantity is a sequence (__len__ + __getitem__), so the fallback
    element-wise conversion would yield an object array at best and, for a
    jax-backed value, dispatch one gather per element -- effectively a hang
    with unbounded memory."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from chiron_tpu import units

    for backing in (np.ones((2, 3)), jnp.ones((2, 3))):
        q = units.Quantity(backing, units.nanometer)
        with pytest.raises(TypeError, match="value_in_unit_system"):
            np.asarray(q)
        with pytest.raises(TypeError, match="value_in_unit_system"):
            jnp.asarray(q)
