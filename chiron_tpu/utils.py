"""Utilities: PRNG management, masses, velocity initialization.

TPU-native counterpart of reference chiron/utils.py.  The PRNG class keeps the
reference's global-seeded key-splitting pattern (reference chiron/utils.py:6-38)
because the golden-seed determinism tests depend on it; everything else is
reworked to be openmm-free and jit-friendly.
"""

from __future__ import annotations

from typing import Optional, Union

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import units
from .topology import Topology


class PRNG:
    """Global seeded PRNG-key factory (reference chiron/utils.py:6-38).

    ``set_seed`` installs a root key; each ``get_random_key`` splits it,
    advancing the stream deterministically.
    """

    _key = None
    _seed: int = None

    @classmethod
    def set_seed(cls, seed: int) -> None:
        cls._seed = seed
        cls._key = jax.random.PRNGKey(seed)

    @classmethod
    def get_random_key(cls):
        if cls._key is None:
            raise RuntimeError("PRNG.set_seed(seed) must be called first")
        key, subkey = jax.random.split(cls._key)
        cls._key = key
        return subkey


def get_nr_of_particles(topology: Topology) -> int:
    """Number of particles in the system (reference chiron/utils.py:101-103)."""
    return topology.getNumAtoms()


def get_list_of_mass(topology: Topology) -> units.Quantity:
    """Per-atom masses as a Quantity in dalton (reference chiron/utils.py:106-113)."""
    return units.Quantity(topology.masses(), units.amu)


def masses_md(topology_or_masses) -> jnp.ndarray:
    """Masses as a device array in MD units, shaped (N, 1) for broadcasting."""
    if isinstance(topology_or_masses, Topology):
        m = topology_or_masses.masses()
    else:
        m = units.strip_md(topology_or_masses, units.amu)
    return jnp.asarray(np.asarray(m, dtype=np.float64), dtype=jnp.float32)[:, None]


def initialize_velocities(
    temperature, topology_or_masses, key
) -> units.Quantity:
    """Maxwell-Boltzmann velocities at ``temperature``.

    sigma_v = sqrt(kB T / m) per particle (reference chiron/utils.py:116-144).
    Returns a Quantity in nm/ps.
    """
    kbT = units.kB_MD * units.strip_md(temperature, units.kelvin)
    m = masses_md(topology_or_masses)
    sigma_v = jnp.sqrt(kbT / m)
    v0 = sigma_v * jax.random.normal(key, (m.shape[0], 3))
    return units.Quantity(v0, units.nanometer / units.picosecond)


def initialize_velocities_md(temperature_md: float, masses: jnp.ndarray, key):
    """Pure/jittable Maxwell-Boltzmann sampling in MD units.

    ``masses`` must be shaped (N, 1).  Used inside jitted step functions.
    """
    sigma_v = jnp.sqrt(temperature_md * units.kB_MD / masses)
    return sigma_v * jax.random.normal(key, (masses.shape[0], 3))


def get_data_file_path(relative_path: str) -> str:
    """Full path to a packaged data file (reference chiron/utils.py:60-82)."""
    from importlib.resources import files

    file_path = files("chiron_tpu") / "data" / relative_path
    if not file_path.exists():
        raise ValueError(f"Sorry! {file_path} does not exist.")
    return str(file_path)


def get_full_path(relative_path: str) -> str:
    """Path of a file relative to the package root
    (reference chiron/utils.py:41-57)."""
    from importlib.resources import files

    module_root = files("chiron_tpu")
    return f"{module_root}/../{relative_path}"


def slice_array(arr, start_column: int, end_column: int):
    """Column slice helper (reference chiron/utils.py:85-98)."""
    return arr[:, start_column:end_column]


def enable_compilation_cache(path: str = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    The axon remote TPU compiler takes seconds-to-minutes per distinct
    program (CLAUDE.md); the persistent cache keyed by HLO hash makes
    every program after the first process COLD-START at warm speed.
    Safe to call multiple times.  Returns the cache directory.

    Benchmarks and examples call this; library code does not (the cache
    location is a deployment decision).
    """
    import jax

    if path is None:
        path = os.environ.get(
            "CHIRON_TPU_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "chiron_tpu_jax"
            ),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program, even fast-compiling ones: the axon round-trip
    # dominates, not local compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
