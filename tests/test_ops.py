"""Pallas kernel tests: exact parity against the jnp dense oracle.

On non-TPU backends the kernels run in interpret mode, so these tests
validate kernel *semantics* everywhere; performance is exercised by bench.py
on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.lj_dense import LJDensePallas

N = 192  # deliberately not a tile multiple (tests padding/masking)
SIGMA, EPS, CUTOFF = 0.34, 0.99579, 1.02
L = 4.0


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(0)
    n_side = int(np.ceil(N ** (1 / 3)))
    g = (np.arange(n_side) + 0.5) * L / n_side
    xyz = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:N]
    xyz += rng.normal(0, 0.02, xyz.shape)
    x = jnp.asarray(xyz, dtype=jnp.float32)
    box = jnp.asarray(np.eye(3) * L, dtype=jnp.float32)
    return x, box


def dense_oracle(pos, box):
    """jnp reference: the shared semantic oracle at this module's params."""
    from chiron_tpu.oracles import lj_dense_oracle

    return lj_dense_oracle(pos, box, SIGMA, EPS, CUTOFF)


@pytest.mark.parametrize("triangle", [False, True])
def test_dense_kernel_matches_oracle(system, triangle):
    x, box = system
    Fo, Eo = dense_oracle(x, box)
    op = LJDensePallas(
        N, SIGMA, EPS, CUTOFF, tm=64, tn=128, triangle=triangle
    )
    F, E = op.force_energy(x, box)
    assert float(jnp.abs(E - Eo) / jnp.abs(Eo)) < 1e-5
    scale = float(jnp.max(jnp.abs(Fo)))
    assert float(jnp.max(jnp.abs(F - Fo))) / scale < 1e-5


def test_dense_kernel_grad_is_negative_force(system):
    x, box = system
    op = LJDensePallas(N, SIGMA, EPS, CUTOFF, tm=64, tn=128)
    F, _ = op.force_energy(x, box)
    g = jax.grad(lambda p: op.energy(p, box))(x)
    assert float(jnp.max(jnp.abs(g + F))) == 0.0


@pytest.mark.slow
def test_fast_runner_propagates(system):
    """make_fast_lj_runner end-to-end on the kernel path."""
    from chiron_tpu import units
    from chiron_tpu.potential import LJPotential
    from chiron_tpu.runtime import make_fast_lj_runner
    from chiron_tpu.topology import Topology

    x, box = system
    top = Topology.uniform(N, 39.948)
    lj = LJPotential(
        top,
        sigma=SIGMA * units.nanometer,
        epsilon=units.Quantity(EPS, units.kilojoule_per_mole),
        cutoff=CUTOFF * units.nanometer,
    )
    runner = make_fast_lj_runner(
        lj, n_particles=N, temperature=120.0 * units.kelvin, tm=64
    )
    state = runner.init(x, box, seed=0)
    state = runner.run(state, 20)
    assert bool(jnp.all(jnp.isfinite(state.x)))
    e = runner.energy(state)
    assert bool(jnp.isfinite(e))
