"""Multi-device sharding tests.

Runs in a subprocess with a forced 8-device CPU topology
(``xla_force_host_platform_device_count``) -- the no-cluster multi-device
test mechanism (SURVEY.md section 4).  Checks that the sharded
parallel-tempering propagator compiles, runs, shards the replica axis, and
produces free energies matching the analytic harmonic-oscillator ladder.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _run_on_8_cpu_devices(script: str) -> dict:
    """Run a script in a subprocess forced onto an 8-device CPU topology.

    NOTE: the axon plugin overrides JAX_PLATFORMS and a site hook imports jax
    before script bodies run, so the platform/topology env vars must be set
    in the subprocess environment.
    """
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    result = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    return json.loads(result.stdout.strip().splitlines()[-1])


# NOTE: jax is imported by a site hook before this script body runs, so the
# platform/topology env vars MUST come from the subprocess environment (see
# the test below), not from os.environ assignments in the script.
SCRIPT = textwrap.dedent(
    """
    import json
    import math
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.device_count() == 8, jax.devices()

    from chiron_tpu import units
    from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
    from chiron_tpu.potential import HarmonicOscillatorPotential
    from chiron_tpu.testsystems import HarmonicOscillator

    ho = HarmonicOscillator(k=100.0 * units.kilojoule_per_mole / units.nanometer**2)
    n_replicas = 8
    temps = [300.0 * (1.2 ** i) for i in range(n_replicas)]

    mesh = make_replica_mesh(8)
    pt = ParallelTemperingSampler(
        potential=ho.potential,
        temperatures=[t * units.kelvin for t in temps],
        timestep=4.0 * units.femtoseconds,
        collision_rate=5.0 / units.picoseconds,
        mesh=mesh,
    )
    pt.initialize(ho.positions, seed=1234)
    pt.run(n_iterations=300, steps_per_iteration=200)

    # replica axis is actually sharded across the 8 devices
    shardings = {str(s.spec) for s in [pt.positions.sharding]}

    f_k = pt.compute_free_energies(discard_fraction=0.2)

    # analytic ladder: f(T) = -(3/2) ln(2 pi kT / K), dimensionless per state
    K = 100.0
    kB = 0.008314462618
    f_analytic = np.array(
        [-1.5 * math.log(2 * math.pi * kB * t / K) for t in sorted(temps)]
    )
    f_analytic -= f_analytic[0]

    print(json.dumps({
        "device_count": jax.device_count(),
        "sharding_spec": sorted(shardings),
        "swap_acceptance": pt.swap_acceptance_fraction,
        "f_k": [float(x) for x in f_k],
        "f_analytic": [float(x) for x in f_analytic],
        "max_err": float(np.max(np.abs(f_k - f_analytic))),
    }))
    """
)


SIXTYFOUR_SCRIPT = textwrap.dedent(
    """
    import json
    import jax
    import numpy as np

    assert jax.device_count() == 8

    from chiron_tpu import units
    from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
    from chiron_tpu.testsystems import HarmonicOscillator

    ho = HarmonicOscillator()
    R = 64  # the BASELINE.json flagship replica count: 8 per device
    temps = [300.0 * 1.03 ** i for i in range(R)]
    pt = ParallelTemperingSampler(
        potential=ho.potential,
        temperatures=[t * units.kelvin for t in temps],
        timestep=2.0 * units.femtoseconds,
        mesh=make_replica_mesh(8),
    )
    pt.initialize(ho.positions, seed=11)
    pt.run(n_iterations=5, steps_per_iteration=50)
    U = pt._u_history[-1]
    print(json.dumps({
        "n": int(len(U)),
        "finite": bool(np.all(np.isfinite(U))),
        "sharding": str(pt.positions.sharding.spec),
        "swap_acc": pt.swap_acceptance_fraction,
    }))
    """
)


@pytest.mark.slow
def test_64_replica_parallel_tempering_on_8_devices():
    """The flagship 64-replica config: 8 replica blocks per device via
    lax.map inside shard_map shards."""
    out = _run_on_8_cpu_devices(SIXTYFOUR_SCRIPT)
    assert out["n"] == 64
    assert out["finite"]
    assert "replica" in out["sharding"]
    assert out["swap_acc"] > 0.1, out


DENSE_SCRIPT = textwrap.dedent(
    """
    import json
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.device_count() == 8, jax.devices()

    from chiron_tpu import units
    from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=32, reduced_density=0.3)
    temps = [120.0 * 1.1 ** i for i in range(8)]
    pt = ParallelTemperingSampler(
        potential=fluid.potential,
        temperatures=[t * units.kelvin for t in temps],
        timestep=2.0 * units.femtoseconds,
        mesh=make_replica_mesh(8),
    )
    pt.initialize(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        box_vectors=fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=7,
    )
    assert pt._dense_op is not None  # dense kernel auto-selected
    pt.run(n_iterations=2, steps_per_iteration=5)
    U = pt._u_history[-1]
    print(json.dumps({
        "sharding_spec": str(pt.positions.sharding.spec),
        "finite": bool(np.all(np.isfinite(U))),
        "n_energies": int(len(U)),
    }))
    """
)


@pytest.mark.slow
def test_parallel_tempering_dense_kernel_on_8_devices():
    """LJ parallel tempering through the dense Pallas kernel (interpret mode
    on CPU), sharded over 8 virtual devices."""
    out = _run_on_8_cpu_devices(DENSE_SCRIPT)
    assert out["finite"], out
    assert out["n_energies"] == 8
    assert "replica" in out["sharding_spec"], out


SPATIAL_SCRIPT = textwrap.dedent(
    """
    import json
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    assert jax.device_count() == 8

    from chiron_tpu.ops.lj_dense import LJDensePallas
    from chiron_tpu.parallel.spatial import make_sharded_lj_force

    N, sigma, eps, cutoff, L = 1000, 0.34, 0.99579, 1.02, 5.0
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, L, (N, 3)), dtype=jnp.float32)
    box = jnp.asarray(np.eye(3) * L, dtype=jnp.float32)

    op = LJDensePallas(N, sigma, eps, cutoff, tm=128, tn=128, triangle=False)
    F_ref, _ = op.force_energy(x, box)

    mesh = Mesh(np.array(jax.devices()), ("replica",))
    f = make_sharded_lj_force(mesh, N, sigma, eps, cutoff, tm=128)
    p = jnp.zeros((3, f.n_pad), dtype=jnp.float32).at[:, :N].set(x.T)
    bd = jnp.diagonal(box).reshape(1, 3)
    F3 = f(p, bd)
    F = F3[:, :N].T
    err = float(jnp.max(jnp.abs(F - F_ref))) / float(jnp.max(jnp.abs(F_ref)))

    # differentiable sharded energy: value vs dense kernel, gradient is
    # exactly the negative sharded force (grad(energy) == -force on the
    # particle-axis-sharded path)
    _, E_ref = op.force_energy(x, box)
    F_fe, E = f.force_energy(p, bd)
    g = jax.grad(lambda q: f.energy_differentiable(q, bd))(p)
    e_err = abs(float(E) - float(E_ref)) / abs(float(E_ref))
    grad_exact = float(jnp.max(jnp.abs(g + F_fe)))
    print(json.dumps({
        "err": err,
        "e_err": e_err,
        "grad_exact": grad_exact,
        "out_sharding": str(F3.sharding.spec),
        "rows_per_dev": f.rows_per_dev,
    }))
    """
)


@pytest.mark.slow
def test_spatial_sharded_force_on_8_devices():
    """Particle-axis (row) sharding of the dense pair kernel: 8 devices each
    compute a row slab; result matches the single-kernel oracle."""
    out = _run_on_8_cpu_devices(SPATIAL_SCRIPT)
    assert out["err"] < 1e-5, out
    assert "replica" in out["out_sharding"], out
    # the half-factored double-counted energy matches the dense kernel
    assert out["e_err"] < 1e-5, out
    # grad(energy) == -force exactly on the sharded path
    assert out["grad_exact"] == 0.0, out


@pytest.mark.slow
def test_parallel_tempering_on_8_virtual_devices():
    out = _run_on_8_cpu_devices(SCRIPT)
    assert out["device_count"] == 8
    # the replica axis is sharded, not replicated
    assert any("replica" in s for s in out["sharding_spec"]), out["sharding_spec"]
    # neighbor-temperature swaps are frequent for this ladder spacing
    assert out["swap_acceptance"] > 0.2, out
    # MBAR free energies match the analytic ladder
    assert out["max_err"] < 0.15, out


def test_pt_compute_free_energies_empty_history_raises():
    """compute_free_energies before any run() (or with a discard fraction
    that leaves zero iterations) must raise a clear error, not crash in
    np.concatenate."""
    import pytest

    from chiron_tpu import units
    from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
    from chiron_tpu.testsystems import HarmonicOscillator

    ho = HarmonicOscillator()
    pt = ParallelTemperingSampler(
        potential=ho.potential,
        temperatures=[300.0 * units.kelvin, 360.0 * units.kelvin],
        timestep=2.0 * units.femtoseconds,
        mesh=make_replica_mesh(1),
    )
    pt.initialize(ho.positions, seed=1)
    with pytest.raises(ValueError, match="no PT samples"):
        pt.compute_free_energies()
