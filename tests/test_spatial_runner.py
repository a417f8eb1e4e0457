"""Spatially-sharded Langevin runner: fast-tier 2-device smoke + parity.

The spatial runner shards the particle axis across the mesh (one
``all_gather`` of positions per step).  The O-step noise is drawn over the
full particle axis and sliced per device, so a 1-device and a 2-device run
follow the same trajectory up to float rounding (XLA may fuse the kick
arithmetic differently per shard shape) -- the test asserts tight parity
between mesh sizes, force parity with the dense oracle, plus a finite
energy.  Runs in a subprocess with a forced 2-device CPU topology (the
no-cluster multi-device mechanism, SURVEY.md section 4).
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_cpu_devices(script: str, n_devices: int, timeout=900) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    result = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    return json.loads(result.stdout.strip().splitlines()[-1])


_SCRIPT = textwrap.dedent(
    """
    import json
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    assert jax.device_count() == 2, jax.devices()

    from chiron_tpu import units
    from chiron_tpu.parallel.spatial import make_spatial_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=250, reduced_density=0.4)
    pos = fluid.positions.value_in_unit_system(units.md_unit_system)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)

    def trajectory(n_devices):
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("spatial",))
        r = make_spatial_lj_runner(
            mesh, fluid.potential, 250,
            temperature=120.0 * units.kelvin,
            timestep=2.0 * units.femtoseconds,
            topology=fluid.topology, tm=8,
        )
        st = r.init(pos, box, seed=42)
        st = r.run(st, 10)
        return r, st

    r1, s1 = trajectory(1)
    r2, s2 = trajectory(2)
    x1, v1 = np.asarray(s1.x), np.asarray(s1.v)
    x2, v2 = np.asarray(s2.x), np.asarray(s2.v)
    xerr = float(np.max(np.abs(x1 - x2)))
    verr = float(np.max(np.abs(v1 - v2)))

    # force parity vs the dense-op oracle at the final configuration
    F_ref = r2.op.force_energy_t(s2.x, s2.box_diag)[0]
    ferr = float(jnp.max(jnp.abs(s2.F - F_ref)))
    fscale = float(jnp.max(jnp.abs(F_ref))) or 1.0

    E = float(r2.energy(s2))
    out_sharding = str(s2.F.sharding.spec) if hasattr(
        s2.F.sharding, "spec") else ""
    print(json.dumps({
        "xerr": xerr,
        "verr": verr,
        "force_relerr": ferr / fscale,
        "finite": bool(np.isfinite(E)),
        "out_sharding": out_sharding,
    }))
    """
)


@pytest.mark.slow
def test_spatial_runner_2dev_parity():
    out = _run_on_cpu_devices(_SCRIPT, n_devices=2, timeout=600)
    # 10 steps of rounding-level divergence stays under ~1e-6 nm
    assert out["xerr"] < 1e-6, out
    assert out["verr"] < 1e-4, out
    assert out["force_relerr"] < 1e-5, out
    assert out["finite"], out
    assert "spatial" in out["out_sharding"], out


_THERMO = textwrap.dedent(
    """
    import json
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    assert jax.device_count() == 8, jax.devices()

    from chiron_tpu import units
    from chiron_tpu.parallel.spatial import make_spatial_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    n = 512
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.5)
    mesh = Mesh(np.array(jax.devices()), ("spatial",))
    r = make_spatial_lj_runner(
        mesh, fluid.potential, n,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
        topology=fluid.topology, tm=8,
    )
    st = r.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=7,
    )
    st = r.run(st, 400)
    v = r.velocities(st)
    kT_kin = float(jnp.mean(39.9 * jnp.sum(v * v, axis=1)) / 3.0)
    print(json.dumps({
        "kT_kin": kT_kin,
        "kT": 0.00831446 * 120.0,
        "E": float(r.energy(st)),
    }))
    """
)


_BAND = textwrap.dedent(
    """
    import json
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    assert jax.device_count() == 2, jax.devices()

    from chiron_tpu import units
    from chiron_tpu.parallel.spatial import make_spatial_band_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    n = 250
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.4)
    pos = fluid.positions.value_in_unit_system(units.md_unit_system)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    mesh = Mesh(np.array(jax.devices()), ("spatial",))
    r = make_spatial_band_lj_runner(
        mesh, fluid.potential, n,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
        topology=fluid.topology, tm=8, segment_steps=5,
    )
    st = r.init(pos, box, seed=3)

    # banded force at init vs the dense all-pairs oracle
    from chiron_tpu.ops.lj_dense import LJDensePallas
    op = LJDensePallas(n, fluid.potential.sigma, fluid.potential.epsilon,
                       fluid.potential.cutoff, tm=8, tn=8, triangle=False,
                       n_pad=r.n_pad)
    F_ref = op.force_energy_t(st.x, st.box_diag)[0]
    ferr = float(jnp.max(jnp.abs(st.F - F_ref)))
    fscale = float(jnp.max(jnp.abs(F_ref)))

    st = r.run(st, 20)
    try:
        r.check(st)
        latched = False
    except RuntimeError:
        latched = True
    E = float(r.energy(st))
    print(json.dumps({
        "force_relerr": ferr / fscale,
        "w": r.w,
        "latched": latched,
        "finite": bool(np.isfinite(E)),
    }))
    """
)


@pytest.mark.slow
def test_spatial_band_runner_2dev():
    """Banded per-device force matches the dense oracle; a short run
    stays finite with the drift latch clean."""
    out = _run_on_cpu_devices(_BAND, n_devices=2, timeout=900)
    assert out["force_relerr"] < 1e-5, out
    assert not out["latched"], out
    assert out["finite"], out
    # at this tiny box the band nearly spans the axis; just sanity-bound
    assert 0 < out["w"] <= 255, out


def test_row_band_kernel_selective_band_matches_oracle():
    """The per-device banded kernel with a band much narrower than n
    (dilute box) matches the dense all-pairs oracle -- this exercises the
    cyclic band masking the tiny-box subprocess test cannot (there the
    band spans everything)."""
    import jax.numpy as jnp
    import numpy as np

    from chiron_tpu.ops.lj_band import band_width_needed, sort_by_x
    from chiron_tpu.parallel.spatial import _make_row_band_force

    n, n_pad = 500, 512
    sigma, eps, cutoff, margin = 0.34, 0.99, 1.02, 0.15
    L = (n / 0.05) ** (1 / 3) * sigma  # dilute: reach << L
    rng = np.random.default_rng(8)
    x = rng.uniform(0, L, size=(3, n_pad)).astype(np.float32)
    x3 = jnp.asarray(x)
    x3s, _ = sort_by_x(x3, (), n)
    xs_key = jnp.where(jnp.arange(n_pad) < n, x3s[0], jnp.float32(3e38))
    reach = cutoff + 2 * margin
    w = int(band_width_needed(xs_key, n, reach, L)) + 8
    assert w < n // 2, w  # the band is genuinely selective here

    kernel_fn = _make_row_band_force(
        n, n_pad, n_pad, 8, w, sigma, eps, cutoff, interpret=True)
    box = jnp.asarray([[L, L, L]], jnp.float32)
    F = kernel_fn(x3s, box, jnp.zeros((1, 1), jnp.int32))

    p = x3s[:, :n].T
    d = p[:, None, :] - p[None, :, :]
    d = d - L * jnp.round(d / L)
    r2 = jnp.sum(d * d, -1)
    ids = jnp.arange(n)
    m = (r2 < cutoff * cutoff) & (ids[:, None] != ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    inv2 = (sigma * sigma) / r2s
    inv6 = inv2 * inv2 * inv2
    coef = jnp.where(m, 24 * eps * (2 * inv6 * inv6 - inv6) / r2s, 0.0)
    F_ref = jnp.sum(coef[..., None] * d, axis=1).T
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F[:, :n] - F_ref))) / scale < 1e-5


def test_row_band_kernel_multi_tile_padding_gap():
    """Regression: with n_pad - n spanning several tiles (the
    multi-device padding), wrap-around band pairs sit extra padding
    tiles away; the tile window must cover the full padded distance or
    boundary forces are silently wrong."""
    import jax.numpy as jnp
    import numpy as np

    from chiron_tpu.ops.lj_band import band_width_needed, sort_by_x
    from chiron_tpu.parallel.spatial import _make_row_band_force

    n, n_pad, tm = 450, 512, 8   # 62-rank / ~7-tile padding gap
    sigma, eps, cutoff, margin = 0.34, 0.99, 1.02, 0.15
    L = (n / 0.1) ** (1 / 3) * sigma
    rng = np.random.default_rng(1)
    x = rng.uniform(0, L, size=(3, n_pad)).astype(np.float32)
    # guarantee in-cutoff pairs across the periodic x boundary
    x[0, :6] = rng.uniform(0, 0.2, 6)
    x[0, 6:12] = rng.uniform(L - 0.2, L, 6)
    x3s, _ = sort_by_x(jnp.asarray(x), (), n)
    xs_key = jnp.where(jnp.arange(n_pad) < n, x3s[0], jnp.float32(3e38))
    reach = cutoff + 2 * margin
    w = int(band_width_needed(xs_key, n, reach, L)) + 8

    kernel_fn = _make_row_band_force(
        n, n_pad, n_pad, tm, w, sigma, eps, cutoff, interpret=True)
    box = jnp.asarray([[L, L, L]], jnp.float32)
    F = kernel_fn(x3s, box, jnp.zeros((1, 1), jnp.int32))

    p = x3s[:, :n].T
    d = p[:, None, :] - p[None, :, :]
    d = d - L * jnp.round(d / L)
    r2 = jnp.sum(d * d, -1)
    ids = jnp.arange(n)
    m = (r2 < cutoff * cutoff) & (ids[:, None] != ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    inv2 = (sigma * sigma) / r2s
    inv6 = inv2 * inv2 * inv2
    coef = jnp.where(m, 24 * eps * (2 * inv6 * inv6 - inv6) / r2s, 0.0)
    F_ref = jnp.sum(coef[..., None] * d, axis=1).T
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F[:, :n] - F_ref))) / scale < 1e-5


@pytest.mark.slow
def test_spatial_runner_8dev_thermalizes():
    """400 steps on 8 devices: kinetic temperature reaches the thermostat
    band and the energy is finite."""
    out = _run_on_cpu_devices(_THERMO, n_devices=8, timeout=900)
    import numpy as np
    assert np.isfinite(out["E"]), out
    assert abs(out["kT_kin"] - out["kT"]) / out["kT"] < 0.2, out


def test_spatial_band_runner_rejects_nonuniform_masses():
    import jax
    import numpy as np
    import pytest
    from jax.sharding import Mesh

    from chiron_tpu import units
    from chiron_tpu.parallel import make_spatial_band_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid
    from chiron_tpu.topology import Topology

    fluid = LennardJonesFluid(nparticles=64, reduced_density=0.2)
    topo = Topology.from_masses(np.linspace(10.0, 40.0, 64))
    mesh = Mesh(np.array(jax.devices()[:1]), ("spatial",))
    with pytest.raises(ValueError, match="identical masses"):
        make_spatial_band_lj_runner(
            mesh, fluid.potential, 64,
            temperature=120.0 * units.kelvin,
            timestep=2.0 * units.femtoseconds, topology=topo,
        )
