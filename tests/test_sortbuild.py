"""Fused sort+build kernel: exact parity with the XLA path.

The jnp/XLA implementations (``sort_by_key`` + ``build_tile_pairs``) are
the semantic oracle (CLAUDE.md design invariants); the Pallas kernel runs
in interpret mode on CPU.  Keys are made distinct so sort-tie order (the
one permitted deviation) cannot differ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.lj_cull import build_tile_pairs, slab_y_key, sort_by_key
from chiron_tpu.ops.sortbuild import sort_build_raw

N = 1000
N_PAD = 1024
TM, TN = 128, 256
L = 5.0
CUTOFF, SLACK = 1.02, 0.2
CAP = 64


@pytest.fixture(scope="module")
def state():
    rng = np.random.default_rng(11)
    x = rng.uniform(0, L, size=(3, N_PAD)).astype(np.float32)
    # distinct x keys: tie order is the only permitted deviation, so
    # remove ties entirely for the exactness test
    x[0] = np.sort(rng.choice(
        np.linspace(0.001, L - 0.001, 50000), size=N_PAD, replace=False
    ).astype(np.float32))
    rng.shuffle(x[0])
    v = rng.normal(size=(3, N_PAD)).astype(np.float32)
    F = rng.normal(size=(3, N_PAD)).astype(np.float32)
    box = jnp.asarray([L, L, L], jnp.float32)
    return jnp.asarray(x), jnp.asarray(v), jnp.asarray(F), box


@pytest.mark.slow
def test_sort_build_matches_xla_oracle(state):
    x, v, F, box = state
    xs_k, vs_k, fs_k, pairs_k = sort_build_raw(
        x, v, F, box, n=N, tm=TM, tn=TN, nslab=0, cutoff=CUTOFF,
        slack=SLACK, capacity=CAP, interpret=True,
    )
    key = slab_y_key(x, N, 0, L)
    xs_o, payload = sort_by_key(
        key, x, (v[0], v[1], v[2], F[0], F[1], F[2])
    )
    vs_o = jnp.stack(payload[0:3])
    fs_o = jnp.stack(payload[3:6])
    # padding slots all carry the same sentinel key, so their tie order is
    # the one place bitonic and lax.sort may differ -- compare the valid
    # region (padding is masked everywhere downstream)
    assert jnp.array_equal(xs_k[:, :N], xs_o[:, :N]), "sorted x differ"
    assert jnp.array_equal(vs_k[:, :N], vs_o[:, :N]), "sorted v differ"
    assert jnp.array_equal(fs_k[:, :N], fs_o[:, :N]), "sorted F differ"

    pairs_o = build_tile_pairs(xs_o, N, TM, TN, box, CUTOFF, SLACK, CAP)
    for name in ("cols", "ccx", "ptr2", "rowcx", "count"):
        ko, kk = getattr(pairs_o, name), getattr(pairs_k, name)
        assert jnp.array_equal(ko, kk), (
            f"{name}: {np.asarray(ko)} != {np.asarray(kk)}"
        )
    assert bool(pairs_o.overflowed) == bool(pairs_k.overflowed)


@pytest.mark.slow
def test_sort_build_slab_key_matches_xla_oracle(state):
    """The (x-slab, y) key path -- the production sort above ~6.5 reaches
    of box width -- must also match the XLA oracle exactly."""
    x, v, F, box = state
    nslab = 4
    xs_k, vs_k, fs_k, pairs_k = sort_build_raw(
        x, v, F, box, n=N, tm=TM, tn=TN, nslab=nslab, cutoff=CUTOFF,
        slack=SLACK, capacity=256, interpret=True,
    )
    key = slab_y_key(x, N, nslab, L)
    xs_o, payload = sort_by_key(
        key, x, (v[0], v[1], v[2], F[0], F[1], F[2])
    )
    assert jnp.array_equal(xs_k[:, :N], xs_o[:, :N])
    assert jnp.array_equal(
        vs_k[:, :N], jnp.stack(payload[0:3])[:, :N]
    )
    pairs_o = build_tile_pairs(xs_o, N, TM, TN, box, CUTOFF, SLACK, 256)
    for name in ("cols", "ccx", "ptr2", "rowcx", "count"):
        assert jnp.array_equal(
            getattr(pairs_o, name), getattr(pairs_k, name)
        ), name
    assert bool(pairs_o.overflowed) == bool(pairs_k.overflowed)


@pytest.mark.slow
def test_sort_build_wrapper_placement_matches(state, monkeypatch):
    """Above the VMEM limit the kernel emits the slot matrix and the
    wrapper scatters in XLA -- identical TilePairList either way."""
    import chiron_tpu.ops.sortbuild as sb

    x, v, F, box = state
    ref = sort_build_raw(
        x, v, F, box, n=N, tm=TM, tn=TN, nslab=0, cutoff=CUTOFF,
        slack=SLACK, capacity=CAP, interpret=True,
    )
    monkeypatch.setattr(sb, "_KERNEL_PLACE_LIMIT", 0)
    # separate jit cache entry: capacity+0 keeps the signature identical,
    # so clear the cache to force re-trace under the patched limit
    sb.sort_build_raw.clear_cache()
    alt = sb.sort_build_raw(
        x, v, F, box, n=N, tm=TM, tn=TN, nslab=0, cutoff=CUTOFF,
        slack=SLACK, capacity=CAP, interpret=True,
    )
    sb.sort_build_raw.clear_cache()
    for a, b in zip(ref[:3], alt[:3]):
        assert jnp.array_equal(a, b)
    for name in ("cols", "ccx", "ptr2", "rowcx", "count"):
        assert jnp.array_equal(
            getattr(ref[3], name), getattr(alt[3], name)
        ), name
    assert bool(ref[3].overflowed) == bool(alt[3].overflowed)


@pytest.mark.slow
def test_sort_build_flags_capacity_overflow(state):
    x, v, F, box = state
    *_, pairs = sort_build_raw(
        x, v, F, box, n=N, tm=TM, tn=TN, nslab=0, cutoff=CUTOFF,
        slack=SLACK, capacity=3, interpret=True,
    )
    assert bool(pairs.overflowed)


@pytest.mark.slow
def test_culled_runner_fused_rebuild_path():
    """End-to-end culled runner with the fused Pallas rebuild forced on
    (interpret mode): finite energy, latch clean, kinetic temperature in
    a loose band after a short run."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.5)
    # slack 0.15: the lattice start quantizes tiles onto crystal planes,
    # and the default 0.3 slack pushes one tile past the x-shift bound at
    # this box size; drift over a 10-step segment is ~0.01 nm, so 0.15
    # leaves a wide margin for the latch
    runner = make_culled_lj_runner(
        potential=fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120.0 * units.kelvin, segment_steps=10,
        tm=128, tn=128, fused_rebuild=True, slack=0.15,
    )
    s = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=9,
    )
    s = runner.run(s, 20)
    runner.check(s)
    E = float(runner.energy(s))
    assert np.isfinite(E)
    vv = runner.velocities(s)
    kT_kin = float(jnp.mean(39.9 * jnp.sum(vv * vv, axis=1)) / 3.0)
    kT = 0.00831446 * 120.0
    assert 0.2 * kT < kT_kin < 5.0 * kT


def test_sort_build_rejects_bad_shapes(state):
    x, v, F, box = state
    with pytest.raises(ValueError, match="power-of-two"):
        sort_build_raw(
            x[:, :768], v[:, :768], F[:, :768], box, n=700, tm=128,
            tn=256, nslab=0, cutoff=CUTOFF, slack=SLACK, capacity=CAP,
            interpret=True,
        )


@pytest.mark.slow
def test_fused_rebuild_rejects_cadence_params():
    """fused_rebuild sorts/rebuilds every segment; non-unit cadences must
    raise instead of being silently ignored."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    fluid = LennardJonesFluid(nparticles=4000, reduced_density=0.8)
    r = make_culled_lj_runner(
        potential=fluid.potential, n_particles=4000,
        topology=fluid.topology, fused_rebuild=True, sort_every=4,
    )
    st = r.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=0,
    )
    with pytest.raises(ValueError, match="sort_every"):
        r.run(st, 50)
