"""Banded (x-sorted) LJ kernel tests: oracle parity + sort machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.lj_band import (
    LJBandPallas,
    band_width_needed,
    sort_by_x,
)
from chiron_tpu.ops.lj_dense import LJDensePallas

SIGMA, EPS, CUTOFF = 0.34, 0.99579, 1.02


def _fluid(n, rho, seed=0):
    L = (n * SIGMA ** 3 / rho) ** (1 / 3)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, L, (n, 3)), dtype=jnp.float32)
    box = jnp.asarray(np.eye(3) * L, dtype=jnp.float32)
    return x, box, L


@pytest.mark.parametrize("n,rho", [(2000, 0.8), (1500, 0.3)])
def test_band_force_matches_dense(n, rho):
    x, box, L = _fluid(n, rho)
    dense = LJDensePallas(n, SIGMA, EPS, CUTOFF, tm=64, tn=128, triangle=False)
    band = LJBandPallas(n, SIGMA, EPS, CUTOFF, margin=0.15, tm=64)

    pos3 = dense.pad_positions(x)
    pos3s, _ = sort_by_x(pos3, (), n)
    band.calibrate(pos3s, L)
    bd = jnp.diagonal(box).reshape(1, 3)

    F_band = band.force(pos3s, bd, approx_recip=False)[:, :n].T
    xs = pos3s[:, :n].T
    F_ref, _ = dense.force_energy(xs, box)
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F_band - F_ref))) / scale < 1e-5


def test_band_valid_after_small_drift():
    """Forces stay exact while per-particle x drift < margin (the sorted
    order may go stale but the band must still cover every pair)."""
    n, rho = 1500, 0.4
    x, box, L = _fluid(n, rho)
    dense = LJDensePallas(n, SIGMA, EPS, CUTOFF, tm=64, tn=128, triangle=False)
    band = LJBandPallas(n, SIGMA, EPS, CUTOFF, margin=0.15, tm=64)
    pos3s, _ = sort_by_x(dense.pad_positions(x), (), n)
    band.calibrate(pos3s, L)
    bd = jnp.diagonal(box).reshape(1, 3)

    # drift every particle by < margin in x (and freely in y/z)
    rng = np.random.default_rng(1)
    drift = jnp.asarray(
        rng.uniform(-0.12, 0.12, (3, pos3s.shape[1])), dtype=jnp.float32
    )
    moved = pos3s + drift
    moved = moved - jnp.floor(moved / L) * L
    # zero the padding columns again
    mask = (jnp.arange(pos3s.shape[1]) < n).astype(jnp.float32)
    moved = moved * mask

    F_band = band.force(moved, bd, approx_recip=False)[:, :n].T
    F_ref, _ = dense.force_energy(moved[:, :n].T, box)
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F_band - F_ref))) / scale < 1e-5


def test_band_inapplicable_small_box():
    """W >= n/2 (box only a few cutoffs wide) must raise toward the dense
    kernel instead of silently double counting."""
    n, rho = 400, 0.8
    x, box, L = _fluid(n, rho)
    dense = LJDensePallas(n, SIGMA, EPS, CUTOFF, tm=64, tn=128, triangle=False)
    band = LJBandPallas(n, SIGMA, EPS, CUTOFF, margin=0.15, tm=64)
    pos3s, _ = sort_by_x(dense.pad_positions(x), (), n)
    with pytest.raises(ValueError):
        band.calibrate(pos3s, L)


def test_band_width_needed():
    # 8 equally spaced particles on a ring of L=8: reach 2.1 covers 2 ahead
    xs = jnp.asarray(np.arange(8, dtype=np.float32))
    w = int(band_width_needed(xs, 8, 2.1, 8.0))
    assert w == 3  # strictly, x+2.1 includes ranks +1, +2 (and boundary +3 for right-side counts)


def test_sort_by_x_with_payload():
    n = 10
    rng = np.random.default_rng(0)
    pos3 = jnp.asarray(rng.uniform(0, 5, (3, 16)), dtype=jnp.float32)
    pos3 = pos3 * (jnp.arange(16) < n)
    payload = jnp.arange(16, dtype=jnp.float32)
    pos3s, (p_s,) = sort_by_x(pos3, (payload,), n)
    xs = np.asarray(pos3s[0][:n])
    assert np.all(np.diff(xs) >= 0)
    # payload permuted consistently: payload value identifies original column
    orig = np.asarray(pos3[0])
    for i in range(n):
        j = int(p_s[i])
        assert np.isclose(xs[i], orig[j])


@pytest.mark.slow
def test_band_runner_end_to_end():
    """Band runner: in-scan conditional resorting keeps forces exact."""
    from chiron_tpu import units
    from chiron_tpu.runtime import make_band_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    N = 1500
    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.3)
    r = make_band_lj_runner(
        fluid.potential, n_particles=N, topology=fluid.topology,
        temperature=120 * units.kelvin, timestep=2.0 * units.femtoseconds,
        tm=64,
    )
    st = r.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3,
    )
    st = r.run(st, 200)
    assert not bool(st.overflowed)
    r.check(st)  # same contract as CulledRunner/StripRunner.check()
    e = float(r.energy(st))
    assert np.isfinite(e)
    # a latched overflow must raise, like every sibling engine
    import dataclasses as _dc
    bad = _dc.replace(st, overflowed=jnp.asarray(True))
    with pytest.raises(RuntimeError, match="band runner invariant"):
        r.check(bad)
    # after 200 steps (sorted order possibly stale), the band force still
    # matches the dense oracle
    Fb = r.band.force(st.x, st.box_diag, approx_recip=False)
    Fd = r.dense.force_only_t(st.x, st.box_diag, approx_recip=False)
    scale = float(jnp.max(jnp.abs(Fd)))
    assert float(jnp.max(jnp.abs(Fb - Fd))) / scale < 1e-5


def test_band_energy_and_grad_is_negative_force():
    """grad(energy) == -force on the BANDED engine (CLAUDE.md invariant
    'everywhere'; same custom-VJP scheme as the culled/dense paths;
    reference grad-force contract chiron/potential.py:21-24), and the
    banded single-count energy matches the dense kernel's."""
    n, rho = 1500, 0.4
    x, box, L = _fluid(n, rho)
    dense = LJDensePallas(n, SIGMA, EPS, CUTOFF, tm=64, tn=128,
                          triangle=False)
    band = LJBandPallas(n, SIGMA, EPS, CUTOFF, margin=0.15, tm=64)
    pos3s, _ = sort_by_x(dense.pad_positions(x), (), n)
    band.calibrate(pos3s, L)
    bd = jnp.diagonal(box).reshape(1, 3)

    F, E = band.force_energy(pos3s, bd, approx_recip=False)
    _, E_ref = dense.force_energy(pos3s[:, :n].T, box)
    assert float(jnp.abs(E - E_ref)) / abs(float(E_ref)) < 1e-5

    g = jax.grad(lambda p: band.energy_differentiable(p, bd))(pos3s)
    # exact by construction: the VJP returns the kernel's force array
    assert float(jnp.max(jnp.abs(g + F))) == 0.0
    # and that force is the dense oracle's (1e-5, as the force tests pin)
    F_ref = dense.force_energy(pos3s[:, :n].T, box)[0]
    scale = float(jnp.max(jnp.abs(F_ref)))
    assert float(jnp.max(jnp.abs(F[:, :n].T - F_ref))) / scale < 1e-5
