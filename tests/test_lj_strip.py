"""Halo-strip kernel tests: parity against the jnp dense oracle.

The jnp dense path is the semantic oracle for every Pallas kernel (CLAUDE.md
design invariants); these run in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.lj_band import band_width_needed
from chiron_tpu.ops.lj_strip import _PAD_X, StripLJMD, sort_by_key_strip

N = 1000
SIGMA, EPS, CUTOFF = 0.34, 0.99579, 1.02
L = 5.0
TM = 8  # small interpret-mode tile (hardware uses 128; bench on TPU)


def dense_oracle(pos, box_diag, cutoff=CUTOFF):
    ids = jnp.arange(pos.shape[0])
    d = pos[:, None, :] - pos[None, :, :]
    d = d - box_diag * jnp.round(d / box_diag)
    r2 = jnp.sum(d * d, -1)
    m = (r2 < cutoff * cutoff) & (ids[:, None] != ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    inv2 = (SIGMA * SIGMA) / r2s
    inv6 = inv2 * inv2 * inv2
    coef = jnp.where(m, 24 * EPS * (2 * inv6 * inv6 - inv6) / r2s, 0.0)
    return jnp.sum(coef[..., None] * d, axis=1)


@pytest.fixture(scope="module")
def strip_system():
    rng = np.random.default_rng(7)
    n_side = int(np.ceil(N ** (1 / 3)))
    g = (np.arange(n_side) + 0.5) * L / n_side
    xyz = np.stack(
        np.meshgrid(g, g, g, indexing="ij"), -1
    ).reshape(-1, 3)[:N]
    xyz = (xyz + rng.normal(0, 0.02, xyz.shape)).astype(np.float32) % L
    md = StripLJMD(
        N, SIGMA, EPS, CUTOFF,
        masses_lane=np.full(N, 39.9), dt=0.002, gamma=1.0,
        kT=0.008314 * 120, tm=TM, slack=0.2,
    )
    pos3 = jnp.full((3, md.n_pad), jnp.float32(_PAD_X))
    pos3 = pos3.at[:, :N].set(jnp.asarray(xyz.T))
    box_diag = jnp.asarray([L, L, L], jnp.float32)
    x3s, _ = sort_by_key_strip(pos3, ())
    valid = jnp.arange(md.n_pad) < N
    W = int(band_width_needed(
        jnp.where(valid, x3s[0], jnp.float32(3.0e38)),
        N, CUTOFF + 0.2, L,
    ))
    md.set_halo(W + TM)
    xe = md.extend(x3s, box_diag)
    return md, x3s, xe, box_diag


def test_strip_force_matches_dense_oracle(strip_system):
    md, x3s, xe, box_diag = strip_system
    F = md.force(xe, box_diag, approx_recip=False)
    Fo = dense_oracle(x3s[:, :N].T, box_diag).T
    err = jnp.abs(F[:, :N] - Fo)
    scale = float(jnp.max(jnp.abs(Fo)))
    # cutoff-boundary inclusion flips bounded by |coef(rc)|*rc ~ 0.033
    assert float(jnp.max(err)) < 0.05
    assert float(jnp.percentile(err, 99.0)) / scale < 1e-5
    assert float(jnp.max(jnp.abs(jnp.sum(F, axis=1)))) < 1e-3
    assert float(jnp.max(jnp.abs(F[:, N:]))) == 0.0


def test_halo_guard_rejects_oversized_halo():
    md = StripLJMD(
        64, SIGMA, EPS, CUTOFF, masses_lane=np.full(64, 39.9),
        dt=0.002, gamma=1.0, kT=1.0, tm=8,
    )
    with pytest.raises(ValueError, match="double-counted"):
        md.set_halo(md.n_pad)


def _jnp_fused_step(md, x, w, F, box_diag, seed, step):
    """jnp oracle of ONE fused step (same splitmix32 noise stream)."""
    n_pad = md.n_pad
    v = w + md.dt * F * md.minv
    x = x + 0.5 * md.dt * v
    lane = (
        jnp.arange(3, dtype=jnp.uint32)[:, None] * jnp.uint32(n_pad)
        + jnp.arange(n_pad, dtype=jnp.uint32)[None, :]
    )
    base = (
        jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
        + jnp.uint32(step) * jnp.uint32(0x85EBCA6B)
    )

    def mix(z):
        z = z ^ (z >> 16)
        z = z * jnp.uint32(0x85EBCA6B)
        z = z ^ (z >> 13)
        z = z * jnp.uint32(0xC2B2AE35)
        z = z ^ (z >> 16)
        return z

    c1 = (lane * jnp.uint32(2)) * jnp.uint32(0x9E3779B9) + base
    c2 = (lane * jnp.uint32(2) + jnp.uint32(1)) * jnp.uint32(0x9E3779B9) + base
    u1 = (mix(c1) >> 8).astype(jnp.int32).astype(jnp.float32) / 16777216.0
    u2 = (mix(c2) >> 8).astype(jnp.int32).astype(jnp.float32) / 16777216.0
    u1 = jnp.maximum(u1, 1e-7)
    noise = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    v = md.a * v + md.b * md.sigv * noise
    x = x + 0.5 * md.dt * v
    Lcol = box_diag.reshape(3, 1)
    valid = jnp.arange(n_pad) < N
    x = jnp.where(valid, x - jnp.floor(x / Lcol) * Lcol, x)
    F = dense_oracle(x[:, :N].T, box_diag).T
    Fp = jnp.zeros_like(x).at[:, :N].set(F)
    return x, v, Fp


def test_strip_fused_segment_matches_jnp_step_oracle(strip_system):
    md, x3s, xe, box_diag = strip_system
    F0 = md.force(xe, box_diag, approx_recip=False)
    v0 = jnp.zeros((3, md.n_pad), jnp.float32)
    xe1, v1, F1 = md.run_segment(
        xe, v0, F0, box_diag, seed=11, step_offset=0, n_steps=2,
        approx_recip=False,
    )
    w = v0 - 0.5 * md.dt * F0 * md.minv
    x, Fc = x3s, F0
    for s in range(2):
        x, w, Fc = _jnp_fused_step(md, x, w, Fc, box_diag, seed=11, step=s)
    v = w + 0.5 * md.dt * Fc * md.minv
    assert float(jnp.max(jnp.abs(xe1[:, :N] - x[:, :N]))) < 1e-5
    assert float(jnp.max(jnp.abs(v1[:, :N] - v[:, :N]))) < 1e-4
    assert float(jnp.max(jnp.abs(F1[:, :N] - Fc[:, :N]))) < 0.05
    # halo stays consistent with the center after the segment
    H = md.H
    assert float(jnp.max(jnp.abs(
        xe1[0, md.n_pad:] - (xe1[0, :H] + box_diag[0])
    ))) < 1e-4
    assert float(jnp.max(jnp.abs(xe1[1:, md.n_pad:] - xe1[1:, :H]))) == 0.0


@pytest.mark.slow
def test_strip_runner_equilibrates_kinetic_temperature():
    from chiron_tpu import units
    from chiron_tpu.runtime import make_strip_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    # low density: the box must span enough cutoffs that the forward band
    # stays under half the ranks (the strip design domain; the N=4000
    # flagship satisfies this at liquid density)
    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.3)
    runner = make_strip_lj_runner(
        potential=fluid.potential,
        n_particles=N,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        tm=8, segment_steps=20,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=3,
    )
    state = runner.run(state, 1000)
    runner.check(state)
    v = runner.velocities(state)  # (N, 3)
    kT_kin = float(jnp.mean(39.9 * jnp.sum(v * v, axis=1)) / 3.0)
    kT = 0.00831446 * 120.0
    assert abs(kT_kin - kT) / kT < 0.15
    assert np.isfinite(float(runner.energy(state)))


def test_strip_energy_and_grad_is_negative_force(strip_system):
    """grad(energy) == -force on the STRIP engine (CLAUDE.md invariant
    'everywhere'; same custom-VJP scheme as the culled/dense paths;
    reference grad-force contract chiron/potential.py:21-24), and the
    strip single-count energy matches the jnp dense oracle."""
    md, x3s, xe, box_diag = strip_system
    F, E = md.force_energy(xe, box_diag, approx_recip=False)

    pos = x3s[:, :N].T
    ids = jnp.arange(N)
    d = pos[:, None, :] - pos[None, :, :]
    d = d - box_diag * jnp.round(d / box_diag)
    r2 = jnp.sum(d * d, -1)
    m = (r2 < CUTOFF * CUTOFF) & (ids[:, None] < ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    inv6 = ((SIGMA * SIGMA) / r2s) ** 3
    E_ref = float(jnp.sum(
        jnp.where(m, 4 * EPS * (inv6 * inv6 - inv6), 0.0)
    ))
    assert abs(float(E) - E_ref) / abs(E_ref) < 1e-5

    # the differentiable surface takes the sorted CENTER coordinates
    # (halo extension happens inside); its gradient is exactly the
    # kernel's folded force
    g = jax.grad(lambda p: md.energy_differentiable(p, box_diag))(x3s)
    assert float(jnp.max(jnp.abs(g + F))) == 0.0
