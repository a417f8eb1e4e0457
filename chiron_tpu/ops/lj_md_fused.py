"""Whole-trajectory fused MD kernel: S BAOAB steps in ONE Pallas call.

The end point of the TPU-native design: positions, velocities, and forces
stay resident in VMEM for the entire segment; each Langevin step is a few
grid programs of the same kernel -- no XLA op boundaries, no HBM round
trips, no scan glue.  Per (step s, tile t) program:

* t == 0: full BAOAB update for all particles using the force accumulated
  at step s-1 (the two dt/2 half-kicks around the force evaluation merge
  into one full kick because both use the same F), the O-step noise drawn
  from the on-chip PRNG (Box-Muller over ``pltpu.prng_random_bits``), the
  A-drifts and the periodic wrap; then the force accumulator is zeroed.
* every t: the Newton's-third-law triangle force tile for row block t.

The trailing half-step asymmetry of BAOAB is restored by the caller: the
kernel evolves (x, v_half) where v_half = v + dt/2 F/m; ``FusedLJMD.run``
applies the leading/trailing half-kicks outside so the returned state is
the standard (x, v, F) at the same time point as the scan-based integrator.

RNG note: the noise stream is the TPU hardware PRNG seeded per (seed, step),
not jax.random's threefry -- trajectories are deterministic in the seed but
differ stream-wise from the unfused runner (SURVEY.md section 6 golden
policy applies per path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.2831853071795864


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_md_kernel(n: int, n_pad: int, tm: int, n_steps: int,
                    sigma: float, epsilon: float, cutoff: float,
                    dt: float, a_coef: float, b_coef: float):
    sigma2 = sigma * sigma
    eps4 = 4.0 * epsilon
    cutoff2 = cutoff * cutoff
    n_tiles = n_pad // tm

    def kernel(box_ref, seed_ref, off_ref, kT_ref, minv_ref, sigv_ref,
               x_in, v_in, f_in, x_ref, v_ref, f_ref):
        s = pl.program_id(0)
        t = pl.program_id(1)
        Lx = box_ref[0, 0]
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]

        # The output VMEM blocks are NOT pre-filled from their aliased
        # inputs on hardware (interpret mode does fill them): copy once.
        @pl.when((s == 0) & (t == 0))
        def _seed_state():
            x_ref[...] = x_in[...]
            v_ref[...] = v_in[...]
            f_ref[...] = f_in[...]

        @pl.when(t == 0)
        def _update():
            # one full BAOAB update for every particle (VPU, whole arrays)
            x = x_ref[...]
            v = v_ref[...]
            F = f_ref[...]
            minv = minv_ref[...]
            sigv = sigv_ref[...]
            # full kick with the freshly accumulated force (the merged
            # dt/2 + dt/2 halves around the force evaluation)
            v = v + dt * F * minv
            x = x + (dt * 0.5) * v
            # O step: Box-Muller normals from a counter-based in-kernel RNG
            # (splitmix32/murmur3 finalizer over (seed, step, lane)); works
            # identically on TPU hardware and in interpret mode, and is
            # deterministic across backends.
            lane = (
                jax.lax.broadcasted_iota(jnp.uint32, (3, n_pad), 0)
                * jnp.uint32(n_pad)
                + jax.lax.broadcasted_iota(jnp.uint32, (3, n_pad), 1)
            )
            step = jnp.uint32(s) + off_ref[0, 0].astype(jnp.uint32)
            base = (
                seed_ref[0, 0].astype(jnp.uint32)
                * jnp.uint32(0x9E3779B9)
                + step * jnp.uint32(0x85EBCA6B)
            )

            def mix(z):
                z = z ^ (z >> 16)
                z = z * jnp.uint32(0x85EBCA6B)
                z = z ^ (z >> 13)
                z = z * jnp.uint32(0xC2B2AE35)
                z = z ^ (z >> 16)
                return z

            # splitmix32: disjoint counters (2*lane, 2*lane+1) so the two
            # Box-Muller uniforms are independent draws, not a function of
            # one another.
            c1 = (lane * jnp.uint32(2)) * jnp.uint32(0x9E3779B9) + base
            c2 = (lane * jnp.uint32(2) + jnp.uint32(1)) * jnp.uint32(
                0x9E3779B9
            ) + base
            bits1 = mix(c1)
            bits2 = mix(c2)
            # >>8 keeps 24 bits so the value fits int32 (Mosaic cannot cast
            # uint32 -> f32 directly)
            u1 = (
                (bits1 >> 8).astype(jnp.int32).astype(jnp.float32)
                * (1.0 / 16777216.0)
            )
            u2 = (
                (bits2 >> 8).astype(jnp.int32).astype(jnp.float32)
                * (1.0 / 16777216.0)
            )
            u1 = jnp.maximum(u1, 1e-7)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            noise = r * jnp.cos(_TWO_PI * u2)
            v = a_coef * v + b_coef * sigv * noise
            x = x + (dt * 0.5) * v
            # periodic wrap
            Lcol = jnp.concatenate(
                [jnp.full((1, n_pad), Lx), jnp.full((1, n_pad), Ly),
                 jnp.full((1, n_pad), Lz)], axis=0
            )
            x = x - jnp.floor(x / Lcol) * Lcol
            x_ref[...] = x
            v_ref[...] = v
            f_ref[...] = jnp.zeros((3, n_pad), jnp.float32)

        # ---- triangle force accumulation for row tile t ----
        row0 = t * tm
        xi = x_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
        yi = x_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
        zi = x_ref[2, pl.ds(row0, tm)].reshape(tm, 1)
        rid = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        rvalid = rid < n

        def body(j, acc):
            fx, fy, fz = acc
            col0 = j * tm
            xj = x_ref[0, pl.ds(col0, tm)].reshape(1, tm)
            yj = x_ref[1, pl.ds(col0, tm)].reshape(1, tm)
            zj = x_ref[2, pl.ds(col0, tm)].reshape(1, tm)
            cid = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tm), 1)
            diagonal = j == t
            pm = rvalid & (cid < n) & (rid != cid)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - Lx * jnp.floor(dx / Lx + 0.5)
            dy = dy - Ly * jnp.floor(dy / Ly + 0.5)
            dz = dz - Lz * jnp.floor(dz / Lz + 0.5)
            r2 = dx * dx + dy * dy + dz * dz
            m = (r2 < cutoff2) & pm
            r2s = jnp.maximum(r2, 1e-4 * sigma2)
            inv = pl.reciprocal(r2s, approx=True)
            i2 = sigma2 * inv
            i6 = i2 * i2 * i2
            coef = jnp.where(
                m, (6.0 * eps4) * (2.0 * i6 * i6 - i6) * inv, 0.0
            )
            tx = coef * dx
            ty = coef * dy
            tz = coef * dz
            fx = fx + jnp.sum(tx, axis=1, keepdims=True)
            fy = fy + jnp.sum(ty, axis=1, keepdims=True)
            fz = fz + jnp.sum(tz, axis=1, keepdims=True)

            @pl.when(jnp.logical_not(diagonal))
            def _():
                f_ref[0, pl.ds(col0, tm)] = (
                    f_ref[0, pl.ds(col0, tm)] - jnp.sum(tx, axis=0)
                )
                f_ref[1, pl.ds(col0, tm)] = (
                    f_ref[1, pl.ds(col0, tm)] - jnp.sum(ty, axis=0)
                )
                f_ref[2, pl.ds(col0, tm)] = (
                    f_ref[2, pl.ds(col0, tm)] - jnp.sum(tz, axis=0)
                )
            return fx, fy, fz

        z = jnp.zeros((tm, 1), jnp.float32)
        fx, fy, fz = jax.lax.fori_loop(t, n_tiles, body, (z, z, z))
        f_ref[0, pl.ds(row0, tm)] = f_ref[0, pl.ds(row0, tm)] + fx[:, 0]
        f_ref[1, pl.ds(row0, tm)] = f_ref[1, pl.ds(row0, tm)] + fy[:, 0]
        f_ref[2, pl.ds(row0, tm)] = f_ref[2, pl.ds(row0, tm)] + fz[:, 0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_steps", "sigma", "epsilon", "cutoff", "tm",
                     "dt", "a_coef", "b_coef", "interpret"),
)
def fused_md_raw(x3, v3, f3, box_diag, seed, step_offset, kT, minv, sigv,
                 n: int, n_steps: int, sigma: float, epsilon: float,
                 cutoff: float, tm: int, dt: float, a_coef: float,
                 b_coef: float, interpret: bool):
    n_pad = x3.shape[1]
    kernel = _make_md_kernel(n, n_pad, tm, n_steps, sigma, epsilon, cutoff,
                             dt, a_coef, b_coef)
    grid = (n_steps, n_pad // tm)
    full = lambda s, t: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), full, memory_space=pltpu.SMEM),   # box
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),   # offset
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),   # kT
            pl.BlockSpec((1, n_pad), full, memory_space=pltpu.VMEM),  # 1/m
            pl.BlockSpec((1, n_pad), full, memory_space=pltpu.VMEM),  # sigv
            pl.BlockSpec((3, n_pad), full, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((3, n_pad), full, memory_space=pltpu.VMEM),  # v
            pl.BlockSpec((3, n_pad), full, memory_space=pltpu.VMEM),  # F
        ],
        out_specs=[
            pl.BlockSpec((3, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_pad), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2},
        interpret=interpret,
    )(box_diag, seed, step_offset, kT, minv, sigv, x3, v3, f3)
    return out


class FusedLJMD:
    """S-step fused BAOAB Langevin segments on the dense LJ kernel.

    >>> md = FusedLJMD(n, sigma, eps, cutoff, masses, dt, gamma, kT)
    >>> x3, v3, f3 = md.run(x3, v3, f3, box_diag, seed=1, n_steps=1000)
    >>> # continue the SAME noise stream in the next segment:
    >>> x3, v3, f3 = md.run(x3, v3, f3, box_diag, seed=1, n_steps=1000,
    ...                     step_offset=1000)
    """

    def __init__(self, n, sigma, epsilon, cutoff, masses_lane, dt, gamma, kT,
                 tm: int = 512, interpret=None):
        self.n = n
        self.sigma, self.epsilon, self.cutoff = (
            float(sigma), float(epsilon), float(cutoff)
        )
        self.dt = float(dt)
        self.a = float(jnp.exp(-gamma * dt))
        self.b = float(jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt)))
        self.kT = float(kT)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if not interpret:
            tm = max(tm, 128)
        self.tm = tm
        self.interpret = interpret
        self.n_pad = _round_up(n, tm)
        m = jnp.asarray(masses_lane, dtype=jnp.float32).reshape(1, -1)
        if m.shape[1] != self.n_pad:
            mm = jnp.ones((1, self.n_pad), jnp.float32)
            m = mm.at[0, :m.shape[1]].set(m[0])
        self.minv = 1.0 / m
        self.sigv = jnp.sqrt(self.kT / m)

    def run(self, x3, v3, f3, box_diag, seed: int, n_steps: int,
            step_offset: int = 0):
        """Advance ``n_steps``; returns (x3, v3, f3) in BAOAB convention.

        ``step_offset`` advances the per-step noise counter so consecutive
        segments with the same seed draw fresh noise (pass the cumulative
        step count); alternatively vary the seed per segment.

        The kernel's merged-kick scheme evolves v_half; convert on the way
        in/out so callers see the standard half-kick-synchronized velocity.
        """
        dt = self.dt
        # The kernel evolves w_k = v_k - dt/2 F_k/m (velocity before the
        # trailing half-kick): its per-step full kick w + dt F/m then equals
        # the scan integrator's B-O...-B composition exactly.
        w_in = v3 - (0.5 * dt) * f3 * self.minv
        seed_arr = jnp.asarray([[seed]], dtype=jnp.int32)
        offset_arr = jnp.asarray([[step_offset]], dtype=jnp.int32)
        kT_arr = jnp.asarray([[self.kT]], dtype=jnp.float32)
        x3, w_out, f_out = fused_md_raw(
            x3, w_in, f3, box_diag, seed_arr, offset_arr, kT_arr, self.minv,
            self.sigv,
            self.n, n_steps, self.sigma, self.epsilon, self.cutoff, self.tm,
            dt, self.a, self.b, self.interpret,
        )
        # exit: v_S = w_S + dt/2 F_S/m restores the standard convention.
        v_std = w_out + (0.5 * dt) * f_out * self.minv
        return x3, v_std, f_out
