"""Halo-strip fused LJ MD kernel: the N~4000 flagship engine.

The x-sorted band insight (ops/lj_band.py) restructured for zero per-visit
overhead: with particles sorted by x, every in-cutoff partner of row tile i
lies within H forward ranks, so the whole interaction set of a row is ONE
contiguous strip of the sorted array.  The cyclic wrap is unrolled into a
rank-space halo: the array is extended by H columns replicating ranks
0..H-1 with x shifted by +Lx, so

* no minimum-image fold on x at all (the halo pre-applies the image),
* no cyclic index arithmetic, no tile-pair lists, no SMEM scalars --
  each of the nr row tiles does one static-shape (tm, tm+H) evaluation
  against a single contiguous dynamic slice,
* Newton's third law: forward-only strips + a precomputed additive
  triangle mask (BIG added to r2 for col<=row slots in the leading tile);
  reaction forces accumulate into an extended force scratch whose halo
  folds back onto ranks 0..H-1 once per step,
* padding slots carry x = 1e18 sentinels: every pair involving padding
  gets r2 ~ 1e36 and a zero coefficient with no masking logic,
* the whole BAOAB step (merged kicks, splitmix32/Box-Muller noise, drift,
  wrap, halo refresh) fuses into the same Pallas call, S steps per launch
  (state resident in VMEM; scheme shared with ops/lj_md_fused.py).

Correctness contract (checked by the runner at every rebuild):
* sorted order valid while per-particle x drift < slack/2 since the sort;
* H >= band_width_needed(x_sorted, reach=cutoff+slack) (overflow flag);
* n_pad >= 2*(tm+H) so no pair is double-counted across the wrap.

Reference parity: replaces the reference's Verlet list + per-step Python
loop (reference chiron/neighbors.py:378-908, chiron/integrators.py:174-205)
with a sort-amortized banded evaluation; the jnp dense path is the
semantic oracle (tests/test_lj_strip.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.2831853071795864
_PAD_X = 1.0e18  # padding-slot x sentinel: any pair -> r2 ~ 1e36, coef -> 0
_BIG = 1.0e18    # additive r2 mask for col<=row slots


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sort_by_key_strip(pos3: jnp.ndarray, payloads):
    """Sort the (3, n_pad) layout (and payload rows) by x.

    Padding slots must already carry the ``_PAD_X`` sentinel so they sort
    to (and stay at) the end.
    """
    operands = [pos3[0], pos3[1], pos3[2]] + list(payloads)
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    return jnp.stack(sorted_ops[0:3]), tuple(sorted_ops[3:])


_SUBW = 2048  # strip sub-block width: caps VMEM temporaries at (tm, 2048)




def _strip_force_pass(x_ref, fext_ref, n_pad, tm, H,
                      Ly, inv_Ly, Lz, inv_Lz,
                      sigma2, cutoff2, approx_recip, e_ref=None):
    """Chunked halo-strip force pass (RMW into the zeroed fext_ref).

    The (tm, tm+H) strip is processed in sub-blocks of at most _SUBW
    columns so elementwise temporaries stay bounded regardless of the band
    width (a 65k-particle band would otherwise blow VMEM).  Sub-block 0
    carries the leading-tile triangle mask (col <= row adds BIG to r2);
    later sub-blocks are pure cutoff masks.

    With ``e_ref`` (a zeroed (1, 1) SMEM scalar) the pass also
    accumulates the raw pair energy sum(i6^2 - i6) -- each unordered
    pair counted once by the triangle/halo structure; masked slots
    contribute exactly 0 because i6 underflows at r2 ~ BIG.  The caller
    scales by 4*epsilon.  ``e_ref=None`` generates the identical jaxpr
    as before (no dead carries in the force-only kernels).
    """
    strip_w = tm + H
    subw = min(_SUBW, strip_w)
    n_sub = strip_w // subw  # strip_w is rounded to a multiple at set_halo
    nr = n_pad // tm
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, subw), 1)

    def row_body(i, _):
        row0 = pl.multiple_of(i * tm, tm)
        xi = x_ref[0, pl.ds(row0, tm)].reshape(tm, 1)
        yi = x_ref[1, pl.ds(row0, tm)].reshape(tm, 1)
        zi = x_ref[2, pl.ds(row0, tm)].reshape(tm, 1)

        def sub_body(j, acc):
            if e_ref is not None:
                fx, fy, fz, et = acc
            else:
                fx, fy, fz = acc
                et = None
            col0 = pl.multiple_of(row0 + j * subw, min(tm, subw))
            xj = x_ref[0, pl.ds(col0, subw)].reshape(1, subw)
            yj = x_ref[1, pl.ds(col0, subw)].reshape(1, subw)
            zj = x_ref[2, pl.ds(col0, subw)].reshape(1, subw)
            dx = xi - xj
            dy = yi - yj
            dy = dy - Ly * jnp.floor(dy * inv_Ly + 0.5)
            dz = zi - zj
            dz = dz - Lz * jnp.floor(dz * inv_Lz + 0.5)
            r2 = dx * dx + dy * dy + dz * dz

            def with_tri(r2):
                # leading sub-block: mask col <= row (triangle + diagonal)
                return r2 + jnp.where(
                    iota_c <= iota_r, jnp.float32(_BIG), 0.0
                )

            r2 = jax.lax.cond(j == 0, with_tri, lambda r2: r2, r2)
            r2 = r2 + jnp.where(r2 < cutoff2, 0.0, jnp.float32(_BIG))
            if e_ref is not None:
                pair_ok = r2 > 0.0  # pre-clamp (see energy note below)
            r2 = jnp.maximum(r2, 1e-4 * sigma2)
            if approx_recip:
                inv = pl.reciprocal(r2, approx=True)
            else:
                # f32-exact via Newton refinement (ops/lj_cull.py
                # scheme): two steps beat the VPU's long-latency divide
                inv = pl.reciprocal(r2, approx=True)
                inv = inv * (2.0 - r2 * inv)
                inv = inv * (2.0 - r2 * inv)
            i2 = sigma2 * inv
            i6 = i2 * i2 * i2
            if e_ref is not None:
                # masked slots contribute exactly 0 (i6 underflows at
                # r2 ~ BIG), but padding-vs-padding slots have IDENTICAL
                # sentinel coordinates -> r2 == 0 exactly, which the
                # force path kills via dx == 0 and the energy path must
                # mask explicitly (pre-clamp r2 > 0).
                et = et + jnp.sum(jnp.where(pair_ok, i6 * i6 - i6, 0.0))
            coef = (2.0 * (i6 * i6) - i6) * inv  # eps folded in afterwards
            tx = coef * dx
            ty = coef * dy
            tz = coef * dz
            fext_ref[0, pl.ds(col0, subw)] = (
                fext_ref[0, pl.ds(col0, subw)] - jnp.sum(tx, axis=0)
            )
            fext_ref[1, pl.ds(col0, subw)] = (
                fext_ref[1, pl.ds(col0, subw)] - jnp.sum(ty, axis=0)
            )
            fext_ref[2, pl.ds(col0, subw)] = (
                fext_ref[2, pl.ds(col0, subw)] - jnp.sum(tz, axis=0)
            )
            fx = fx + jnp.sum(tx, axis=1, keepdims=True)
            fy = fy + jnp.sum(ty, axis=1, keepdims=True)
            fz = fz + jnp.sum(tz, axis=1, keepdims=True)
            return (fx, fy, fz, et) if e_ref is not None else (fx, fy, fz)

        z = jnp.zeros((tm, 1), jnp.float32)
        init = (
            (z, z, z, jnp.float32(0.0)) if e_ref is not None else (z, z, z)
        )
        out = jax.lax.fori_loop(0, n_sub, sub_body, init)
        fx, fy, fz = out[0:3]
        if e_ref is not None:
            e_ref[0, 0] = e_ref[0, 0] + out[3]
        fext_ref[0, pl.ds(row0, tm)] = (
            fext_ref[0, pl.ds(row0, tm)] + fx[:, 0]
        )
        fext_ref[1, pl.ds(row0, tm)] = (
            fext_ref[1, pl.ds(row0, tm)] + fy[:, 0]
        )
        fext_ref[2, pl.ds(row0, tm)] = (
            fext_ref[2, pl.ds(row0, tm)] + fz[:, 0]
        )
        return _

    jax.lax.fori_loop(0, nr, row_body, 0)

def _make_strip_md_kernel(n, n_pad, tm, H, sigma, epsilon, cutoff,
                          dt, a_coef, b_coef, approx_recip):
    sigma2 = sigma * sigma
    eps6x4 = 24.0 * epsilon
    cutoff2 = cutoff * cutoff
    strip_w = tm + H
    nr = n_pad // tm
    n_ext = n_pad + H

    def kernel(box_ref, seed_ref, off_ref, minv_ref, sigv_ref,
               x_in, v_in, f_in, x_ref, v_ref, f_ref, fext_ref):
        s = pl.program_id(0)
        Lx = box_ref[0, 0]
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]
        inv_Ly, inv_Lz = 1.0 / Ly, 1.0 / Lz

        @pl.when(s == 0)
        def _seed_state():
            # output VMEM blocks are not pre-filled from aliased inputs on
            # hardware; copy once (same scheme as ops/lj_md_fused.py)
            x_ref[...] = x_in[...]
            v_ref[...] = v_in[...]
            f_ref[...] = f_in[...]

        # ---- BAOAB phase on the center region (merged kick, O, wrap) ----
        x = x_ref[:, :n_pad]
        v = v_ref[...]
        F = f_ref[...]
        v = v + dt * F * minv_ref[...]
        x = x + (dt * 0.5) * v
        lane = (
            jax.lax.broadcasted_iota(jnp.uint32, (3, n_pad), 0)
            * jnp.uint32(n_pad)
            + jax.lax.broadcasted_iota(jnp.uint32, (3, n_pad), 1)
        )
        step = jnp.uint32(s) + off_ref[0, 0].astype(jnp.uint32)
        base = (
            seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            + step * jnp.uint32(0x85EBCA6B)
        )

        def mix(z):
            z = z ^ (z >> 16)
            z = z * jnp.uint32(0x85EBCA6B)
            z = z ^ (z >> 13)
            z = z * jnp.uint32(0xC2B2AE35)
            z = z ^ (z >> 16)
            return z

        c1 = (lane * jnp.uint32(2)) * jnp.uint32(0x9E3779B9) + base
        c2 = (lane * jnp.uint32(2) + jnp.uint32(1)) * jnp.uint32(
            0x9E3779B9
        ) + base
        u1 = (
            (mix(c1) >> 8).astype(jnp.int32).astype(jnp.float32)
            * (1.0 / 16777216.0)
        )
        u2 = (
            (mix(c2) >> 8).astype(jnp.int32).astype(jnp.float32)
            * (1.0 / 16777216.0)
        )
        u1 = jnp.maximum(u1, 1e-7)
        noise = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
        v = a_coef * v + b_coef * sigv_ref[...] * noise
        x = x + (dt * 0.5) * v
        # periodic wrap -- the padding sentinel (1e18) is unaffected:
        # floor(1e18/L)*L returns it to ~1e18 within f32 resolution, and
        # the huge magnitude is all the force pass needs
        Lcol = jnp.concatenate(
            [jnp.full((1, n_pad), Lx), jnp.full((1, n_pad), Ly),
             jnp.full((1, n_pad), Lz)], axis=0
        )
        valid = jax.lax.broadcasted_iota(jnp.int32, (3, n_pad), 1) < n
        x = jnp.where(valid, x - jnp.floor(x / Lcol) * Lcol, x)
        x_ref[:, :n_pad] = x
        v_ref[...] = v
        # halo refresh: ranks 0..H-1 shifted one +Lx image
        hx = x_ref[0, :H] + Lx
        x_ref[0, n_pad:] = hx
        x_ref[1, n_pad:] = x_ref[1, :H]
        x_ref[2, n_pad:] = x_ref[2, :H]

        # ---- halo-strip force pass (chunked) ----
        fext_ref[...] = jnp.zeros((3, n_ext), jnp.float32)
        _strip_force_pass(
            x_ref, fext_ref, n_pad, tm, H, Ly, inv_Ly, Lz, inv_Lz,
            sigma2, cutoff2, approx_recip,
        )
        # fold the halo reactions back onto ranks 0..H-1 and apply the
        # 24*eps scale once per step
        f = fext_ref[:, :n_pad]
        fold = jnp.concatenate(
            [fext_ref[:, n_pad:], jnp.zeros((3, n_pad - H), jnp.float32)],
            axis=1,
        )
        f_ref[...] = eps6x4 * (f + fold)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_steps", "tm", "H", "sigma", "epsilon",
                     "cutoff", "dt", "a_coef", "b_coef", "approx_recip",
                     "interpret"),
)
def strip_md_raw(xe, v3, f3, box_diag, seed, step_offset, minv, sigv,
                 n: int, n_steps: int, tm: int, H: int,
                 sigma: float, epsilon: float, cutoff: float, dt: float,
                 a_coef: float, b_coef: float, approx_recip: bool,
                 interpret: bool):
    """S fused BAOAB steps on the halo-strip kernel.

    ``xe``: (3, n_pad + H) extended positions (center + right halo);
    ``v3``/``f3``: (3, n_pad) center arrays.  Returns (xe, v3, f3).
    """
    n_ext = xe.shape[1]
    n_pad = n_ext - H
    kernel = _make_strip_md_kernel(n, n_pad, tm, H, sigma, epsilon, cutoff,
                                   dt, a_coef, b_coef, approx_recip)
    full = lambda s: (0, 0)
    smem = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            smem((1, 3)),                 # box
            smem((1, 1)),                 # seed
            smem((1, 1)),                 # step offset
            vmem((1, n_pad)),             # 1/m
            vmem((1, n_pad)),             # sigma_v
            vmem((3, n_ext)),             # x extended
            vmem((3, n_pad)),             # v (half-kick convention)
            vmem((3, n_pad)),             # F
        ],
        out_specs=[vmem((3, n_ext)), vmem((3, n_pad)), vmem((3, n_pad))],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_ext), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, n_ext), jnp.float32)],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )(box_diag.reshape(1, 3), seed, step_offset, minv, sigv,
      xe, v3, f3)


class StripLJMD:
    """S-step fused BAOAB segments on the halo-strip LJ kernel.

    Same half-kick (w = v - dt/2 F/m) convention and noise-stream scheme
    as ops/lj_md_fused.FusedLJMD.  The caller owns sorting, halo builds,
    and band-width checks (chiron_tpu.runtime.make_strip_lj_runner).
    """

    def __init__(self, n, sigma, epsilon, cutoff, masses_lane, dt, gamma,
                 kT, tm: int = 128, H: int = None, slack: float = 0.2,
                 interpret=None):
        self.n = n
        self.sigma, self.epsilon, self.cutoff = (
            float(sigma), float(epsilon), float(cutoff)
        )
        self.dt = float(dt)
        self.a = float(jnp.exp(-gamma * dt))
        self.b = float(jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt)))
        self.kT = float(kT)
        self.slack = float(slack)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        if not interpret:
            tm = max(tm, 128)
        self.tm = tm
        self.n_pad = _round_up(n, max(tm, 128))
        self.H = H  # resolved by the runner from the band width
        m = jnp.asarray(masses_lane, dtype=jnp.float32).reshape(1, -1)
        if m.shape[1] != self.n_pad:
            mm = jnp.ones((1, self.n_pad), jnp.float32)
            m = mm.at[0, :m.shape[1]].set(m[0])
        self.minv = 1.0 / m
        self.sigv = jnp.sqrt(self.kT / m)
        self._trimask = None

    def set_halo(self, H: int):
        """Fix the static halo width (>= band width; aligned so the strip
        splits into whole _SUBW sub-blocks when it exceeds one)."""
        H = _round_up(H, self.tm)
        if self.tm + H > _SUBW:
            H = _round_up(self.tm + H, _SUBW) - self.tm
        if self.n_pad < 2 * (self.tm + H):
            raise ValueError(
                f"halo {H} too wide for n_pad={self.n_pad}: pairs would "
                "be double-counted across the wrap -- use LJDensePallas "
                "for boxes this small"
            )
        self.H = H

    def extend(self, pos3_sorted, box_diag):
        """Build the (3, n_pad + H) extended array from sorted positions."""
        halo = pos3_sorted[:, :self.H]
        halo = halo.at[0].add(box_diag[0])
        return jnp.concatenate([pos3_sorted, halo], axis=1)

    def run_segment(self, xe, v3, f3, box_diag, seed, step_offset,
                    n_steps: int, approx_recip: bool = True):
        w_in = v3 - (0.5 * self.dt) * f3 * self.minv
        xe, w_out, f_out = strip_md_raw(
            xe, w_in, f3, box_diag,
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
            jnp.asarray(step_offset, jnp.int32).reshape(1, 1),
            self.minv, self.sigv,
            self.n, n_steps, self.tm, self.H, self.sigma, self.epsilon,
            self.cutoff, self.dt, self.a, self.b, approx_recip,
            self.interpret,
        )
        v_std = w_out + (0.5 * self.dt) * f_out * self.minv
        return xe, v_std, f_out

    def force(self, xe, box_diag, approx_recip: bool = True):
        """Standalone force over extended positions; returns (3, n_pad)."""
        return strip_force_raw(
            xe, box_diag, self.n, self.tm, self.H,
            self.sigma, self.epsilon, self.cutoff, approx_recip,
            self.interpret,
        )

    def force_energy(self, xe, box_diag, approx_recip: bool = False):
        """Force and total truncated-LJ potential in one strip pass
        (exact reciprocal by default, matching ops/lj_cull.py)."""
        return strip_force_energy_raw(
            xe, box_diag, self.n, self.tm, self.H,
            self.sigma, self.epsilon, self.cutoff, approx_recip,
            self.interpret,
        )

    def energy_differentiable(self, pos3_sorted, box_diag):
        """Strip total energy as a DIFFERENTIABLE function of the sorted
        CENTER positions (3, n_pad): the halo extension happens inside,
        and the custom-VJP gradient is exactly the negative of the
        kernel's halo-folded analytic force -- the CLAUDE.md
        ``grad(energy) == -force`` invariant on the strip engine
        (same scheme as ops/lj_cull.py; reference grad-force contract:
        chiron/potential.py:21-24).  The halo width is constant data --
        valid wherever the sorted-order invariant holds."""
        from .diff import energy_with_force_gradient

        return energy_with_force_gradient(
            lambda p: self.force_energy(
                self.extend(p, box_diag), box_diag, approx_recip=False
            ),
            pos3_sorted,
        )


@functools.partial(
    jax.jit,
    static_argnames=("n", "tm", "H", "sigma", "epsilon", "cutoff",
                     "approx_recip", "interpret"),
)
def strip_force_raw(xe, box_diag, n: int, tm: int, H: int,
                    sigma: float, epsilon: float, cutoff: float,
                    approx_recip: bool, interpret: bool):
    """Standalone halo-strip force over extended positions (oracle surface
    + initial forces); returns (3, n_pad)."""
    n_ext = xe.shape[1]
    n_pad = n_ext - H
    sigma2 = sigma * sigma
    eps6x4 = 24.0 * epsilon
    cutoff2 = cutoff * cutoff

    def kernel(box_ref, x_ref, f_ref, fext_ref):
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]
        fext_ref[...] = jnp.zeros((3, n_ext), jnp.float32)
        _strip_force_pass(
            x_ref, fext_ref, n_pad, tm, H, Ly, 1.0 / Ly, Lz, 1.0 / Lz,
            sigma2, cutoff2, approx_recip,
        )
        f = fext_ref[:, :n_pad]
        fold = jnp.concatenate(
            [fext_ref[:, n_pad:], jnp.zeros((3, n_pad - H), jnp.float32)],
            axis=1,
        )
        f_ref[...] = eps6x4 * (f + fold)

    smem = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    vmem = lambda shape=None: (
        pl.BlockSpec(memory_space=pltpu.VMEM) if shape is None
        else pl.BlockSpec(shape, memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        in_specs=[smem((1, 3)), vmem()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, n_ext), jnp.float32)],
        interpret=interpret,
    )(box_diag.reshape(1, 3), xe)


@functools.partial(
    jax.jit,
    static_argnames=("n", "tm", "H", "sigma", "epsilon", "cutoff",
                     "approx_recip", "interpret"),
)
def strip_force_energy_raw(xe, box_diag, n: int, tm: int, H: int,
                           sigma: float, epsilon: float, cutoff: float,
                           approx_recip: bool, interpret: bool):
    """Halo-strip force AND total truncated-LJ potential in one pass;
    returns ((3, n_pad) folded force, scalar energy)."""
    n_ext = xe.shape[1]
    n_pad = n_ext - H
    sigma2 = sigma * sigma
    eps4 = 4.0 * epsilon
    eps6x4 = 24.0 * epsilon
    cutoff2 = cutoff * cutoff

    def kernel(box_ref, x_ref, f_ref, e_ref, fext_ref):
        Ly = box_ref[0, 1]
        Lz = box_ref[0, 2]
        fext_ref[...] = jnp.zeros((3, n_ext), jnp.float32)
        e_ref[0, 0] = jnp.float32(0.0)
        _strip_force_pass(
            x_ref, fext_ref, n_pad, tm, H, Ly, 1.0 / Ly, Lz, 1.0 / Lz,
            sigma2, cutoff2, approx_recip, e_ref=e_ref,
        )
        f = fext_ref[:, :n_pad]
        fold = jnp.concatenate(
            [fext_ref[:, n_pad:], jnp.zeros((3, n_pad - H), jnp.float32)],
            axis=1,
        )
        f_ref[...] = eps6x4 * (f + fold)
        e_ref[0, 0] = eps4 * e_ref[0, 0]

    smem = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    vmem = lambda shape=None: (
        pl.BlockSpec(memory_space=pltpu.VMEM) if shape is None
        else pl.BlockSpec(shape, memory_space=pltpu.VMEM)
    )
    f, e = pl.pallas_call(
        kernel,
        in_specs=[smem((1, 3)), vmem()],
        out_specs=[vmem(), smem((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, n_ext), jnp.float32)],
        interpret=interpret,
    )(box_diag.reshape(1, 3), xe)
    return f, e[0, 0]
