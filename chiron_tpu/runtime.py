"""Zero-overhead simulation runners for production/benchmark use.

The class-based `LangevinIntegrator` carries reference-parity reporting and
unit plumbing; this module exposes the bare compiled core -- build once, then
``run(state, n_steps)`` is a single XLA dispatch regardless of step count.
This is the entry point the benchmark (bench.py) and the graft driver use.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as _dc_replace
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import units
from .integrators import LangevinCarry, make_baoab_step_fn, run_chunk
from .neighbors import NeighborListNsqrd, PairListNsqrd
from .utils import initialize_velocities_md


@dataclass
class LangevinRunner:
    """Compiled Langevin propagator: ``state = runner.run(state, n)``."""

    step_fn: Callable
    energy_fn: Callable
    masses: jnp.ndarray
    temperature_md: float
    pairs: object

    def init(
        self,
        positions,
        box_vectors=None,
        seed: int = 0,
        velocities=None,
    ) -> LangevinCarry:
        """Build the initial carry: velocities, neighbor state, forces."""
        x = jnp.asarray(positions, dtype=jnp.float32)
        box = None if box_vectors is None else jnp.asarray(
            box_vectors, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(seed)
        if velocities is None:
            key, vkey = jax.random.split(key)
            v = initialize_velocities_md(self.temperature_md, self.masses, vkey)
        else:
            v = jnp.asarray(velocities, dtype=jnp.float32)

        from .neighbors import DensePairs as _DensePairs

        if isinstance(self.pairs, (NeighborListNsqrd, PairListNsqrd,
                                   _DensePairs)):
            self.pairs.build(x, box)
            nbr_state = self.pairs.state
        else:
            nbr_state = None

        force_fn = jax.jit(jax.grad(lambda p, s: -self.energy_fn(p, s)))
        return LangevinCarry(
            x=x,
            v=v,
            F=force_fn(x, nbr_state),
            key=key,
            nbr_state=nbr_state,
            box_vectors=box,
            overflowed=jnp.asarray(False),
        )

    def run(self, state: LangevinCarry, n_steps: int) -> LangevinCarry:
        """Advance ``n_steps``; one compiled scan, no host work."""
        return run_chunk(self.step_fn, state, n_steps)

    def energy(self, state: LangevinCarry):
        return self.energy_fn(state.x, state.nbr_state)


def make_fast_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 512,
    exact_forces: bool = False,
) -> LangevinRunner:
    """Optimized LJ Langevin runner using the fused dense Pallas kernel.

    No neighbor list, no rebuild logic: the Pallas kernel evaluates all pairs
    with minimum-image PBC in one fused pass (chiron_tpu.ops.lj_dense).  The
    exact-force custom VJP keeps ``jax.grad`` semantics identical to the
    reference's autodiff force (reference chiron/potential.py:21-24).

    ``exact_forces=False`` (default) uses the VPU fast reciprocal in the
    stepping path (~6e-5 relative force error, far below the Langevin noise
    floor); energies are always computed exactly.
    """
    from .ops.lj_dense import LJDensePallas

    if topology is None:
        topology = potential.topology
    masses_1d = jnp.asarray(topology.masses(), dtype=jnp.float32)
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    op = LJDensePallas(
        n=n_particles,
        sigma=potential.sigma,
        epsilon=potential.epsilon,
        cutoff=potential.cutoff,
        tm=tm,
        tn=tm,  # triangle kernel uses square tiles; keep padding minimal
    )
    n_pad = op.n_pad

    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt))
    dt_ = jnp.float32(dt)

    # State lives natively in the kernel's (3, n_pad) layout: the lane axis
    # is the particle axis (full VPU width on every elementwise step op) and
    # the force kernel consumes it with zero copies or transposes.
    m_lane = jnp.ones((1, n_pad), dtype=jnp.float32)
    m_lane = m_lane.at[0, :n_particles].set(masses_1d)
    sigma_v_lane = jnp.sqrt(kT / m_lane)

    def step_fn(carry: LangevinCarry, _=None):
        key, subkey = jax.random.split(carry.key)
        x, v, F = carry.x, carry.v, carry.F  # all (3, n_pad)
        box_diag = carry.box_vectors  # (1, 3)
        v = v + (dt_ * 0.5) * F / m_lane
        x = x + (dt_ * 0.5) * v
        noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
        v = a * v + b * sigma_v_lane * noise
        x = x + (dt_ * 0.5) * v
        Lcol = box_diag.reshape(3, 1)
        x = x - jnp.floor(x / Lcol) * Lcol  # periodic wrap
        F = op.force_only_t(x, box_diag, approx_recip=not exact_forces)
        v = v + (dt_ * 0.5) * F / m_lane
        return (
            LangevinCarry(
                x=x, v=v, F=F, key=key, nbr_state=None,
                box_vectors=box_diag, overflowed=carry.overflowed,
            ),
            None,
        )

    runner = LangevinRunner(
        step_fn=step_fn,
        energy_fn=lambda x, s: op.energy(x, s),
        masses=masses_1d[:, None],
        temperature_md=T,
        pairs=None,
    )

    def init(positions, box_vectors, seed: int = 0, velocities=None):
        x3 = op.pad_positions(jnp.asarray(positions, dtype=jnp.float32))
        box_diag = jnp.diagonal(
            jnp.asarray(box_vectors, dtype=jnp.float32)
        ).reshape(1, 3)
        key = jax.random.PRNGKey(seed)
        if velocities is None:
            key, vkey = jax.random.split(key)
            v3 = sigma_v_lane * jax.random.normal(vkey, (3, n_pad))
        else:
            v3 = op.pad_positions(jnp.asarray(velocities, dtype=jnp.float32))
        F3 = op.force_only_t(x3, box_diag, approx_recip=not exact_forces)
        return LangevinCarry(
            x=x3, v=v3, F=F3, key=key, nbr_state=None, box_vectors=box_diag,
            overflowed=jnp.asarray(False),
        )

    runner.init = init
    runner.energy = lambda state: op.force_energy_t(
        state.x, state.box_vectors
    )[1]
    runner.positions = lambda state: op.unpad(state.x)
    runner.velocities = lambda state: op.unpad(state.v)
    runner.op = op
    return runner


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "key", "ref_x", "box_diag", "overflowed"],
    meta_fields=[],
)
@dataclass
class BandCarry:
    """Carry of the banded large-N runner (x-sorted (3, n_pad) layout)."""

    x: jnp.ndarray
    v: jnp.ndarray
    F: jnp.ndarray
    key: jnp.ndarray
    ref_x: jnp.ndarray  # (n_pad,) x at the last sort (staleness reference)
    box_diag: jnp.ndarray  # (1, 3)
    overflowed: jnp.ndarray  # () bool


def make_band_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 256,
    margin: float = 0.15,
):
    """Banded (x-sorted) LJ Langevin runner for large N (>= ~16k).

    Particles are kept sorted by x; the force kernel evaluates only the
    cyclic rank band that can contain in-cutoff pairs (BENCH.md: 1.7x at
    N=16k, 3.4x at N=65k over the dense kernel).  A ``lax.cond`` inside the
    scan re-sorts the whole state (multi-operand ``lax.sort``) whenever any
    particle's x has drifted past the margin since the last sort.

    NOTE: the particle *order* is an internal degree of freedom -- identical
    LJ particles are permuted by re-sorts.  ``runner.positions(state)``
    returns the current internal order.
    """
    from .ops.lj_band import LJBandPallas, band_width_needed, sort_by_x

    if topology is None:
        topology = potential.topology
    masses_host = topology.masses()
    if not np.allclose(masses_host, masses_host[0]):
        raise ValueError(
            "the banded runner permutes particle order and therefore "
            "requires identical masses"
        )
    mass0 = float(masses_host[0])
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    band = LJBandPallas(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        margin=margin, tm=tm,
    )
    n_pad = band.n_pad
    # matching-padding dense op for pad/unpad helpers + exact energies
    from .ops.lj_dense import LJDensePallas

    dense = LJDensePallas(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        tm=min(512, tm if tm >= 128 else 128), tn=min(512, tm if tm >= 128 else 128),
        n_pad=n_pad,
    )

    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt))
    sigma_v = jnp.float32(np.sqrt(kT / mass0))
    dt_ = jnp.float32(dt)
    m = jnp.float32(mass0)
    n = n_particles
    reach = band.reach
    valid_lane = (jnp.arange(n_pad) < n)

    def make_step_fn(w: int):
        def step(carry: BandCarry, _=None):
            key, subkey = jax.random.split(carry.key)
            x, v, F = carry.x, carry.v, carry.F
            box_diag = carry.box_diag
            Lx = box_diag[0, 0]
            v = v + (dt_ * 0.5) * F / m
            x = x + (dt_ * 0.5) * v
            noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
            v = a * v + b * sigma_v * noise
            x = x + (dt_ * 0.5) * v
            Lcol = box_diag.reshape(3, 1)
            x = x - jnp.floor(x / Lcol) * Lcol

            # staleness: cyclic x drift since the last sort
            dx = x[0] - carry.ref_x
            dx = dx - Lx * jnp.round(dx / Lx)
            stale = jnp.any(jnp.where(valid_lane, jnp.abs(dx), 0.0) >= margin)

            def do_resort(args):
                x, v, overflowed = args
                xs, payloads = sort_by_x(x, (v[0], v[1], v[2]), n)
                v2 = jnp.stack(payloads)
                w_needed = band_width_needed(
                    jnp.where(valid_lane, xs[0], jnp.float32(3.0e38)),
                    n, reach, Lx,
                )
                overflowed = overflowed | (w_needed > w)
                return xs, v2, xs[0], overflowed

            def no_resort(args):
                x, v, overflowed = args
                return x, v, carry.ref_x, overflowed

            x, v, ref_x, overflowed = jax.lax.cond(
                stale, do_resort, no_resort, (x, v, carry.overflowed)
            )
            F = band.force(x, box_diag, approx_recip=True)
            v = v + (dt_ * 0.5) * F / m
            return (
                BandCarry(
                    x=x, v=v, F=F, key=key, ref_x=ref_x, box_diag=box_diag,
                    overflowed=overflowed,
                ),
                None,
            )

        return step

    class BandRunner:
        def init(self, positions, box_vectors, seed: int = 0):
            x3 = dense.pad_positions(jnp.asarray(positions, dtype=jnp.float32))
            box_diag = jnp.diagonal(
                jnp.asarray(box_vectors, dtype=jnp.float32)
            ).reshape(1, 3)
            x3s, _ = sort_by_x(x3, (), n)
            band.calibrate(x3s, float(box_diag[0, 0]))
            self.step_fn = make_step_fn(band.w)
            key = jax.random.PRNGKey(seed)
            key, vkey = jax.random.split(key)
            v3 = sigma_v * jax.random.normal(vkey, (3, n_pad))
            F3 = band.force(x3s, box_diag, approx_recip=True)
            return BandCarry(
                x=x3s, v=v3, F=F3, key=key, ref_x=x3s[0], box_diag=box_diag,
                overflowed=jnp.asarray(False),
            )

        def run(self, state: BandCarry, n_steps: int) -> BandCarry:
            return band_run_chunk(self.step_fn, state, n_steps)

        def check(self, state: BandCarry):
            """Raise if the calibrated band width overflowed mid-run --
            the same contract as CulledRunner/StripRunner.check() (silently
            stale bands would omit in-cutoff pairs)."""
            if bool(state.overflowed):
                raise RuntimeError(
                    "band runner invariant violated (band width exceeded "
                    "the calibrated w after a density fluctuation) -- "
                    "increase margin and re-run"
                )

        def energy(self, state: BandCarry):
            return dense.force_energy_t(state.x, state.box_diag)[1]

        def positions(self, state: BandCarry):
            return dense.unpad(state.x)

        def velocities(self, state: BandCarry):
            return dense.unpad(state.v)

    runner = BandRunner()
    runner.band = band
    runner.dense = dense
    return runner


@partial(jax.jit, static_argnames=("step_fn", "n_steps"))
def band_run_chunk(step_fn, carry, n_steps: int):
    carry, _ = jax.lax.scan(step_fn, carry, length=n_steps)
    return carry



def _top2_drift(dxs, valid_lane):
    """Sum of the two largest per-particle displacements (squared inputs).

    The tile-skin condition is pairwise: a pair outside reach at build time
    can only enter the cutoff if the SUM of the two particles' drifts
    exceeds the slack, so the correct (and far less brittle) invariant is
    drift_1 + drift_2 <= slack -- a single hot particle cannot violate it
    alone (one melt-transient outlier otherwise flags a healthy run).
    """
    d = jnp.sqrt(jnp.where(valid_lane, jnp.sum(dxs * dxs, axis=0), 0.0))
    i1 = jnp.argmax(d)
    m1 = d[i1]
    m2 = jnp.max(jnp.where(jnp.arange(d.shape[0]) == i1, -jnp.inf, d))
    return m1 + m2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "step", "box_diag", "overflowed", "pairs",
                 "x_anchor"],
    meta_fields=[],
)
@dataclass
class CullCarry:
    """Carry of the culled tile-pair runner (spatially sorted layout).

    ``pairs`` is the live tile-pair Verlet list and ``x_anchor`` the
    positions it was built from: the list stays valid while the top-2
    joint drift from the anchor is under the slack (checked every
    segment), which lets the runner re-sort and rebuild on a cadence
    instead of every segment.
    """

    x: jnp.ndarray          # (3, n_pad)
    v: jnp.ndarray          # (3, n_pad)
    F: jnp.ndarray          # (3, n_pad)
    step: jnp.ndarray       # (1, 1) int32 cumulative step count (noise ctr)
    box_diag: jnp.ndarray   # (1, 3)
    overflowed: jnp.ndarray  # () bool: list capacity/shift/drift violation
    pairs: object           # TilePairList (device arrays)
    x_anchor: jnp.ndarray   # (3, n_pad) positions at last list rebuild


def _culled_layout_init(md, dense, positions, box_vectors, sort_mode, n):
    """Spatial-layout init shared by the culled NVT and NpT runners:
    resolve the sort mode/slab count from the box geometry, sort, probe
    the tile-pair count, and build the production list with 2x headroom.

    Returns ``(x3s, box_diag, nslab, capacity, pairs)``; raises
    ValueError when the box/cutoff geometry cannot satisfy the kernel's
    constant-x-frame bound (use the dense runner instead)."""
    from .ops.lj_cull import build_tile_pairs, slab_y_key, sort_by_key

    x3 = dense.pad_positions(jnp.asarray(positions, jnp.float32))
    box_diag = jnp.diagonal(
        jnp.asarray(box_vectors, jnp.float32)
    ).reshape(1, 3)
    Lx = float(box_diag[0, 0])
    # minimum-image validity needs EVERY axis at least 2 reaches wide
    # (listed pairs within cutoff+slack must have a unique nearest image);
    # checking Lx alone would let anisotropic boxes with a thin y/z axis
    # through with silently wrong per-pair min-image energies
    L_min = float(np.min(np.asarray(box_diag)))
    if 0.5 * L_min - md.cutoff - md.slack <= 0:
        raise ValueError(
            "culled runner inapplicable: box under ~2 reaches "
            "(cutoff+slack) wide on its narrowest axis -- use "
            "make_fast_lj_runner instead"
        )
    headroom = 0.5 * Lx - md.cutoff - md.slack  # x-frame bound, slab sizing
    mode = sort_mode
    if mode == "auto":
        # measured crossover (BENCH.md): the (x-slab, y) key wins
        # once the box is ~6.5 reaches wide (slots -40% at N=16k,
        # 2,350 -> 2,750 steps/s); below that the 128-lane tiles
        # are too coarse for 2D culling and pure-x wins (N=4000)
        mode = "slab" if Lx / (md.cutoff + md.slack) >= 6.5 else "x"
    if mode == "x":
        # pure x sort: tiles are thin x-slabs (~tm/n of the box),
        # so the x-frame bound holds with large margin for any
        # homogeneous system; the init probe + per-rebuild check
        # below latch violations regardless
        nslab = 0
    else:
        # slab width ~0.72 cutoff measured optimal for bbox
        # culling; the x-frame bound requires the worst-case tile
        # x-extent (2 slab widths: a straddling tile) to fit under
        # L/2 - cutoff - slack, so take the thinner of the two
        nslab_perf = max(1, int(round(Lx / (0.72 * md.cutoff))))
        nslab_geom = int(np.ceil(2.0 * Lx / headroom))
        nslab = max(nslab_perf, nslab_geom)
        # a tile straddles at most 2 slabs only while slab
        # occupancy stays above the tile size (2x headroom); the
        # per-rebuild shift_bad check latches actual violations
        if nslab > max(1, n // (2 * max(md.tm, md.tn))):
            raise ValueError(
                "culled runner inapplicable: satisfying the "
                f"x-shift bound needs {nslab} slabs but slab "
                "occupancy would drop below 2 tiles -- use "
                "sort_mode='x' or make_fast_lj_runner"
            )
    key = slab_y_key(x3, n, nslab, Lx, Ly=float(box_diag[0, 1]))
    x3s, _ = sort_by_key(key, x3, ())
    # capacity: exact upper bound first, then tight + headroom
    n_pad = md.n_pad
    nr, nc = n_pad // md.tm, n_pad // md.tn
    cap_max = nr * nc  # exact bound: every rect at most once
    probe = build_tile_pairs(
        x3s, n, md.tm, md.tn, box_diag[0], md.cutoff, md.slack,
        capacity=cap_max,
    )
    if bool(probe.overflowed):
        raise ValueError(
            "culled runner inapplicable to this box/cutoff (the "
            "x/y shift bound is violated at init: hardware-size tiles "
            "span too much of a box this few cutoffs wide) -- use the "
            "dense engines instead (make_fast_lj_runner for NVT, "
            "make_npt_lj_runner for NpT)"
        )
    # 2x headroom: ordered (e.g. lattice) initial configurations
    # disorder into liquids with fatter tile bboxes
    count = int(probe.count[0, 0])
    capacity = min(cap_max, int(count * 2.0) + 128)
    # the production list is a PREFIX SLICE of the probe list (entries
    # are front-packed and count <= capacity), so no second
    # build_tile_pairs program needs compiling -- the axon remote
    # compiler charges seconds per distinct program (compile diet,
    # VERDICT r3 item 9)
    pairs = probe._replace(
        rows=probe.rows[:, :capacity],
        cols=probe.cols[:, :capacity],
        ccx=probe.ccx[:, :capacity],
        ptr2=jnp.minimum(probe.ptr2, capacity),
        count=jnp.minimum(probe.count, capacity),
    )
    return x3s, box_diag, nslab, capacity, pairs


def _culled_engine_setup(potential, n_particles, temperature, timestep,
                         collision_rate, topology, tm, tn, slack,
                         unroll, mxu_reduce=False, prefetch=False):
    """Engine construction shared by the culled NVT and NpT factories:
    identical-mass check, MD-unit stripping, common kernel/dense padding,
    and the CulledLJMD + matching LJDensePallas instances.

    Returns ``(md, dense, kT, dt, gamma, masses_host)``."""
    from .ops.lj_cull import CulledLJMD
    from .ops.lj_dense import LJDensePallas

    if topology is None:
        topology = potential.topology
    masses_host = topology.masses()
    if not np.allclose(masses_host, masses_host[0]):
        raise ValueError(
            "the culled runner permutes particle order and therefore "
            "requires identical masses"
        )
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    # common padding: kernel tiles AND the dense energy op's 128 lanes
    import math as _math

    _gran = _math.lcm(128, tm, tn)
    common_pad = _gran * ((n_particles + _gran - 1) // _gran)
    md = CulledLJMD(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        masses_lane=np.asarray(masses_host, dtype=np.float32),
        dt=dt, gamma=gamma, kT=kT, tm=tm, tn=tn, slack=slack,
        n_pad=common_pad, unroll=unroll, mxu_reduce=mxu_reduce,
        prefetch=prefetch,
    )
    dense = LJDensePallas(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        tm=128, tn=128, n_pad=md.n_pad,
    )
    return md, dense, kT, dt, gamma, masses_host


def make_culled_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 128,
    tn: int = 256,
    slack: float = 0.3,
    segment_steps: int = 50,
    sort_mode: str = "auto",
    seed_default: int = 0,
    exact_forces: bool = False,
    sort_every: int = 1,
    rebuild_every: int = 1,
    unroll: int = 4,
    mxu_reduce: bool = False,
    fused_rebuild: bool = False,
    prefetch: bool = False,
    megakernel: bool = False,
    repair_passes: int = 16,
):
    """Culled tile-pair fused LJ runner: the N~4000 flagship engine.

    With ``megakernel=True`` (pure-x sort regime only) each segment is
    ONE Pallas call with ZERO per-segment XLA ops: the tile-pair list is
    built in-kernel into SMEM scratch at grid step 0, the tile-skin
    drift check runs at the final step, and the spatial order is
    repaired by ``repair_passes`` odd-even transposition passes instead
    of a full XLA re-sort (ops/lj_mega.py; the capacity/shift/drift
    latches guard every invariant regardless of residual disorder).

    Each ``segment_steps``-step segment is ONE fused Pallas call (BAOAB +
    culled force, state resident in VMEM).  The whole ``run(state, n)`` is
    a single ``lax.scan`` over segments -- one XLA dispatch regardless of
    step count (ops/lj_cull.py for the kernel design and exactness
    argument).

    The tile-pair Verlet list is rebuilt every ``rebuild_every`` segments
    and the state re-sorted by the spatial key every ``sort_every``
    rebuilds (both via ``lax.cond`` inside the scan).  Correctness never
    depends on the cadence -- tile bboxes are computed from CURRENT
    positions at every rebuild (sort staleness only fattens them), and the
    cumulative top-2 drift from the rebuild anchor is checked against the
    slack EVERY segment: if the list could have gone stale,
    ``state.overflowed`` latches and ``check()`` raises.  (The check
    samples positions at segment boundaries -- standard Verlet-skin
    semantics: a violation that both appears and fully retreats WITHIN one
    segment is not observable at the boundary.  Bound the window with
    ``segment_steps``; at the defaults the slack is many times the RMS
    per-segment displacement.)  Measured at
    N=4000 (BENCH.md): cadences above 1 LOSE -- the ~300 us saved per
    skipped sort is outweighed by the fatter stale-sort tile bboxes -- so
    both default to 1; the knobs remain for other regimes.

    NOTE: like the band runner, sorting permutes particle identity --
    requires identical masses; ``positions(state)`` returns internal order.
    """
    from .ops.lj_cull import build_tile_pairs, slab_y_key, sort_by_key
    from .ops.sortbuild import sort_build_raw

    md, dense, kT, dt, gamma, _ = _culled_engine_setup(
        potential, n_particles, temperature, timestep, collision_rate,
        topology, tm, tn, slack, unroll, mxu_reduce, prefetch,
    )
    n = n_particles
    n_pad = md.n_pad
    valid_lane = jnp.arange(n_pad) < n

    class CulledRunner:
        def __init__(self):
            self.md = md
            self.dense = dense
            self.seed = seed_default
            self.nslab = None     # resolved from the box in init()
            self.capacity = None  # resolved from the initial list in init()
            self._bodies = {}     # per-n_steps body cache (stable jit keys)

        def init(self, positions, box_vectors, seed: int = 0):
            self.seed = seed
            x3s, box_diag, self.nslab, self.capacity, pairs = (
                _culled_layout_init(md, dense, positions, box_vectors,
                                    sort_mode, n)
            )
            key0 = jax.random.PRNGKey(seed)
            _, vkey = jax.random.split(key0)
            v3 = md.sigv * jax.random.normal(vkey, (3, n_pad))
            F3 = md.force(x3s, box_diag[0], pairs,
                          approx_recip=not exact_forces)
            return CullCarry(
                x=x3s, v=v3, F=F3,
                step=jnp.zeros((1, 1), jnp.int32),
                box_diag=box_diag,
                overflowed=pairs.overflowed,
                pairs=pairs,
                x_anchor=x3s,
            )

        def _segment_body(self, n_steps: int):
            cache_key = (n_steps, self.nslab, self.capacity, self.seed)
            if cache_key in self._bodies:
                return self._bodies[cache_key]
            nslab, capacity, seed = self.nslab, self.capacity, self.seed
            approx = not exact_forces
            if megakernel:
                if nslab != 0:
                    raise ValueError(
                        "megakernel supports the pure-x sort regime only "
                        "(nslab == 0); use sort_mode='x' or the default "
                        "path for slab-key workloads"
                    )
                if sort_every != 1 or rebuild_every != 1 or fused_rebuild:
                    raise ValueError(
                        "megakernel rebuilds/repairs every segment; "
                        "cadence knobs and fused_rebuild do not apply"
                    )
                from .ops.lj_mega import mega_md_raw

                def mega_body(carry: CullCarry, _):
                    box_diag = carry.box_diag
                    w_in = (
                        carry.v
                        - (0.5 * md.dt) * carry.F * md.minv
                    )
                    x1, w1, F1, flag = mega_md_raw(
                        carry.x, w_in, carry.F, box_diag[0],
                        jnp.asarray(seed, jnp.int32).reshape(1, 1),
                        carry.step.astype(jnp.int32),
                        md.minv, md.sigv,
                        n, n_steps, md.tm, md.tn, md.sigma, md.epsilon,
                        md.cutoff, md.dt, md.a, md.b, approx,
                        md.interpret, unroll=md.unroll, slack=md.slack,
                        capacity=capacity, repair_passes=repair_passes,
                    )
                    v1 = w1 + (0.5 * md.dt) * F1 * md.minv
                    return CullCarry(
                        x=x1, v=v1, F=F1,
                        step=carry.step + n_steps,
                        box_diag=box_diag,
                        overflowed=carry.overflowed | (flag[0, 0] > 0.5),
                        pairs=carry.pairs,
                        x_anchor=carry.x_anchor,
                    ), None

                self._bodies[cache_key] = mega_body
                return mega_body
            # one-Pallas-call sort+build (ops/sortbuild.py): measured
            # 290 us vs the XLA path's 394 us per segment at N=4000 --
            # throughput-neutral there (BENCH.md), so opt-in; it needs a
            # power-of-two n_pad and 128-multiple tiles
            use_fused = fused_rebuild and (
                (n_pad & (n_pad - 1)) == 0
                and md.tm % 128 == 0
                and md.tn % 128 == 0
            )
            if use_fused and n_pad > 4096:
                # the fully-unrolled bitonic network's Mosaic program does
                # not finish remote compilation at 16k+ (BENCH.md, job
                # j39: 80+ min without completing) -- fail fast instead
                # of hanging the caller's session
                raise ValueError(
                    "fused_rebuild is compile-infeasible above n_pad=4096 "
                    "(the unrolled bitonic program is too large for the "
                    "TPU compiler); use the default XLA sort/build path"
                )
            if use_fused and (sort_every != 1 or rebuild_every != 1):
                raise ValueError(
                    "fused_rebuild sorts and rebuilds every segment; "
                    "sort_every/rebuild_every must stay 1 with it"
                )

            def body(carry: CullCarry, _):
                box_diag = carry.box_diag
                Lx = box_diag[0, 0]
                if use_fused:
                    x3s, v3, F3, pairs = sort_build_raw(
                        carry.x, carry.v, carry.F, box_diag[0],
                        n=n, tm=md.tm, tn=md.tn, nslab=nslab,
                        cutoff=md.cutoff, slack=md.slack,
                        capacity=capacity, interpret=md.interpret,
                    )
                    x_anchor = x3s
                else:
                    # XLA fallback with sort/rebuild cadence from the
                    # cumulative step counter (rem segments shift the
                    # phase harmlessly -- the cadence is a heuristic; the
                    # drift latch guards correctness)
                    seg_i = carry.step[0, 0] // segment_steps
                    do_sort = (
                        seg_i % (rebuild_every * sort_every)
                    ) == 0
                    do_rebuild = do_sort | (
                        (seg_i % rebuild_every) == 0
                    )

                    def sort_branch(xvF):
                        x, v, F = xvF
                        skey = slab_y_key(x, n, nslab, Lx,
                                          Ly=box_diag[0, 1])
                        xs, payload = sort_by_key(
                            skey, x,
                            (v[0], v[1], v[2], F[0], F[1], F[2]),
                        )
                        return (xs, jnp.stack(payload[0:3]),
                                jnp.stack(payload[3:6]))

                    x3s, v3, F3 = jax.lax.cond(
                        do_sort, sort_branch, lambda t: t,
                        (carry.x, carry.v, carry.F),
                    )

                    def rebuild_branch(args):
                        x = args[0]
                        return build_tile_pairs(
                            x, n, md.tm, md.tn, box_diag[0], md.cutoff,
                            md.slack, capacity=capacity,
                        ), x

                    pairs, x_anchor = jax.lax.cond(
                        do_rebuild, rebuild_branch,
                        lambda args: (args[1], args[2]),
                        (x3s, carry.pairs, carry.x_anchor),
                    )
                overflowed = carry.overflowed | pairs.overflowed
                if rebuild_every == 1:
                    # rebuild-every-segment (the production cadence, incl.
                    # the fused sort+build path -- anchor == x3s): the
                    # tile-skin invariant is evaluated INSIDE the MD
                    # kernel's final grid step against the segment-entry
                    # anchor -- the XLA drift check's small-fusion
                    # launches measured 145 us/segment (2.9 us/step)
                    x1, v1, F1, stale = md.run_segment(
                        x3s, v3, F3, box_diag[0], pairs,
                        seed=jnp.int32(seed), step_offset=carry.step[0, 0],
                        n_steps=n_steps, approx_recip=approx,
                        drift_slack=md.slack,
                    )
                    overflowed = overflowed | stale
                else:
                    # multi-segment anchors (cadence > 1) keep the XLA
                    # check: the in-kernel check only sees one segment's
                    # drift
                    x1, v1, F1 = md.run_segment(
                        x3s, v3, F3, box_diag[0], pairs,
                        seed=jnp.int32(seed), step_offset=carry.step[0, 0],
                        n_steps=n_steps, approx_recip=approx,
                    )
                    # tile-skin invariant: no PAIR of particles jointly
                    # closed more than the slack since the list was built
                    # (anchor).  NaN positions would make every comparison
                    # False, so latch non-finiteness explicitly.
                    L = box_diag.reshape(3, 1)
                    dx = x1 - x_anchor
                    dx = dx - L * jnp.round(dx / L)
                    overflowed = overflowed | (
                        _top2_drift(dx, valid_lane) > md.slack
                    ) | ~jnp.all(
                        jnp.isfinite(jnp.where(valid_lane, x1, 0.0))
                    )
                return CullCarry(
                    x=x1, v=v1, F=F1,
                    step=carry.step + n_steps,
                    box_diag=box_diag,
                    overflowed=overflowed,
                    pairs=pairs,
                    x_anchor=x_anchor,
                ), None

            self._bodies[cache_key] = body
            return body

        def run(self, state: CullCarry, n_steps: int) -> CullCarry:
            """Advance ``n_steps``: one dispatch (scan over segments)."""
            S = segment_steps
            n_seg, rem = divmod(n_steps, S)
            if n_seg:
                state = _cull_scan_segments(
                    self._segment_body(S), state, n_seg
                )
            if rem:
                state = _cull_scan_segments(
                    self._segment_body(rem), state, 1
                )
            return state

        def segment_fn(self, n_steps: int):
            """Public compiled-segment surface: a jittable pure function
            ``carry -> carry`` advancing one ``n_steps``-step segment
            (sort + pair rebuild + fused MD kernel).  This is exactly the
            scan body ``run()`` iterates, exposed for callers that manage
            their own stepping (e.g. the graft driver's ``entry()``).
            Requires ``init()`` to have run (layout/capacity are resolved
            from the initial configuration).
            """
            if self.capacity is None:
                raise RuntimeError("call init() before segment_fn()")
            body = self._segment_body(n_steps)

            def step(carry: CullCarry) -> CullCarry:
                new_carry, _ = body(carry, None)
                return new_carry

            return step

        def check(self, state: CullCarry):
            if bool(state.overflowed):
                raise RuntimeError(
                    "culled runner invariant violated (pair-list capacity, "
                    "shift bound, or per-segment drift) -- reduce "
                    "segment_steps or increase slack and re-run"
                )

        def energy(self, state: CullCarry):
            return dense.force_energy_t(state.x, state.box_diag)[1]

        def positions(self, state: CullCarry):
            return dense.unpad(state.x)

        def velocities(self, state: CullCarry):
            return dense.unpad(state.v)

    return CulledRunner()


@partial(jax.jit, static_argnames=("body", "n_seg"))
def _cull_scan_segments(body, carry, n_seg: int):
    carry, _ = jax.lax.scan(body, carry, length=n_seg)
    return carry


def _npt_volume_proposal(key, box_diag, vmax_scale):
    """Isotropic volume proposal shared by both NpT runners
    (reference mcmc.py:950-983): dV ~ U(-1, 1) * vmax * V, positions and
    box scaled by (V'/V)^(1/3).  Returns (key, k_acc, V, V_new, s)."""
    key, k_prop, k_acc = jax.random.split(key, 3)
    V = jnp.prod(box_diag)
    dV = jax.random.uniform(
        k_prop, minval=-1.0, maxval=1.0
    ) * vmax_scale * V
    V_new = V + dV
    s = jnp.power(V_new / V, 1.0 / 3.0)
    return key, k_acc, V, V_new, s


def _npt_accept(k_acc, beta, P_md, n, U, U_new, V, V_new, box_ok):
    """McDonald-1972 NpT acceptance (reference mcmc.py:995-1000) with
    NaN rejection (reference mcmc.py:428) and box-validity rejection
    (the caller's minimum-image bound, ADVICE r2)."""
    log_ratio = (
        -beta * ((U_new - U) + P_md * (V_new - V))
        + n * jnp.log(V_new / V)
    )
    log_ratio = jnp.where(jnp.isnan(U_new) | ~box_ok, -jnp.inf, log_ratio)
    return jnp.log(jax.random.uniform(k_acc, minval=1e-38)) < log_ratio


def _npt_autotune(vmax, n_acc, n_prop, interval, cap=0.3):
    """Reference barostat autotune (mcmc.py:902-911): /1.1 below 25%
    cumulative acceptance, x1.1 above 75%, capped at 0.3.

    ``cap`` lets an engine tighten the reference's 0.3 ceiling to its own
    operating envelope: the culled runner's rescaled-list barostat charges
    ``|1-s|*reach`` of slack per evaluated shrink, so its proposals must
    stay small enough that a whole segment's attempts fit the slack
    budget (otherwise the autotuner drives itself into the drift latch in
    high-acceptance regimes, e.g. dilute near-ideal systems)."""
    due = (n_prop % interval) == 0
    ratio = n_acc.astype(jnp.float32) / jnp.maximum(n_prop, 1)
    vmax = jnp.where(due & (ratio < 0.25), vmax / 1.1, vmax)
    return jnp.where(
        due & (ratio > 0.75), jnp.minimum(vmax * 1.1, cap), vmax
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "U", "step", "box_diag", "overflowed",
                 "pairs", "x_anchor", "scale_used", "eval_peak", "s_total",
                 "s_min_frame", "key", "vmax_scale",
                 "n_accepted", "n_proposed"],
    meta_fields=[],
)
@dataclass
class CullNPTCarry:
    """Carry of the culled NpT runner: the culled NVT carry plus the
    barostat's key/statistics and the slack budget consumed by accepted
    volume scalings since the last list rebuild."""

    x: jnp.ndarray           # (3, n_pad)
    v: jnp.ndarray           # (3, n_pad)
    F: jnp.ndarray           # (3, n_pad)
    U: jnp.ndarray           # () f32 carried exact potential of x (the
                             # current config's Metropolis energy -- kept
                             # fresh by the MD kernel's final-step energy
                             # and by accepted proposals, ADVICE r3)
    step: jnp.ndarray        # (1, 1) i32 cumulative MD steps (noise ctr)
    box_diag: jnp.ndarray    # (1, 3)
    overflowed: jnp.ndarray  # () bool
    pairs: object            # TilePairList
    x_anchor: jnp.ndarray    # (3, n_pad) positions at last rebuild
    scale_used: jnp.ndarray  # () f32 slack consumed by ACCEPTED volume
                             # scalings since the last rebuild
    eval_peak: jnp.ndarray   # () f32 worst slack any box-valid proposal
                             # EVALUATION needed (accepted or not): the
                             # Metropolis decision itself uses U_new from
                             # the rescaled stale list, so the drift latch
                             # must budget for rejected shrinks too
    s_total: jnp.ndarray     # () f32 cumulative box scale since rebuild
    s_min_frame: jnp.ndarray  # () f32 x-frame validity floor on s_total
                             # (ops/lj_cull.py::tile_frame_scale_floor)
    key: jnp.ndarray         # barostat PRNG key
    vmax_scale: jnp.ndarray  # () f32 barostat max relative volume change
    n_accepted: jnp.ndarray  # () i32
    n_proposed: jnp.ndarray  # () i32


def make_culled_npt_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    pressure=1.0 * units.atmosphere,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 128,
    tn: int = 256,
    slack: float = 0.2,
    segment_steps: int = 50,
    barostat_interval: int = 25,
    volume_max_scale: float = 0.01,
    autotune: bool = True,
    autotune_interval: int = 20,
    sort_mode: str = "auto",
    seed_default: int = 0,
    exact_forces: bool = False,
    unroll: int = 4,
):
    """Fused NpT on the culled tile-pair engine (the flagship NVT kernel).

    Replaces the dense-kernel ``make_npt_lj_runner`` at flagship sizes:
    BAOAB Langevin segments run on the culled fused kernel while an
    on-device MC barostat (McDonald-1972 NpT acceptance, reference
    chiron/mcmc.py:985-1000; autotune rule mcmc.py:902-911) attempts an
    isotropic volume move every ``barostat_interval`` steps.  The whole
    chain is ONE ``lax.scan``.

    TPU-first design points:

    * a volume proposal RESCALES the live tile-pair list instead of
      rebuilding it: uniform scaling maps every coordinate, bbox center
      and frame shift through ``x -> s x``, so the list for the scaled
      configuration is the same entry set with ``ccx``/``rowcx``
      multiplied by ``s`` -- pairs beyond reach can only enter the
      cutoff by consuming ``|1 - s| * (cutoff + slack)`` of slack, which
      is charged to a slack budget (``scale_used``) checked together
      with the thermal top-2 drift every segment;
    * proposal energies come from the culled force+energy kernel
      (ops/lj_cull.py::culled_force_energy_raw, exact reciprocal), so a
      barostat attempt costs two culled passes -- not the two dense
      N^2 passes of the dense runner;
    * the accepted proposal's force is reused as the next segment's
      input force (no extra force pass);
    * minimum-image validity under a shrinking box (ADVICE r2): volume
      proposals that would take ``min(box)/2 - cutoff - slack`` negative
      are rejected outright, and every rebuild re-checks the x-frame
      shift bound (latching ``overflowed``).

    ``segment_steps`` must be a multiple of ``barostat_interval``;
    ``run(state, n)`` requires ``n`` to be a multiple of
    ``segment_steps``.  Volume moves leave velocities untouched
    (reference mcmc.py:972-983 semantics).
    """
    from .ops.lj_cull import (build_tile_pairs, slab_y_key, sort_by_key,
                              tile_frame_scale_floor)

    if segment_steps % barostat_interval != 0:
        raise ValueError(
            "segment_steps must be a multiple of barostat_interval"
        )
    md, dense, kT, dt, gamma, _ = _culled_engine_setup(
        potential, n_particles, temperature, timestep, collision_rate,
        topology, tm, tn, slack, unroll,
    )
    n = n_particles
    beta = 1.0 / kT
    P_md = units.pressure_to_md(pressure)
    n_pad = md.n_pad
    reach = md.cutoff + md.slack
    approx = not exact_forces
    n_sub = segment_steps // barostat_interval
    # Engine envelope for the autotuned proposal size: every evaluated
    # box-valid shrink charges |1-s|*reach against the segment's slack
    # budget (the Metropolis decision reads U_new off the rescaled stale
    # list), so the n_sub attempts of one segment must together fit in
    # HALF the slack -- the other half stays for thermal top-2 drift.
    # Without this cap the reference autotune rule (x1.1 up to 0.3)
    # drives high-acceptance regimes (dilute near-ideal gases) straight
    # into the drift latch.  vmax is a proposal-distribution parameter,
    # so capping it leaves detailed balance exactly intact.
    _charge_cap = 0.5 * md.slack / n_sub
    _s_min_attempt = max(1e-3, 1.0 - _charge_cap / reach)
    vmax_cap = min(0.3, 1.0 - _s_min_attempt ** 3)

    class CulledNPTRunner:
        def __init__(self):
            self.md = md
            self.dense = dense
            self.vmax_cap = vmax_cap
            self.seed = seed_default
            self.nslab = None
            self.capacity = None
            self._bodies = {}

        def init(self, positions, box_vectors, seed: int = 0):
            self.seed = seed
            x3s, box_diag, self.nslab, self.capacity, pairs = (
                _culled_layout_init(md, dense, positions, box_vectors,
                                    sort_mode, n)
            )
            key0 = jax.random.PRNGKey(seed)
            key, vkey = jax.random.split(key0)
            v3 = md.sigv * jax.random.normal(vkey, (3, n_pad))
            # One exact pass supplies both the carried Metropolis energy
            # and the first segment's entry force (the ~6e-5 relative
            # exact-vs-approx force difference only perturbs one half-kick
            # and is far below the Langevin noise floor; using it avoids
            # compiling a second, NpT-only force program).
            F3, U0 = md.force_energy(x3s, box_diag[0], pairs)
            s_floor = tile_frame_scale_floor(
                x3s, n, md.tm, md.tn, box_diag[0], md.cutoff, md.slack
            )
            return CullNPTCarry(
                x=x3s, v=v3, F=F3, U=U0,
                step=jnp.zeros((1, 1), jnp.int32),
                box_diag=box_diag,
                overflowed=pairs.overflowed,
                pairs=pairs,
                x_anchor=x3s,
                scale_used=jnp.float32(0.0),
                eval_peak=jnp.float32(0.0),
                s_total=jnp.float32(1.0),
                s_min_frame=s_floor,
                key=key,
                # under autotune the engine owns vmax: start inside the
                # envelope.  With autotune off the user's value is taken
                # verbatim (the drift latch still guards correctness).
                vmax_scale=jnp.float32(
                    min(volume_max_scale, vmax_cap) if autotune
                    else volume_max_scale
                ),
                n_accepted=jnp.int32(0),
                n_proposed=jnp.int32(0),
            )

        def _barostat_attempt(self, carry: CullNPTCarry) -> CullNPTCarry:
            box = carry.box_diag
            key, k_acc, V, V_new, s = _npt_volume_proposal(
                carry.key, box, carry.vmax_scale
            )
            x_new = carry.x * s
            box_new = box * s
            pairs = carry.pairs
            pairs_new = pairs._replace(ccx=pairs.ccx * s,
                                       rowcx=pairs.rowcx * s)
            # ONE culled pass per attempt: U of the current config is
            # carried (exact, refreshed by the MD kernel's final-step
            # energy and by accepted proposals -- ADVICE r3); only the
            # proposal needs a fresh pass
            U = carry.U
            F_new, U_new = md.force_energy(x_new, box_new[0], pairs_new)
            # minimum-image validity as the box shrinks (ADVICE r2) AND the
            # x-frame validity floor: the rebuild's hsum_x bound tightens
            # under cumulative shrinking (reach does not scale with the
            # box), so a proposal that would take s_total below the floor
            # computed at rebuild is rejected outright -- otherwise an
            # accepted shrink in the final segment of a run() could leave
            # the constant-x-frame fold non-minimum-image with no following
            # rebuild to latch it
            s_total_new = carry.s_total * s
            box_ok = (
                ((0.5 * jnp.min(box_new) - md.cutoff - md.slack) > 0.0)
                & (s_total_new >= carry.s_min_frame)
            )
            accept = _npt_accept(
                k_acc, beta, P_md, n, U, U_new, V, V_new, box_ok
            )
            sel = lambda a, b: jnp.where(accept, a, b)
            # a down-scaling consumes |1-s|*reach of slack (pairs beyond
            # reach move inward by at most that much); up-scalings only
            # push pairs outward and consume none
            charge = jnp.maximum(0.0, 1.0 - s) * reach
            used = carry.scale_used + jnp.where(accept, charge, 0.0)
            # the Metropolis DECISION itself used U_new from the rescaled
            # stale list, so even a rejected box-valid shrink must count
            # against the drift latch budget -- otherwise a rejected
            # over-budget proposal is decided on a possibly-invalid U_new
            # and nothing ever latches (box-invalid proposals are rejected
            # deterministically, so their U_new never matters)
            eval_peak = jnp.maximum(
                carry.eval_peak,
                jnp.where(box_ok, carry.scale_used + charge,
                          carry.scale_used),
            )
            n_acc = carry.n_accepted + accept.astype(jnp.int32)
            n_prop = carry.n_proposed + 1
            vmax = carry.vmax_scale
            if autotune:
                vmax = _npt_autotune(vmax, n_acc, n_prop, autotune_interval,
                                     cap=vmax_cap)
            return CullNPTCarry(
                x=sel(x_new, carry.x), v=carry.v,
                F=sel(F_new, carry.F),
                U=sel(U_new, U),
                step=carry.step,
                box_diag=sel(box_new, box),
                overflowed=carry.overflowed,
                pairs=pairs._replace(
                    ccx=sel(pairs_new.ccx, pairs.ccx),
                    rowcx=sel(pairs_new.rowcx, pairs.rowcx),
                ),
                x_anchor=sel(carry.x_anchor * s, carry.x_anchor),
                scale_used=used,
                eval_peak=eval_peak,
                s_total=sel(s_total_new, carry.s_total),
                s_min_frame=carry.s_min_frame,
                key=key,
                vmax_scale=vmax,
                n_accepted=n_acc,
                n_proposed=n_prop,
            )

        def _segment_body(self, n_steps: int):
            cache_key = (n_steps, self.nslab, self.capacity, self.seed)
            if cache_key in self._bodies:
                return self._bodies[cache_key]
            nslab, capacity, seed = self.nslab, self.capacity, self.seed

            def body(carry: CullNPTCarry, _):
                box_diag = carry.box_diag
                Lx = box_diag[0, 0]
                skey = slab_y_key(carry.x, n, nslab, Lx,
                                  Ly=box_diag[0, 1])
                x3s, payload = sort_by_key(
                    skey, carry.x,
                    (carry.v[0], carry.v[1], carry.v[2],
                     carry.F[0], carry.F[1], carry.F[2]),
                )
                v3 = jnp.stack(payload[0:3])
                F3 = jnp.stack(payload[3:6])
                pairs = build_tile_pairs(
                    x3s, n, md.tm, md.tn, box_diag[0], md.cutoff,
                    md.slack, capacity=capacity,
                )
                s_floor = tile_frame_scale_floor(
                    x3s, n, md.tm, md.tn, box_diag[0], md.cutoff, md.slack
                )
                carry = _dc_replace(
                    carry, x=x3s, v=v3, F=F3,
                    overflowed=carry.overflowed | pairs.overflowed,
                    pairs=pairs, x_anchor=x3s,
                    scale_used=jnp.float32(0.0),
                    eval_peak=jnp.float32(0.0),
                    s_total=jnp.float32(1.0),
                    s_min_frame=s_floor,
                )
                for _k in range(n_sub):
                    carry = self._barostat_attempt(carry)
                    # combined skin invariant, IN-KERNEL (same fold that
                    # bought the NVT runner its r4 gains): the anchor
                    # (rescaled rebuild configuration) and the remaining
                    # budget (slack - consumed volume-scaling slack)
                    # travel as data, so the final grid step checks the
                    # cross-sub-segment thermal top-2 drift + non-finite
                    # latch without the former 145 us/segment XLA check
                    x1, v1, F1, stale, U1 = md.run_segment(
                        carry.x, carry.v, carry.F, carry.box_diag[0],
                        carry.pairs, seed=jnp.int32(seed),
                        step_offset=carry.step[0, 0],
                        n_steps=barostat_interval, approx_recip=approx,
                        final_energy=True,
                        drift_anchor=carry.x_anchor,
                        # budget against the WORST evaluated scaling, not
                        # just the accepted ones: a rejected shrink's
                        # Metropolis decision consumed slack too
                        drift_budget=(
                            jnp.float32(md.slack) - carry.eval_peak
                        ),
                    )
                    carry = _dc_replace(
                        carry, x=x1, v=v1, F=F1, U=U1,
                        overflowed=carry.overflowed | stale,
                        step=carry.step + barostat_interval,
                    )
                return carry, None

            self._bodies[cache_key] = body
            return body

        def run(self, state: CullNPTCarry, n_steps: int) -> CullNPTCarry:
            if n_steps % segment_steps != 0:
                raise ValueError(
                    f"n_steps must be a multiple of segment_steps "
                    f"({segment_steps})"
                )
            return _cull_scan_segments(
                self._segment_body(segment_steps), state,
                n_steps // segment_steps,
            )

        def check(self, state: CullNPTCarry):
            if bool(state.overflowed):
                raise RuntimeError(
                    "culled NpT runner invariant violated (pair-list "
                    "capacity, shift bound, or drift+scale budget) -- "
                    "reduce segment_steps or increase slack and re-run"
                )

        def volume(self, state: CullNPTCarry):
            return jnp.prod(state.box_diag)

        def acceptance(self, state: CullNPTCarry):
            prop = int(state.n_proposed)
            return (int(state.n_accepted) / prop) if prop else 0.0

        def energy(self, state: CullNPTCarry):
            return md.force_energy(state.x, state.box_diag[0],
                                   state.pairs)[1]

        def positions(self, state: CullNPTCarry):
            return dense.unpad(state.x)

        def velocities(self, state: CullNPTCarry):
            return dense.unpad(state.v)

    return CulledNPTRunner()


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "step", "box_diag", "overflowed"],
    meta_fields=[],
)
@dataclass
class StripCarry:
    """Carry of the halo-strip runner (x-sorted extended layout)."""

    x: jnp.ndarray          # (3, n_pad + H) extended positions
    v: jnp.ndarray          # (3, n_pad)
    F: jnp.ndarray          # (3, n_pad)
    step: jnp.ndarray       # (1, 1) int32 cumulative step count (noise ctr)
    box_diag: jnp.ndarray   # (1, 3)
    overflowed: jnp.ndarray  # () bool: band overflow or drift violation


def make_strip_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 128,
    slack: float = 0.3,
    segment_steps: int = 50,
    halo_headroom: float = 1.3,
    seed_default: int = 0,
    exact_forces: bool = False,
):
    """Halo-strip fused LJ runner: the N~4000 flagship engine.

    x-sorted state; each row tile evaluates one contiguous (tm, tm+H)
    forward strip with a rank-space +Lx halo (ops/lj_strip.py).  Every
    ``segment_steps`` steps the state is re-sorted and the band width
    re-checked; the whole ``run(state, n)`` is one ``lax.scan`` dispatch.

    The per-segment drift check (top-2 joint drift from the sort anchor
    > slack latches -- the same pairwise-sum invariant as the culled
    runner, checked at segment boundaries) and the band-width check
    (W_needed <= H) latch into ``state.overflowed``; ``check(state)``
    raises if violated.

    NOTE: sorting permutes particle identity -- requires identical masses;
    ``positions(state)`` returns internal order.
    """
    from .ops.lj_band import band_width_needed
    from .ops.lj_dense import LJDensePallas
    from .ops.lj_strip import _PAD_X, StripLJMD, sort_by_key_strip

    if topology is None:
        topology = potential.topology
    masses_host = topology.masses()
    if not np.allclose(masses_host, masses_host[0]):
        raise ValueError(
            "the strip runner permutes particle order and therefore "
            "requires identical masses"
        )
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    md = StripLJMD(
        n_particles, potential.sigma, potential.epsilon, potential.cutoff,
        masses_lane=np.asarray(masses_host, dtype=np.float32),
        dt=dt, gamma=gamma, kT=kT, tm=tm, slack=slack,
    )
    n = n_particles
    n_pad = md.n_pad
    valid_lane = jnp.arange(n_pad) < n
    reach = md.cutoff + md.slack
    dense = LJDensePallas(
        n, potential.sigma, potential.epsilon, potential.cutoff,
        tm=128, tn=128, n_pad=n_pad,
    )

    class StripRunner:
        def __init__(self):
            self.md = md
            self.dense = dense
            self.seed = seed_default
            self._bodies = {}

        def init(self, positions, box_vectors, seed: int = 0):
            self.seed = seed
            x3 = dense.pad_positions(jnp.asarray(positions, jnp.float32))
            x3 = jnp.where(valid_lane, x3, jnp.float32(_PAD_X))
            box_diag = jnp.diagonal(
                jnp.asarray(box_vectors, jnp.float32)
            ).reshape(1, 3)
            Lx = float(box_diag[0, 0])
            x3s, _ = sort_by_key_strip(x3, ())
            W = int(band_width_needed(
                jnp.where(valid_lane, x3s[0], jnp.float32(3.0e38)),
                n, reach, Lx,
            ))
            md.set_halo(
                int(W * halo_headroom) + md.tm + (n_pad - n)
            )
            xe = md.extend(x3s, box_diag[0])
            key0 = jax.random.PRNGKey(seed)
            _, vkey = jax.random.split(key0)
            v3 = md.sigv * jax.random.normal(vkey, (3, n_pad))
            F3 = md.force(xe, box_diag[0],
                          approx_recip=not exact_forces)
            return StripCarry(
                x=xe, v=v3, F=F3,
                step=jnp.zeros((1, 1), jnp.int32),
                box_diag=box_diag,
                overflowed=jnp.asarray(False),
            )

        def _segment_body(self, n_steps: int):
            cache_key = (n_steps, md.H, self.seed)
            if cache_key in self._bodies:
                return self._bodies[cache_key]
            seed = self.seed
            approx = not exact_forces

            def body(carry: StripCarry, _):
                box_diag = carry.box_diag
                Lx = box_diag[0, 0]
                center = carry.x[:, :n_pad]
                # pads drift with noise; re-pin the sentinel before sorting
                center = jnp.where(
                    valid_lane, center, jnp.float32(_PAD_X)
                )
                x3s, payload = sort_by_key_strip(
                    center,
                    (carry.v[0], carry.v[1], carry.v[2],
                     carry.F[0], carry.F[1], carry.F[2]),
                )
                v3 = jnp.stack(payload[0:3])
                F3 = jnp.stack(payload[3:6])
                W_needed = band_width_needed(
                    jnp.where(valid_lane, x3s[0], jnp.float32(3.0e38)),
                    n, reach, Lx,
                )
                # pad slots sit between real rank n-1 and the halo, so the
                # array-window a wrap-crossing row needs is W + (n_pad - n)
                overflowed = carry.overflowed | (
                    W_needed + (n_pad - n) > md.H
                )
                xe = md.extend(x3s, box_diag[0])
                xe1, v1, F1 = md.run_segment(
                    xe, v3, F3, box_diag[0],
                    seed=jnp.int32(seed), step_offset=carry.step[0, 0],
                    n_steps=n_steps, approx_recip=approx,
                )
                # tile-skin invariant: no PAIR jointly closed more than
                # the slack while sorted order and band width were stale.
                # NaN positions would make every comparison False, so latch
                # non-finiteness explicitly.
                L = box_diag.reshape(3, 1)
                dxs = xe1[:, :n_pad] - x3s
                dxs = dxs - L * jnp.round(dxs / L)
                overflowed = overflowed | (
                    _top2_drift(dxs, valid_lane) > md.slack
                ) | ~jnp.all(
                    jnp.isfinite(jnp.where(valid_lane, xe1[:, :n_pad], 0.0))
                )
                return StripCarry(
                    x=xe1, v=v1, F=F1,
                    step=carry.step + n_steps,
                    box_diag=box_diag,
                    overflowed=overflowed,
                ), None

            self._bodies[cache_key] = body
            return body

        def run(self, state: StripCarry, n_steps: int) -> StripCarry:
            S = segment_steps
            n_seg, rem = divmod(n_steps, S)
            if n_seg:
                state = _cull_scan_segments(
                    self._segment_body(S), state, n_seg
                )
            if rem:
                state = _cull_scan_segments(
                    self._segment_body(rem), state, 1
                )
            return state

        def check(self, state: StripCarry):
            if bool(state.overflowed):
                raise RuntimeError(
                    "strip runner invariant violated (band width or "
                    "per-segment drift) -- reduce segment_steps or "
                    "increase slack and re-run"
                )

        def energy(self, state: StripCarry):
            center = jnp.where(
                valid_lane, state.x[:, :n_pad], 0.0
            )
            return dense.force_energy_t(center, state.box_diag)[1]

        def positions(self, state: StripCarry):
            return state.x[:, :n].T  # internal (sorted) order

        def velocities(self, state: StripCarry):
            return state.v[:, :n].T

    return StripRunner()


def make_langevin_runner(
    potential,
    pairs=None,
    topology=None,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
) -> LangevinRunner:
    """Build a compiled BAOAB runner for ``potential`` (+ optional pair spec)."""
    if topology is None:
        topology = potential.topology
    masses = jnp.asarray(topology.masses(), dtype=jnp.float32)[:, None]
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)

    from .neighbors import DensePairs as _DensePairs

    if isinstance(pairs, _DensePairs) and not pairs.is_built:
        raise ValueError(
            "build the DensePairs scheme (build/build_from_state) before "
            "creating a runner -- the fused kernel is specialized on the "
            "particle count"
        )
    energy_fn = potential.make_energy_fn(pairs)
    step_fn = make_baoab_step_fn(energy_fn, masses, dt, gamma, kT, pairs=pairs)
    return LangevinRunner(
        step_fn=step_fn,
        energy_fn=energy_fn,
        masses=masses,
        temperature_md=T,
        pairs=pairs,
    )


def make_lj_runner(
    potential,
    n_particles: int,
    box_vectors=None,
    temperature=300.0 * units.kelvin,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    engine: str = "auto",
    **kwargs,
):
    """Pick the fastest LJ engine for the system size (BENCH.md domains).

    ``engine='auto'`` selects by particle count and box geometry:

    * N < ~2k, or a box under ~2.5 cutoffs wide, or non-uniform masses:
      dense fused kernel (``make_fast_lj_runner``) -- exact at every step,
      no skin assumptions (also the right engine for violent transients
      like lattice melts).
    * 2k <= N <= ~80k: culled tile-pair engine (``make_culled_lj_runner``;
      its sort key switches to (x-slab, y) automatically once the box is
      wide enough -- measured 4.7x the band engine at N=65k).
    * N > ~80k: banded runner (``make_band_lj_runner``) -- the culled
      tile-pair list outgrows scalar memory at this scale.

    Explicit ``engine`` in {'dense', 'culled', 'strip', 'band'} overrides.
    """
    if topology is None:
        topology = potential.topology
    masses_host = np.asarray(topology.masses())
    uniform = bool(np.allclose(masses_host, masses_host[0]))

    if engine == "auto":
        wide_enough = True
        if box_vectors is not None:
            box = np.asarray(units.strip_md(box_vectors, units.nanometer))
            wide_enough = float(np.diagonal(box).min()) > 2.6 * (
                potential.cutoff + 0.3
            )
        if n_particles < 2048 or not uniform or not wide_enough:
            engine = "dense"
        elif n_particles <= 80_000:
            engine = "culled"
        else:
            engine = "band"

    common = dict(
        potential=potential, n_particles=n_particles, topology=topology,
        temperature=temperature, timestep=timestep,
        collision_rate=collision_rate,
    )
    if engine == "dense":
        return make_fast_lj_runner(**common, **kwargs)
    if engine == "culled":
        return make_culled_lj_runner(**common, **kwargs)
    if engine == "strip":
        return make_strip_lj_runner(**common, **kwargs)
    if engine == "band":
        return make_band_lj_runner(**common, **kwargs)
    raise ValueError(
        f"unknown engine {engine!r}; pick auto/dense/culled/strip/band"
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "v", "F", "U", "key", "box_diag", "vmax_scale",
                 "n_accepted", "n_proposed", "step"],
    meta_fields=[],
)
@dataclass
class NPTCarry:
    """Carry of the fused NpT runner (dense-kernel layout; the barostat's
    autotuned volume scale and acceptance statistics are carry data)."""

    x: jnp.ndarray           # (3, n_pad)
    v: jnp.ndarray           # (3, n_pad)
    F: jnp.ndarray           # (3, n_pad)
    U: jnp.ndarray           # () f32 potential of x, fresh ONLY on steps
    #                          that feed a barostat attempt (see step_fn)
    key: jnp.ndarray
    box_diag: jnp.ndarray    # (1, 3)
    vmax_scale: jnp.ndarray  # () f32 barostat max relative volume change
    n_accepted: jnp.ndarray  # () i32 barostat acceptances
    n_proposed: jnp.ndarray  # () i32 barostat attempts
    step: jnp.ndarray        # () i32 cumulative MD steps


def make_npt_lj_runner(
    potential,
    n_particles: int,
    temperature=300.0 * units.kelvin,
    pressure=1.0 * units.atmosphere,
    timestep=2.0 * units.femtoseconds,
    collision_rate=1.0 / units.picoseconds,
    topology=None,
    tm: int = 512,
    barostat_interval: int = 25,
    volume_max_scale: float = 0.01,
    autotune: bool = True,
    autotune_interval: int = 20,
    exact_forces: bool = False,
):
    """Fused NpT production runner: BAOAB Langevin + on-device MC barostat.

    The reference samples NpT with a pure-MC barostat driven one proposal
    at a time from the host (reference chiron/mcmc.py:790-1009); this
    runner compiles the whole hybrid chain -- Langevin segments with an
    isotropic-volume Metropolis move every ``barostat_interval`` steps --
    into ONE ``lax.scan``.  The dense Pallas kernel takes the box as
    DATA, so volume moves recompile nothing; the move's acceptance uses
    the McDonald-1972 NpT Jacobian ``+ N ln(V'/V)`` and the reference's
    autotune rule (/1.1 below 25% acceptance, x1.1 above 75%, cap 0.3)
    runs on device with the scale as carry data.

    Dense-engine domain (N up to ~8k); volume moves leave velocities
    untouched, matching the reference semantics.
    """
    from .ops.lj_dense import LJDensePallas

    if topology is None:
        topology = potential.topology
    n = n_particles
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    beta = 1.0 / kT
    P_md = units.pressure_to_md(pressure)
    dt = units.strip_md(timestep, units.picosecond)
    gamma = units.strip_md(collision_rate, 1.0 / units.picosecond)
    a = float(np.exp(-gamma * dt))
    b = float(np.sqrt(1.0 - np.exp(-2.0 * gamma * dt)))

    op = LJDensePallas(
        n=n, sigma=potential.sigma, epsilon=potential.epsilon,
        cutoff=potential.cutoff, tm=tm, tn=tm,
    )
    n_pad = op.n_pad
    m_lane = jnp.ones((1, n_pad), jnp.float32)
    m_lane = m_lane.at[0, :n].set(
        jnp.asarray(topology.masses(), dtype=jnp.float32)
    )
    sigv = jnp.sqrt(kT / m_lane)
    approx = not exact_forces

    def barostat_attempt(carry: NPTCarry) -> NPTCarry:
        key, k_acc, V, V_new, s = _npt_volume_proposal(
            carry.key, carry.box_diag, carry.vmax_scale
        )
        x_new = carry.x * s
        box_new = carry.box_diag * s
        # the CURRENT configuration's energy was computed by the force
        # pass of the step that scheduled this attempt (carry.U is fresh
        # exactly on those steps) -- only the scaled proposal needs a pass
        U = carry.U
        F_new, U_new = op.force_energy_t(x_new, box_new)
        # dense kernel minimum-image validity: min(box) > 2*cutoff
        box_ok = jnp.min(box_new) > 2.0 * op.cutoff
        accept = _npt_accept(
            k_acc, beta, P_md, n, U, U_new, V, V_new, box_ok
        )
        x = jnp.where(accept, x_new, carry.x)
        box = jnp.where(accept, box_new, carry.box_diag)
        F = jnp.where(accept, F_new, carry.F)
        U_next = jnp.where(accept, U_new, U)
        n_acc = carry.n_accepted + accept.astype(jnp.int32)
        n_prop = carry.n_proposed + 1
        vmax = carry.vmax_scale
        if autotune:
            vmax = _npt_autotune(vmax, n_acc, n_prop, autotune_interval)
        return NPTCarry(
            x=x, v=carry.v, F=F, U=U_next, key=key, box_diag=box,
            vmax_scale=vmax, n_accepted=n_acc, n_proposed=n_prop,
            step=carry.step,
        )

    def step_fn(carry: NPTCarry, _=None):
        key, subkey = jax.random.split(carry.key)
        x, v, F = carry.x, carry.v, carry.F
        box = carry.box_diag
        v = v + (0.5 * dt) * F / m_lane
        x = x + (0.5 * dt) * v
        noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
        v = a * v + b * sigv * noise
        x = x + (0.5 * dt) * v
        Lcol = box.reshape(3, 1)
        x = x - jnp.floor(x / Lcol) * Lcol
        # on steps that feed a barostat attempt, the force pass also
        # returns the potential (one fused kernel either way), so the
        # attempt never recomputes the current configuration's energy
        feeds_attempt = ((carry.step + 1) % barostat_interval) == 0
        F, U = jax.lax.cond(
            feeds_attempt,
            lambda xb: op.force_energy_t(*xb),
            lambda xb: (
                op.force_only_t(*xb, approx_recip=approx), carry.U
            ),
            (x, box),
        )
        v = v + (0.5 * dt) * F / m_lane
        carry = NPTCarry(
            x=x, v=v, F=F, U=U, key=key, box_diag=box,
            vmax_scale=carry.vmax_scale, n_accepted=carry.n_accepted,
            n_proposed=carry.n_proposed, step=carry.step + 1,
        )
        carry = jax.lax.cond(
            carry.step % barostat_interval == 0,
            barostat_attempt, lambda c: c, carry,
        )
        return carry, None

    @partial(jax.jit, static_argnames=("n_steps",))
    def _run(carry, n_steps: int):
        carry, _ = jax.lax.scan(step_fn, carry, length=n_steps)
        return carry

    class NPTRunner:
        def __init__(self):
            self.op = op

        def init(self, positions, box_vectors, seed: int = 0) -> NPTCarry:
            x3 = op.pad_positions(jnp.asarray(positions, jnp.float32))
            box_diag = jnp.diagonal(
                jnp.asarray(box_vectors, jnp.float32)
            ).reshape(1, 3)
            if float(jnp.min(box_diag)) <= 2.0 * op.cutoff:
                raise ValueError(
                    "NpT runner requires min(box) > 2*cutoff for "
                    "minimum-image validity; shrink the cutoff or use a "
                    "larger box"
                )
            key = jax.random.PRNGKey(seed)
            key, vkey = jax.random.split(key)
            v3 = sigv * jax.random.normal(vkey, (3, n_pad))
            F3, U0 = op.force_energy_t(x3, box_diag)
            return NPTCarry(
                x=x3, v=v3, F=F3, U=U0, key=key, box_diag=box_diag,
                vmax_scale=jnp.float32(volume_max_scale),
                n_accepted=jnp.int32(0), n_proposed=jnp.int32(0),
                step=jnp.int32(0),
            )

        def run(self, state: NPTCarry, n_steps: int) -> NPTCarry:
            return _run(state, n_steps)

        def check(self, state: NPTCarry):
            """Raise if the state has gone non-finite (same contract as
            the culled/strip/band runners' latch check).  A NaN blow-up
            otherwise freezes the barostat silently: the NaN guard in
            ``_npt_accept`` rejects every proposal while autotune keeps
            shrinking ``vmax_scale``."""
            ok = bool(
                jnp.isfinite(state.U)
                & jnp.all(jnp.isfinite(state.x))
                & jnp.all(jnp.isfinite(state.v))
            )
            if not ok:
                raise RuntimeError(
                    "dense NpT runner state is non-finite (diverged MD; "
                    "the barostat has been rejecting every proposal) -- "
                    "reduce the timestep and re-run"
                )

        def volume(self, state: NPTCarry):
            return jnp.prod(state.box_diag)

        def acceptance(self, state: NPTCarry):
            prop = int(state.n_proposed)
            return (int(state.n_accepted) / prop) if prop else 0.0

        def energy(self, state: NPTCarry):
            return op.force_energy_t(state.x, state.box_diag)[1]

        def positions(self, state: NPTCarry):
            return op.unpad(state.x)

        def velocities(self, state: NPTCarry):
            return op.unpad(state.v)

    return NPTRunner()
