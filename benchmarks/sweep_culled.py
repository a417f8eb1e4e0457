"""Culled-engine design-space sweep at the flagship size (N=4000).

The harness behind BENCH.md's dead-end inventory: unroll depth, slack,
tile shape, segment length, sort/rebuild cadence, fused rebuild.  Each
config is warmed on the exact timed program (static scan length), then
timed best-of-3.

Usage: python benchmarks/sweep_culled.py
"""

import time

import jax
import numpy as np

from chiron_tpu import units
from chiron_tpu.runtime import make_culled_lj_runner, make_fast_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid

CONFIGS = [
    ("production (U4 s0.2 tn256 S50)", dict(unroll=4, slack=0.2)),
    ("slack 0.3", dict(unroll=4, slack=0.3)),
    ("unroll 2", dict(unroll=2, slack=0.2)),
    ("tn 128", dict(unroll=4, slack=0.2, tn=128)),
    ("segment 100", dict(unroll=4, slack=0.2, segment_steps=100)),
    ("sort every 4", dict(unroll=4, slack=0.2, sort_every=4)),
    ("fused rebuild", dict(unroll=4, slack=0.2, fused_rebuild=True)),
]


def main(n=4000, n_steps=2000):
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.8)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    fast = make_fast_lj_runner(
        potential=fluid.potential, n_particles=n, topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds)
    fs = fast.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        box, seed=1234)
    fs = fast.run(fs, 1000)
    eq = np.asarray(fast.positions(fs))

    for label, kw in CONFIGS:
        runner = make_culled_lj_runner(
            potential=fluid.potential, n_particles=n,
            topology=fluid.topology, temperature=120.0 * units.kelvin,
            timestep=2.0 * units.femtoseconds, **kw)
        state = runner.init(eq, box, seed=1234)
        state = runner.run(state, n_steps)
        jax.block_until_ready(state.x)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            state = runner.run(state, n_steps)
            jax.block_until_ready(state.x)
            best = min(best, time.perf_counter() - t0)
        try:
            runner.check(state)
            ok = "ok"
        except RuntimeError:
            ok = "OVERFLOWED"
        print(f"{label}: {n_steps/best:.0f} steps/s "
              f"E={float(runner.energy(state)):.1f} {ok}", flush=True)


if __name__ == "__main__":
    main()
