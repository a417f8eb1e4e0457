"""Engine-domain benchmark: LJ-fluid Langevin throughput across N.

Reproduces the BENCH.md large-N table on whatever backend is live (run
on the TPU host for the recorded numbers).  Each engine is warmed with
the exact step count it is timed on (scan length is a static jit key),
then timed best-of-2.

Usage: python benchmarks/large_n.py [N ...]   (default: 4000 16384 65536)
"""

import sys
import time

import jax
import numpy as np

from chiron_tpu import units
from chiron_tpu.runtime import (
    make_band_lj_runner, make_culled_lj_runner, make_fast_lj_runner,
    make_lj_runner, make_strip_lj_runner)
from chiron_tpu.testsystems import LennardJonesFluid

def _culled_tuned(n_particles, **kw):
    # per-size (segment_steps, slack) optima under the round-4 in-kernel
    # drift check (jobs j59/j60 at 4k, j69/j71 at 16k/32k): tighter
    # slack cuts pair slots where the rebuild share matters; at >=32k
    # the force pass dominates and the configs tie, keep the r3 point
    if n_particles <= 8192:
        S, slack = 40, 0.15
    elif n_particles <= 16384:
        S, slack = 25, 0.12
    else:
        S, slack = 50, 0.2
    return make_culled_lj_runner(
        n_particles=n_particles, slack=slack, segment_steps=S, **kw)


ENGINES = {
    "culled": _culled_tuned,
    "band": make_band_lj_runner,
    "strip": make_strip_lj_runner,
}


def equilibrate(fluid, n, box):
    """Thermalize the lattice start with a robust engine (dense below
    ~8k, band above -- the production engines assume thermal drift)."""
    mk = make_fast_lj_runner if n <= 8192 else make_band_lj_runner
    r = mk(potential=fluid.potential, n_particles=n,
           topology=fluid.topology, temperature=120.0 * units.kelvin,
           timestep=2.0 * units.femtoseconds)
    s = r.init(fluid.positions.value_in_unit_system(units.md_unit_system),
               box, seed=1234)
    s = r.run(s, 1000 if n <= 8192 else 500)
    return np.asarray(r.positions(s))


def bench(n, n_steps=None):
    n_steps = n_steps or max(200, min(2000, 8_000_000 // n))
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.8)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)
    eq = equilibrate(fluid, n, box)
    print(f"N={n} equilibrated; timing {n_steps} steps", flush=True)
    for name, mk in ENGINES.items():
        try:
            r = mk(potential=fluid.potential, n_particles=n,
                   topology=fluid.topology,
                   temperature=120.0 * units.kelvin,
                   timestep=2.0 * units.femtoseconds)
            st = r.init(eq, box, seed=1)
            st = r.run(st, n_steps)
            jax.block_until_ready(st.x)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                st = r.run(st, n_steps)
                jax.block_until_ready(st.x)
                best = min(best, time.perf_counter() - t0)
            ok = "ok"
            if hasattr(r, "check"):
                try:
                    r.check(st)
                except RuntimeError:
                    ok = "OVERFLOW"
            print(f"  N={n} {name}: {n_steps/best:.0f} steps/s {ok}",
                  flush=True)
        except Exception as e:  # engines have hard applicability limits
            print(f"  N={n} {name}: inapplicable "
                  f"({type(e).__name__}: {str(e)[:100]})", flush=True)
    auto = make_lj_runner(fluid.potential, n, box_vectors=fluid.box_vectors,
                          topology=fluid.topology)
    print(f"  auto-selector picks: {type(auto).__name__}", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [4000, 16384, 65536]
    for n in sizes:
        bench(n)
