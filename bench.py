"""Benchmark driver: LJ-fluid (N=4000) Langevin throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.json north-star: LJ-fluid Langevin steps/sec per
chip.  The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against the BASELINE.json *target* of 1e6
steps/min (= 16666.7 steps/sec) on one v5e chip: vs_baseline > 1.0 means the
target is beaten.
"""

import json
import subprocess
import sys
import time

# Preflight BEFORE the jax import: with the axon plugin on PYTHONPATH a
# wedged tunnel makes `import jax` itself block forever in a
# connect-retry loop (observed after a SIGKILLed client).  Fail fast
# with a diagnostic instead of hanging the benchmark driver.  On
# timeout the probe is SIGTERMed with a grace period and NEVER
# SIGKILLed: device init IS the grant acquisition, and SIGKILLing a
# client mid-grant is exactly what wedges the tunnel for ~10 minutes
# (a SIGTERM is recorded to recover cleanly).  A probe that ignores
# SIGTERM is left behind -- an orphan blocked in a connect loop is
# harmless; a wedged device is not.
_probe = subprocess.Popen(
    [sys.executable, "-c", "import jax; jax.devices()"],
    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
)
try:
    _probe.wait(timeout=600)
except subprocess.TimeoutExpired:
    _probe.terminate()
    try:
        _probe.wait(timeout=60)
    except subprocess.TimeoutExpired:
        pass  # leave the orphan; never SIGKILL a TPU client
    sys.stderr.write(
        "bench.py: JAX backend unreachable (import jax / device init "
        "did not return within 600 s -- axon tunnel down?); aborting "
        "instead of hanging\n"
        "bench.py: NOT a fresh measurement -- for the record, the last "
        "hardware measurement of this exact config was 15,098 steps/s "
        "(vs_baseline 0.906, round-5 session 2026-08-19), best-of-5 x "
        "3000-step windows, latch-checked; methodology in BENCH.md "
        "(round-4 drift-fold table + round-5 record)\n"
    )
    sys.exit(2)
if _probe.returncode != 0:
    sys.stderr.write(
        "bench.py: JAX backend failed to initialize:\n"
        + _probe.stderr.read().decode(errors="replace")[-2000:]
    )
    sys.exit(2)
_probe.stderr.close()

import jax


def main():
    import numpy as np

    from chiron_tpu.utils import enable_compilation_cache

    # persistent compile cache: a fresh process after the first ever run
    # skips the axon remote compiler entirely (compile diet, BENCH.md)
    enable_compilation_cache()

    from chiron_tpu import units
    from chiron_tpu.runtime import make_culled_lj_runner, make_fast_lj_runner
    from chiron_tpu.testsystems import LennardJonesFluid

    n_particles = 4000
    n_steps_equil = 1000
    n_steps_bench = 3000

    fluid = LennardJonesFluid(nparticles=n_particles, reduced_density=0.8)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)

    # equilibrate the lattice melt with the dense engine (exact at every
    # step; the production engines assume thermal dynamics for their
    # tile-skin drift bound)
    fast = make_fast_lj_runner(
        potential=fluid.potential,
        n_particles=n_particles,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
    )
    fs = fast.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        box,
        seed=1234,
    )
    fs = fast.run(fs, n_steps_equil)
    eq_pos = np.asarray(fast.positions(fs))

    # production engine: culled tile-pair fused kernel (ops/lj_cull.py).
    # With the tile-skin check folded into the kernel (round 4) the
    # (segment, slack) optimum moved to S=40/0.15: shorter segments keep
    # the drift budget under a tighter slack, and the tighter reach
    # carries ~2% fewer pair slots -- measured latch-safe over 21k steps
    # (BENCH.md round-4 table; S=50/0.15 DOES latch, keep them paired)
    runner = make_culled_lj_runner(
        potential=fluid.potential,
        n_particles=n_particles,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
        slack=0.15,
        segment_steps=40,
    )
    state = runner.init(eq_pos, box, seed=1234)

    # compile+run the exact benched program once so the timed call is
    # pure execution
    state = runner.run(state, n_steps_bench)
    jax.block_until_ready(state.x)

    dt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        state = runner.run(state, n_steps_bench)
        jax.block_until_ready(state.x)
        dt = min(dt, time.perf_counter() - t0)
    runner.check(state)  # tile-skin/capacity invariants held

    steps_per_sec = n_steps_bench / dt
    target = 1e6 / 60.0  # BASELINE.json: 1e6 steps/min on one v5e chip
    print(
        json.dumps(
            {
                "metric": "lj_fluid_n4000_langevin_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
