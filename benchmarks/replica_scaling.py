"""Replica-throughput scaling on one chip (BENCH.md replica table).

Dense-kernel PT path, LJ N=1000, within-chip vmap blocks on a 1-device
mesh: measures steps/s per ladder at R=1/8/16/64 and the aggregate
replica*steps/s (the chip saturates near R=8; cross-chip scaling is the
embarrassingly-parallel axis).  Run on the TPU host.
"""
import time
import numpy as np
import jax
from jax.sharding import Mesh

from chiron_tpu import units
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.parallel.tempering import ParallelTemperingSampler

assert jax.default_backend() == "tpu"
mesh = Mesh(np.array(jax.devices()[:1]), ("replica",))

n = 1000
fluid = LennardJonesFluid(nparticles=n, reduced_density=0.8)
pos = fluid.positions.value_in_unit_system(units.md_unit_system)
box = np.asarray(
    fluid.box_vectors.value_in_unit_system(units.md_unit_system))

STEPS = 2000
rows = []
for R in (1, 8, 16, 64):
    temps = list(np.linspace(120.0, 200.0, R)) if R > 1 else [120.0]
    pt = ParallelTemperingSampler(fluid.potential, temps, mesh=mesh)
    pt.initialize(pos, box, seed=7)
    pt.propagate(STEPS)   # warm the exact program
    jax.block_until_ready(pt.positions)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        pt.propagate(STEPS)
        jax.block_until_ready(pt.positions)
        best = min(best, time.perf_counter() - t0)
    sps = STEPS / best
    rows.append((R, sps, R * sps))
    print(f"R={R:3d}: {sps:8.0f} steps/s/replica-ladder  "
          f"{R * sps:10.0f} replica*steps/s", flush=True)

base = rows[0][2]
for R, sps, agg in rows:
    print(f"R={R:3d} efficiency vs R=1: {agg / (base * R):.2%}", flush=True)
