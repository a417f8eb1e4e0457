"""Flagship throughput workload: LJ fluid N=4000 on the culled fused kernel.

This is the bench.py configuration as a user-facing example: the dense
engine handles the violent lattice-melt equilibration (exact at every
step), then the culled tile-pair engine -- spatial sort, tile-level Verlet
list, whole BAOAB step fused in one Pallas kernel -- runs production at
~12,500 steps/s on one v5e chip (BENCH.md).
"""

import jax
import numpy as np

from chiron_tpu import units
from chiron_tpu.profiling import Throughput
from chiron_tpu.runtime import make_culled_lj_runner, make_fast_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    n = 4000
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.8)
    box = fluid.box_vectors.value_in_unit_system(units.md_unit_system)

    # equilibrate the lattice melt with the dense engine
    fast = make_fast_lj_runner(
        potential=fluid.potential,
        n_particles=n,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
    )
    fs = fast.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        box,
        seed=1234,
    )
    fs = fast.run(fs, 2000)
    jax.block_until_ready(fs.x)

    # production: culled tile-pair engine
    runner = make_culled_lj_runner(
        potential=fluid.potential,
        n_particles=n,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
    )
    state = runner.init(np.asarray(fast.positions(fs)), box, seed=1234)

    # compile + settle
    state = runner.run(state, 2000)
    jax.block_until_ready(state.x)
    print("equilibrated; energy:", float(runner.energy(state)), "kJ/mol")

    tp = Throughput()
    for _ in range(5):
        with tp.measure(n_steps=2000):
            state = runner.run(state, 2000)
            jax.block_until_ready(state.x)
    print(tp.report())
    print(
        f"throughput: {tp.steps_per_second:.0f} steps/s "
        f"({tp.steps_per_minute/1e6:.2f}M steps/min)"
    )
    runner.check(state)  # tile-skin invariants held throughout


if __name__ == "__main__":
    main()
