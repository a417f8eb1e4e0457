"""Flagship throughput workload: LJ fluid N=4000 on the fused Pallas kernel.

This is the bench.py configuration as a user-facing example: the zero-copy
runner keeps all state in the kernel's (3, n_pad) layout and each
`runner.run(state, n)` call is one compiled scan -- ~6,800 steps/s on one
v5e chip (BENCH.md).
"""

import jax

from chiron_tpu import units
from chiron_tpu.profiling import Throughput
from chiron_tpu.runtime import make_fast_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid


def main():
    n = 4000
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.8)
    runner = make_fast_lj_runner(
        potential=fluid.potential,
        n_particles=n,
        topology=fluid.topology,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=1234,
    )

    # compile + equilibrate
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


if __name__ == "__main__":
    main()
