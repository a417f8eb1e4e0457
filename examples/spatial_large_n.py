"""Large-N LJ fluid with the particle axis sharded across a device mesh.

The single-replica scaling story (SURVEY.md section 5 "long-context
analogue"): at particle counts where one chip's pair stage no longer fits
the step budget, `make_spatial_lj_runner` shards contiguous row slabs of
the particle axis across the mesh -- each device integrates its own slab
and the only inter-chip traffic is one all_gather of positions per step.

Runs on however many devices are visible; to emulate a pod slice on CPU:

    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/spatial_large_n.py
"""

import time

import jax
import numpy as np
from jax.sharding import Mesh

from chiron_tpu import units
from chiron_tpu.parallel import make_spatial_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    n = 4096  # scale up on real hardware; modest here so CPU finishes fast
    fluid = LennardJonesFluid(nparticles=n, reduced_density=0.8)

    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("spatial",))
    print(f"{len(devices)} device(s): rows sharded "
          f"{n} / {len(devices)} = {n // len(devices)} per device")

    runner = make_spatial_lj_runner(
        mesh,
        fluid.potential,
        n,
        temperature=120.0 * units.kelvin,
        timestep=2.0 * units.femtoseconds,
        topology=fluid.topology,
    )
    state = runner.init(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=2024,
    )

    n_steps = 200
    state = runner.run(state, n_steps)  # compile + run
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    state = runner.run(state, n_steps)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    print(f"{n_steps} steps in {dt:.3f} s -> {n_steps / dt:.1f} steps/s")
    print("potential energy:", float(runner.energy(state)), "kJ/mol")
    print("force sharding:", state.F.sharding)


if __name__ == "__main__":
    main()
