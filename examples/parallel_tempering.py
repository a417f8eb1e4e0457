"""Replica-parallel tempering of an LJ fluid across all available devices.

The BASELINE.json flagship distributed config ("64-replica parallel tempering
... one replica/chip"): replicas are sharded over the device mesh with
shard_map; each chip integrates its block; swaps exchange only O(R) scalars.

On a single chip this still runs (mesh of 1); on a v5e-8 the same script
scales the replica axis across ICI with no code change.
"""

import numpy as np

import jax

from chiron_tpu import units
from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
from chiron_tpu.parallel import ParallelTemperingSampler, make_replica_mesh
from chiron_tpu.testsystems import LennardJonesFluid


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    n_devices = len(jax.devices())
    replicas_per_device = max(1, 8 // n_devices)
    n_replicas = n_devices * replicas_per_device

    fluid = LennardJonesFluid(nparticles=256, reduced_density=0.4)
    nbr = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=fluid.cutoff,
        skin=0.3 * units.nanometer,
        n_max_neighbors=160,
    )

    temps = [120.0 * 1.08 ** i for i in range(n_replicas)]
    mesh = make_replica_mesh(n_devices)
    pt = ParallelTemperingSampler(
        potential=fluid.potential,
        temperatures=[t * units.kelvin for t in temps],
        timestep=2.0 * units.femtoseconds,
        pairs=nbr,
        mesh=mesh,
    )
    pt.initialize(
        fluid.positions.value_in_unit_system(units.md_unit_system),
        box_vectors=fluid.box_vectors.value_in_unit_system(units.md_unit_system),
        seed=1234,
    )

    import time

    # warm up with the exact step count so the timed window excludes the
    # compile of the n_steps-static propagator
    pt.run(n_iterations=2, steps_per_iteration=200)
    t0 = time.perf_counter()
    pt.run(n_iterations=20, steps_per_iteration=200)
    dt = time.perf_counter() - t0
    total_steps = 20 * 200
    print(
        f"{n_replicas} replicas on {n_devices} device(s): "
        f"{total_steps} PT steps in {dt:.2f}s "
        f"({n_replicas * total_steps / dt:.0f} replica-steps/sec)"
    )
    print("swap acceptance:", pt.swap_acceptance_fraction)
    f_k = pt.compute_free_energies()
    print("ladder free energies (kT):", np.round(f_k, 3))
    # error bars via iteration resampling (valid under swap mixing)
    d_f_k = pt.estimator.bootstrap_d_f_k(n_bootstrap=20, seed=0)
    print("bootstrap d f_k (kT):   ", np.round(d_f_k, 3))


if __name__ == "__main__":
    main()
