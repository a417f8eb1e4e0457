"""LJ fluid Langevin MD with a Verlet neighbor list.

Recreates reference Examples/LJ_langevin.py (argon-like parameters,
N=1000, reduced density 0.1, cutoff 3 sigma, skin 0.5 nm) on the TPU-native
stack: the whole propagation is compiled scans; reporting drains in chunks.
"""

import time

import jax

from chiron_tpu import units
from chiron_tpu.integrators import LangevinIntegrator
from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
from chiron_tpu.reporters import BaseReporter, LangevinDynamicsReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.utils import PRNG


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    lj_fluid = LennardJonesFluid(nparticles=1000, reduced_density=0.1)
    PRNG.set_seed(1234)

    sampler_state = SamplerState(
        positions=lj_fluid.positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=lj_fluid.box_vectors,
    )
    thermodynamic_state = ThermodynamicState(
        potential=lj_fluid.potential, temperature=300 * units.kelvin
    )

    nbr_list = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=lj_fluid.cutoff,
        skin=0.5 * units.nanometer,
        n_max_neighbors=180,
    )
    nbr_list.build_from_state(sampler_state)

    BaseReporter.set_directory("output/lj_langevin")
    reporter = LangevinDynamicsReporter("test_lj", 1, lj_fluid.topology)
    reporter.reset_reporter_file()

    integrator = LangevinIntegrator(reporter=reporter, report_interval=100)
    print(
        "init_energy:",
        float(
            lj_fluid.potential.compute_energy(sampler_state.positions, nbr_list)
        ),
    )

    t0 = time.perf_counter()
    updated_sampler_state, updated_nbr_list = integrator.run(
        sampler_state,
        thermodynamic_state,
        number_of_steps=1000,
        nbr_list=nbr_list,
    )
    jax.block_until_ready(updated_sampler_state.positions)
    dt = time.perf_counter() - t0

    reporter.flush_buffer()
    energies = reporter.get_property("potential_energy")
    steps = reporter.get_property("step")
    print("steps:", steps)
    print("energies:", energies)
    print(f"1000 steps in {dt:.3f}s ({1000/dt:.0f} steps/sec incl. compile)")


if __name__ == "__main__":
    main()
