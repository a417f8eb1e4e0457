"""LJ fluid sampled by a single Monte Carlo displacement move.

Recreates reference Examples/LJ_mcmove.py: N=1100 LJ fluid, one
MonteCarloDisplacementMove with autotuning, neighbor list maintained on
device inside the compiled chain.
"""

import jax.numpy as jnp

from chiron_tpu import units
from chiron_tpu.mcmc import MonteCarloDisplacementMove
from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
from chiron_tpu.reporters import BaseReporter, MCReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.utils import PRNG


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    fluid = LennardJonesFluid(nparticles=1100, reduced_density=0.1)

    PRNG.set_seed(1234)
    sampler_state = SamplerState(
        positions=fluid.positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=fluid.box_vectors,
    )
    thermodynamic_state = ThermodynamicState(
        potential=fluid.potential, temperature=300 * units.kelvin
    )
    nbr_list = NeighborListNsqrd(
        OrthogonalPeriodicSpace(),
        cutoff=fluid.cutoff,
        skin=0.5 * units.nanometer,
        n_max_neighbors=180,
    )
    nbr_list.build_from_state(sampler_state)

    BaseReporter.set_directory("output/lj_mcmove")
    reporter = MCReporter("lj_mcmove", 10)
    reporter.reset_reporter_file()

    move = MonteCarloDisplacementMove(
        displacement_sigma=0.01 * units.nanometer,
        number_of_moves=1000,
        reporter=reporter,
        report_interval=50,
        autotune=True,
        autotune_interval=100,
    )
    out_state, _, out_nbr = move.update(
        sampler_state, thermodynamic_state, nbr_list
    )
    print(
        f"acceptance: {move.n_accepted}/{move.n_proposed} "
        f"({move.n_accepted / move.n_proposed:.2f})"
    )
    print(
        "autotuned sigma:",
        move.displacement_sigma.value_in_unit_system(units.md_unit_system),
        "nm",
    )
    e = fluid.potential.compute_energy(out_state.positions, out_nbr)
    print("final energy:", float(e), "kJ/mol")
    assert bool(jnp.isfinite(e))


if __name__ == "__main__":
    main()
