"""Ideal-gas NpT Monte Carlo: displacement + barostat moves.

Recreates reference Examples/Idealgas.py: 216 non-interacting particles at
298 K / 1 atm; the sampled volume distribution must match the analytic NpT
expectation <V> = (N+1) kT / p within 5% (mean) and 25% (std; the reference's
10% bound needs far longer chains than this example runs).
"""

import jax.numpy as jnp

from chiron_tpu import units
from chiron_tpu.mcmc import (
    MCMCSampler,
    MonteCarloBarostatMove,
    MonteCarloDisplacementMove,
    MoveSchedule,
)
from chiron_tpu.neighbors import OrthogonalPeriodicSpace, PairListNsqrd
from chiron_tpu.reporters import BaseReporter, MCReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import IdealGas
from chiron_tpu.utils import PRNG


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    n_particles = 216
    temperature = 298 * units.kelvin
    pressure = 1 * units.atmosphere

    ideal_gas = IdealGas(
        nparticles=n_particles, temperature=temperature, pressure=pressure
    )

    thermodynamic_state = ThermodynamicState(
        potential=ideal_gas.potential,
        temperature=temperature,
        pressure=pressure,
    )

    PRNG.set_seed(1234)
    sampler_state = SamplerState(
        positions=ideal_gas.positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=ideal_gas.box_vectors,
    )

    nbr_list = PairListNsqrd(OrthogonalPeriodicSpace(), cutoff=None)
    nbr_list.build_from_state(sampler_state)

    BaseReporter.set_directory("output/ideal_gas")
    reporter = MCReporter("test_mc_ideal_gas", 100)
    reporter.reset_reporter_file()

    mc_barostat_move = MonteCarloBarostatMove(
        volume_max_scale=0.2,
        number_of_moves=1000,
        reporter=reporter,
        report_interval=10,
        autotune=True,
        autotune_interval=100,
    )
    metropolis_displacement_move = MonteCarloDisplacementMove(
        displacement_sigma=0.1 * units.nanometer,
        number_of_moves=100,
        autotune=True,
        autotune_interval=100,
    )
    move_set = MoveSchedule(
        [
            ("MonteCarloDisplacementMove", metropolis_displacement_move),
            ("MonteCarloBarostatMove", mc_barostat_move),
        ]
    )

    sampler = MCMCSampler(move_set)
    sampler.run(
        sampler_state, thermodynamic_state, n_iterations=10, nbr_list=nbr_list
    )

    volume = reporter.get_property("volume")

    ideal_volume = ideal_gas.get_volume_expectation(thermodynamic_state)
    ideal_volume_std = ideal_gas.get_volume_standard_deviation(
        thermodynamic_state
    )
    print("ideal volume and std:", ideal_volume, ideal_volume_std)

    # discard first 30% as equilibration
    vols = jnp.asarray(volume)[int(len(volume) * 0.3):]
    volume_mean = float(vols.mean())
    volume_std = float(vols.std())
    print("measured volume and std:", volume_mean, volume_std)

    assert abs(ideal_volume - volume_mean) / ideal_volume < 0.05, (
        f"{abs(ideal_volume - volume_mean) / ideal_volume} exceeds 5%"
    )
    assert abs(ideal_volume_std - volume_std) / ideal_volume_std < 0.25, (
        f"{abs(ideal_volume_std - volume_std) / ideal_volume_std} exceeds 25%"
    )
    print("ideal-gas NpT expectations: PASS")


if __name__ == "__main__":
    main()
