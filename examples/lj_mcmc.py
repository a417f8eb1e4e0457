"""LJ fluid NPT MCMC: displacement + barostat + Langevin move mix.

Recreates reference Examples/LJ_MCMC.py: united-atom methane (TraPPE-UA,
sigma=3.73 A, eps/kB=148 K), N=1100, T=140 K, p=13 atm.
"""

import jax.numpy as jnp

from chiron_tpu import units
from chiron_tpu.mcmc import (
    LangevinDynamicsMove,
    MCMCSampler,
    MonteCarloBarostatMove,
    MonteCarloDisplacementMove,
    MoveSchedule,
)
from chiron_tpu.neighbors import DensePairs, OrthogonalPeriodicSpace
from chiron_tpu.potential import LJPotential
from chiron_tpu.reporters import BaseReporter, MCReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.utils import PRNG


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    # TraPPE-UA methane (reference Examples/LJ_MCMC.py:10-13)
    sigma = 0.373 * units.nanometer
    kB_K = 0.008314462618  # kJ/mol/K
    epsilon = units.Quantity(148.0 * kB_K, units.kilojoule_per_mole)
    cutoff = 1.4 * units.nanometer

    # the reference state point EXACTLY: 1100 packed methanes in the
    # 4.275 nm cubic box (reference Examples/LJ_MCMC.py:29-42); the
    # packed configuration is generated deterministically by
    # examples/pack_methane.py (the reference used packmol via mbuild)
    import numpy as np

    from chiron_tpu.topology import Topology
    from chiron_tpu.utils import get_data_file_path

    coords_path = get_data_file_path("methane_1100_box4p275.npy")
    positions = units.Quantity(
        jnp.asarray(np.load(coords_path)), units.nanometer
    )
    box_L = 4.275021399280942
    box_vectors = units.Quantity(
        jnp.diag(jnp.full(3, box_L)), units.nanometer
    )
    topology = Topology.from_masses(np.full(1100, 16.04))

    lj = LJPotential(topology, sigma=sigma, epsilon=epsilon, cutoff=cutoff)

    temperature = 140.0 * units.kelvin
    pressure = 13.00765 * units.atmosphere

    thermodynamic_state = ThermodynamicState(
        potential=lj, temperature=temperature, pressure=pressure
    )

    PRNG.set_seed(1234)
    sampler_state = SamplerState(
        positions=positions,
        current_PRNG_key=PRNG.get_random_key(),
        box_vectors=box_vectors,
    )

    # DensePairs: the fused-kernel scheme -- no neighbor tables, no skin,
    # no capacity tuning, barostat box changes flow through the state.
    nbr_list = DensePairs(OrthogonalPeriodicSpace(), cutoff=cutoff)
    nbr_list.build_from_state(sampler_state)

    BaseReporter.set_directory("output/lj_mcmc")
    reporter = MCReporter("lj_mcmc", 10)
    reporter.reset_reporter_file()

    move_set = MoveSchedule(
        [
            (
                "MonteCarloDisplacementMove",
                MonteCarloDisplacementMove(
                    displacement_sigma=0.01 * units.nanometer,
                    number_of_moves=100,
                    autotune=True,
                    autotune_interval=100,
                ),
            ),
            (
                "MonteCarloBarostatMove",
                MonteCarloBarostatMove(
                    volume_max_scale=0.1,
                    number_of_moves=20,
                    reporter=reporter,
                    report_interval=1,
                    autotune=True,
                    autotune_interval=50,
                ),
            ),
            (
                "LangevinDynamicsMove",
                LangevinDynamicsMove(
                    timestep=1.0 * units.femtoseconds, number_of_steps=200
                ),
            ),
        ]
    )

    sampler = MCMCSampler(move_set)
    final_state, _, final_nbr = sampler.run(
        sampler_state, thermodynamic_state, n_iterations=5, nbr_list=nbr_list
    )

    volume = reporter.get_property("volume")
    print("sampled volumes (nm^3):", volume[-10:])
    e = lj.compute_energy(final_state.positions, final_nbr)
    print("final energy:", float(e), "kJ/mol")
    assert bool(jnp.isfinite(e))

    # density sanity at the reference state point: liquid methane at
    # 140 K / 13 atm is ~0.37 g/cm^3 (the packed start is 0.375); the
    # short NpT chain must keep the sampled density in the liquid range
    V_mean = float(np.mean(np.asarray(volume)[-10:]))
    rho = 1100 * 16.04 / 6.02214076e23 / (V_mean * 1e-21)  # g/cm^3
    print(f"mean sampled density: {rho:.3f} g/cm^3")
    assert 0.25 < rho < 0.50, rho


if __name__ == "__main__":
    main()
