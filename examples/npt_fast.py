"""NpT at production speed: fused Langevin + on-device MC barostat.

The reference's NpT workload (Examples/LJ_MCMC.py: methane TraPPE-UA,
140 K, 13 atm) drives one MC proposal at a time from the host; this
example samples the same ensemble with the whole hybrid chain compiled
into one program (runtime.make_npt_lj_runner) -- thousands of MD steps
plus volume moves per dispatch.
"""

import time

import jax
import numpy as np

from chiron_tpu import units
from chiron_tpu.potential import LJPotential
from chiron_tpu.runtime import make_npt_lj_runner
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.topology import Topology


def main():
    # methane TraPPE-UA parameters, as in the reference's LJ_MCMC example
    n = 1100
    sigma = 0.373 * units.nanometer
    epsilon = 0.2941 * units.kilocalories_per_mole
    topology = Topology.uniform(n, mass=16.04, element="C")
    potential = LJPotential(
        topology, sigma=sigma, epsilon=epsilon,
        cutoff=3.0 * 0.373 * units.nanometer,
    )
    # start from a lattice at a plausible liquid density
    seed_fluid = LennardJonesFluid(nparticles=n, reduced_density=0.5)

    runner = make_npt_lj_runner(
        potential, n, topology=topology,
        temperature=140.0 * units.kelvin,
        pressure=13.0 * units.atmosphere,
        barostat_interval=25,
    )
    box0 = np.eye(3, dtype=np.float32) * (
        (n / 0.5) ** (1 / 3) * 0.373
    )
    state = runner.init(
        seed_fluid.positions.value_in_unit_system(units.md_unit_system),
        box0, seed=2024,
    )

    n_steps = 20_000
    state = runner.run(state, n_steps)   # compile + run
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    state = runner.run(state, n_steps)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    print(f"{n_steps} NpT steps in {dt:.2f} s -> {n_steps/dt:.0f} steps/s")
    print(f"volume: {float(runner.volume(state)):.1f} nm^3  "
          f"({int(state.n_proposed)} volume moves, "
          f"{runner.acceptance(state):.0%} accepted, "
          f"scale autotuned to {float(state.vmax_scale):.4f})")
    print(f"potential energy: {float(runner.energy(state)):.1f} kJ/mol")


if __name__ == "__main__":
    main()
