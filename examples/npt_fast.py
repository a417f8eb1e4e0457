"""NpT at production speed: fused Langevin + on-device MC barostat.

The reference's NpT workload (Examples/LJ_MCMC.py: methane TraPPE-UA,
140 K, 13 atm) drives one MC proposal at a time from the host; this
example samples the same ensemble -- at the EXACT reference state point
(1100 packed methanes, 4.275 nm box; see examples/pack_methane.py) --
with the whole hybrid chain compiled into one program
(runtime.make_npt_lj_runner, the dense engine -- the right tool at
N=1100 where the box is only ~3 cutoffs wide; the culled NpT variant
takes over at flagship sizes, BENCH.md): thousands of MD steps plus
volume moves per dispatch, with the current configuration's energy
carried so each barostat attempt costs one fused pass.
"""

import time

import jax
import numpy as np

from chiron_tpu import units
from chiron_tpu.potential import LJPotential
from chiron_tpu.runtime import make_npt_lj_runner
from chiron_tpu.topology import Topology
from chiron_tpu.utils import get_data_file_path


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    # methane TraPPE-UA parameters, as in the reference's LJ_MCMC example
    n = 1100
    sigma = 0.373 * units.nanometer
    epsilon = 0.2941 * units.kilocalories_per_mole
    cutoff = 1.4 * units.nanometer
    topology = Topology.uniform(n, mass=16.04, element="C")
    potential = LJPotential(
        topology, sigma=sigma, epsilon=epsilon, cutoff=cutoff,
    )
    positions = np.load(get_data_file_path("methane_1100_box4p275.npy"))
    box_L = 4.275021399280942
    box0 = np.eye(3, dtype=np.float32) * box_L

    runner = make_npt_lj_runner(
        potential, n, topology=topology,
        temperature=140.0 * units.kelvin,
        pressure=13.00765 * units.atmosphere,
        barostat_interval=25,
    )
    state = runner.init(positions, box0, seed=2024)

    n_steps = 20_000
    state = runner.run(state, n_steps)   # compile + run
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    state = runner.run(state, n_steps)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    print(f"{n_steps} NpT steps in {dt:.2f} s -> {n_steps/dt:.0f} steps/s")
    V = float(runner.volume(state))
    rho = n * 16.04 / 6.02214076e23 / (V * 1e-21)  # g/cm^3
    print(f"volume: {V:.1f} nm^3 (density {rho:.3f} g/cm^3)  "
          f"({int(state.n_proposed)} volume moves, "
          f"{runner.acceptance(state):.0%} accepted, "
          f"scale autotuned to {float(state.vmax_scale):.4f})")
    print(f"potential energy: {float(runner.energy(state)):.1f} kJ/mol")


if __name__ == "__main__":
    main()
