"""Hamiltonian-exchange free-energy ladder: epsilon-scaled LJ states.

The production free-energy workflow this framework (like the reference,
whose README bills chiron as a differentiable-MCMC engine for free
energies) exists to serve: a ladder of ALCHEMICALLY scaled Hamiltonians
U_k = lambda_k * U_LJ at one temperature, sampled by replica exchange,
with MBAR recovering the reduced free energy of switching the
interactions on, error bars from both the asymptotic covariance and
iteration-resampling bootstrap, and reweighting to a lambda that was
never sampled (mbar_perturbed_free_energies).

Because U scales linearly in epsilon, the exact reduced-potential
relation u_k = (lambda_k / lambda_0) * u_0 gives two internal oracles:
the u_kn matrix rows must be proportional, and the perturbed-state
estimate at a SAMPLED lambda must reproduce the solved f_k.
"""

import numpy as np

from chiron_tpu import units
from chiron_tpu.mcmc import LangevinDynamicsMove, MCMCSampler, MoveSchedule
from chiron_tpu.multistate import ReplicaExchangeSampler
from chiron_tpu.neighbors import NeighborListNsqrd, OrthogonalPeriodicSpace
from chiron_tpu.potential import LJPotential
from chiron_tpu.reporters import BaseReporter, MultistateReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import LennardJonesFluid
from chiron_tpu.utils import PRNG


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    # ladder spacing is chosen for healthy phase-space overlap:
    # d f/d lambda = <beta U_LJ> ~ -2.5 kT/particle here, so 27
    # particles at 0.075-lambda rungs put adjacent states ~2 kT apart
    lambdas = [float(x) for x in np.round(np.linspace(0.25, 1.0, 11), 4)]
    fluid = LennardJonesFluid(nparticles=27, reduced_density=0.4)
    T = 300.0 * units.kelvin

    thermodynamic_states = [
        ThermodynamicState(
            LJPotential(
                fluid.topology,
                sigma=fluid.sigma,
                epsilon=lam * fluid.epsilon,
                cutoff=fluid.cutoff,
            ),
            temperature=T,
        )
        for lam in lambdas
    ]
    PRNG.set_seed(2024)
    sampler_states = [
        SamplerState(
            fluid.positions,
            current_PRNG_key=PRNG.get_random_key(),
            box_vectors=fluid.box_vectors,
        )
        for _ in lambdas
    ]
    nbr_lists = [
        NeighborListNsqrd(
            OrthogonalPeriodicSpace(),
            cutoff=fluid.cutoff,
            skin=0.3 * units.nanometer,
            n_max_neighbors=80,
        )
        for _ in lambdas
    ]

    BaseReporter.set_directory("output/lj_hamiltonian_ladder")
    reporter = MultistateReporter()
    reporter.reset_reporter_file()

    move = LangevinDynamicsMove(
        timestep=2.0 * units.femtoseconds, number_of_steps=100
    )
    mcmc_sampler = MCMCSampler(MoveSchedule([("LangevinDynamicsMove", move)]))
    sampler = ReplicaExchangeSampler(
        mcmc_sampler=mcmc_sampler, reporter=reporter
    )
    sampler.create(
        thermodynamic_states=thermodynamic_states,
        sampler_states=sampler_states,
        nbr_lists=nbr_lists,
    )
    sampler.run(20)

    est = sampler._offline_estimator
    f_k = est.f_k
    d_f_k = est.d_f_k
    d_boot = est.bootstrap_d_f_k(n_bootstrap=20, seed=0)
    print("lambda ladder:        ", lambdas)
    print("f_k (kT):             ", np.round(f_k, 3))
    print("d f_k (asymptotic):   ", np.round(d_f_k, 3))
    print("d f_k (bootstrap):    ", np.round(d_boot, 3))
    print(
        f"Delta f(switch on) = {f_k[-1]:.3f} +- {d_f_k[-1]:.3f} kT"
    )

    # internal oracle 1: u_kn rows are exact lambda multiples of row 0
    u_kn = est.u_kn
    for k, lam in enumerate(lambdas):
        np.testing.assert_allclose(
            u_kn[k], (lam / lambdas[0]) * u_kn[0], rtol=1e-5
        )
    print("u_kn proportionality (exact epsilon scaling): OK")

    # internal oracle 2: perturbed-state machinery reproduces a SAMPLED
    # state's solved f_k from the same samples
    f_same, d_same = est.compute_perturbed_free_energies(u_kn[2])
    assert abs(f_same[0] - f_k[2]) < 1e-6, (f_same[0], f_k[2])
    print(f"perturbed(lambda={lambdas[2]}) == solved f_k[2]: OK")

    # reweight to an UNSAMPLED lambda between the ladder rungs
    lam_new = 0.5 * (lambdas[4] + lambdas[5])
    u_new = (lam_new / lambdas[0]) * u_kn[0]
    f_l, d_f_l = est.compute_perturbed_free_energies(u_new)
    print(
        f"unsampled lambda={lam_new}: f = {f_l[0]:.3f} +- {d_f_l[0]:.3f} kT"
    )
    lo, hi = sorted((f_k[4], f_k[5]))
    assert lo - 4 * d_f_l[0] < f_l[0] < hi + 4 * d_f_l[0], (f_l, f_k)
    overlap = est.compute_overlap()["scalar"]
    print(f"overlap scalar = {overlap:.3f}  (near 1 = connected ladder)")
    assert overlap > 0.2, "ladder spacing should give healthy overlap"
    print("Hamiltonian-ladder free-energy workflow: PASS")


if __name__ == "__main__":
    main()
