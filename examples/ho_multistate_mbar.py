"""Harmonic-oscillator multistate sampling + MBAR free-energy check.

Recreates the reference's multistate workload (chiron/tests/
test_multistate.py:91-151): a ladder of 4 harmonic oscillators with
K_i = kT / sigma_i^2, sampled by per-state Langevin dynamics; MBAR must
recover the analytic free-energy differences within 0.1 kT.
"""

import math

import numpy as np

from chiron_tpu import units
from chiron_tpu.mcmc import LangevinDynamicsMove, MCMCSampler, MoveSchedule
from chiron_tpu.multistate import ReplicaExchangeSampler
from chiron_tpu.neighbors import OrthogonalNonPeriodicSpace, PairListNsqrd
from chiron_tpu.potential import HarmonicOscillatorPotential
from chiron_tpu.reporters import BaseReporter, MultistateReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import HarmonicOscillator
from chiron_tpu.utils import PRNG


def main():
    from chiron_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiled programs across runs
    ho = HarmonicOscillator()
    n_states = 4
    T = 300.0 * units.kelvin
    kT = units.BOLTZMANN_CONSTANT_kB * T * units.AVOGADRO_CONSTANT_NA
    sigmas = [units.Quantity(2.0 + 0.2 * i, units.angstrom) for i in range(n_states)]
    Ks = [kT / s ** 2 for s in sigmas]

    thermodynamic_states = [
        ThermodynamicState(
            HarmonicOscillatorPotential(ho.topology, k=K), temperature=T
        )
        for K in Ks
    ]
    PRNG.set_seed(1234)
    sampler_states = [
        SamplerState(ho.positions, current_PRNG_key=PRNG.get_random_key())
        for _ in sigmas
    ]
    nbr_lists = [
        PairListNsqrd(OrthogonalNonPeriodicSpace(), cutoff=None) for _ in sigmas
    ]

    BaseReporter.set_directory("output/ho_multistate")
    reporter = MultistateReporter()
    reporter.reset_reporter_file()

    lang_move = LangevinDynamicsMove(
        timestep=1.0 * units.femtoseconds, number_of_steps=500
    )
    mcmc_sampler = MCMCSampler(MoveSchedule([("LangevinDynamicsMove", lang_move)]))
    sampler = ReplicaExchangeSampler(mcmc_sampler=mcmc_sampler, reporter=reporter)
    sampler.create(thermodynamic_states, sampler_states, nbr_lists)
    sampler.minimize(max_iterations=200)
    sampler.run(25)

    f_analytic = np.array(
        [
            -1.5 * math.log(2 * math.pi * (2.0 + 0.2 * i) ** 2)
            for i in range(n_states)
        ]
    )
    f_analytic -= f_analytic[0]
    print("analytic  f_k:", np.round(f_analytic, 4))
    print("estimated f_k:", np.round(sampler.f_k, 4))
    err = np.max(np.abs(sampler.f_k - f_analytic))
    print(f"max |error| = {err:.4f} kT")
    assert err < 0.1, "free energies did not converge to 0.1 kT"

    # uncertainty + diagnostics surface (no pymbar needed): asymptotic
    # Eq. D6 error bars, bootstrap cross-check, state-overlap scalar
    est = sampler._offline_estimator
    d_asym = est.d_f_k
    d_boot = est.bootstrap_d_f_k(n_bootstrap=30, seed=0)
    overlap = est.compute_overlap()["scalar"]
    print("d f_k (asymptotic):", np.round(d_asym, 4))
    print("d f_k (bootstrap): ", np.round(d_boot, 4))
    print(f"overlap scalar = {overlap:.3f}  (near 1 = connected ladder)")

    # reweight to a state we never sampled: sigma = 2.3 A sits between
    # ladder rungs; u scales as 1/sigma^2 so its reduced potentials are
    # a rescale of state 0's row on the pooled samples
    s_new = 2.3
    u_new = est.u_kn[0] * (2.0 / s_new) ** 2
    f_l, d_f_l = est.compute_perturbed_free_energies(u_new)
    f_new_true = -1.5 * math.log(2 * math.pi * s_new ** 2) - (
        -1.5 * math.log(2 * math.pi * 2.0 ** 2)
    )
    print(
        f"unsampled sigma={s_new} A: f = {f_l[0]:.4f} +- {d_f_l[0]:.4f} kT"
        f"  (analytic {f_new_true:.4f})"
    )
    assert abs(f_l[0] - f_new_true) < max(4.0 * d_f_l[0], 0.1)
    print("MBAR free-energy check: PASS")


if __name__ == "__main__":
    main()
