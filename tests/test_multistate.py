"""Multistate / replica-exchange tests (reference chiron/tests/test_multistate.py).

The headline check: MBAR free energies of a 4-state harmonic-oscillator
ladder converge to the analytic values within 0.1 kT after 20 iterations
(reference test_multistate.py:211-251).
"""

import math

import numpy as np
import pytest

from chiron_tpu import units as u
from chiron_tpu.mcmc import LangevinDynamicsMove, MCMCSampler, MoveSchedule
from chiron_tpu.multistate import MultiStateSampler, ReplicaExchangeSampler
from chiron_tpu.neighbors import OrthogonalNonPeriodicSpace, PairListNsqrd
from chiron_tpu.potential import HarmonicOscillatorPotential
from chiron_tpu.reporters import BaseReporter, MultistateReporter
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import HarmonicOscillator
from chiron_tpu.utils import PRNG


def _make_sampler(tmp_path, n_states=4, sampler_cls=MultiStateSampler):
    """HO ladder with k_i = kT / sigma_i^2, sigma_i = (2.0 + 0.2 i) A
    (reference test_multistate.py:91-151)."""
    ho = HarmonicOscillator()
    T = 300.0 * u.kelvin
    kT = u.BOLTZMANN_CONSTANT_kB * T * u.AVOGADRO_CONSTANT_NA
    sigmas = [
        u.Quantity(2.0 + 0.2 * i, u.angstrom) for i in range(n_states)
    ]
    Ks = [kT / sigma ** 2 for sigma in sigmas]

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
        PairListNsqrd(OrthogonalNonPeriodicSpace(), cutoff=None)
        for _ in sigmas
    ]

    f_i = np.array(
        [
            -math.log(2 * math.pi * (2.0 + 0.2 * i) ** 2) * (3.0 / 2.0)
            for i in range(n_states)
        ]
    )

    BaseReporter.set_directory(str(tmp_path))
    reporter = MultistateReporter()
    reporter.reset_reporter_file()

    # 500-step segments decorrelate consecutive samples (~2 ps correlation
    # time at gamma = 1/ps); the reference's 100-step segments leave
    # consecutive u_kn rows correlated and its 0.1 kT tolerance seed-lucky.
    lang_move = LangevinDynamicsMove(
        timestep=1.0 * u.femtoseconds, number_of_steps=500
    )
    mcmc_sampler = MCMCSampler(MoveSchedule([("LangevinDynamicsMove", lang_move)]))
    sampler = sampler_cls(mcmc_sampler=mcmc_sampler, reporter=reporter)
    sampler.create(
        thermodynamic_states=thermodynamic_states,
        sampler_states=sampler_states,
        nbr_lists=nbr_lists,
    )
    sampler.analytical_f_i = f_i
    sampler.delta_f_ij_analytical = f_i - f_i[:, np.newaxis]
    return sampler


def test_multistate_create(tmp_path):
    sampler = _make_sampler(tmp_path)
    assert sampler.number_of_replicas == 4
    assert sampler.number_of_thermodynamic_states == 4
    assert sampler.iteration == 0
    assert not sampler.is_periodic
    # sampler_states returns copies
    states = sampler.sampler_states
    assert len(states) == 4


def test_multistate_minimize(tmp_path):
    sampler = _make_sampler(tmp_path)
    sampler.minimize(max_iterations=200)
    for ss in sampler._sampler_states:
        assert np.allclose(np.asarray(ss.positions), 0.0, atol=1e-2)


@pytest.mark.slow
def test_multistate_run_mbar_convergence(tmp_path):
    """f_k converges to the analytic ladder within 0.1 kT
    (reference test_multistate.py:211-251)."""
    sampler = _make_sampler(tmp_path)
    n_iterations = 25
    sampler.run(n_iterations)

    assert sampler.iteration == n_iterations
    u_kn = sampler._reporter.get_property("u_kn")
    assert u_kn.shape == (n_iterations + 1, 4, 4)

    assert np.allclose(
        sampler.delta_f_ij_analytical[0], sampler.f_k, atol=0.1
    )


@pytest.mark.slow
def test_replica_exchange_swaps_and_converges(tmp_path):
    """ReplicaExchangeSampler performs real swaps and still converges."""
    sampler = _make_sampler(tmp_path, sampler_cls=ReplicaExchangeSampler)
    sampler.run(15)
    # some swaps should have been proposed
    # (matrices reset per iteration; check the last iteration proposed pairs)
    assert sampler._n_proposed_matrix.sum() > 0
    # the state assignment is a valid permutation
    perm = np.sort(sampler._replica_thermodynamic_states)
    assert np.all(perm == np.arange(4))
    assert np.allclose(
        sampler.delta_f_ij_analytical[0], sampler.f_k, atol=0.15
    )
