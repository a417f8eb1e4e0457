"""Golden-seed regression tests.

The reference pins exact trajectory values at fixed seeds (reference
chiron/tests/test_mcmc.py:81-84).  Cross-RNG seed parity with the reference
is impossible (different RNG call sequences -- SURVEY.md section 6), so these
goldens are derived from THIS framework at seed 1234 on the CPU backend and
asserted with a tolerance that absorbs backend-dependent f32 rounding
(TPU/CPU accumulation orders differ).

Any change to the RNG threading, BAOAB coefficients, or step ordering will
break these values -- which is the point.
"""

import jax.numpy as jnp
import pytest

from chiron_tpu import units as u
from chiron_tpu.integrators import LangevinIntegrator
from chiron_tpu.states import SamplerState, ThermodynamicState
from chiron_tpu.testsystems import HarmonicOscillator
from chiron_tpu.utils import PRNG

# 5 x 100-step Langevin segments, HO (K=100 kJ/mol/nm^2), T=300 K, dt=2 fs,
# gamma=1/ps, seed 1234 (generated on the CPU backend).
GOLDEN_ENERGIES = [
    0.8124598264694214,
    2.813143014907837,
    4.289824962615967,
    4.299922466278076,
    4.225174427032471,
]
GOLDEN_FINAL_POSITION = [0.10679640620946884, -0.1638099104166031,
                         -0.21509145200252533]


def test_langevin_golden_trajectory():
    PRNG.set_seed(1234)
    ho = HarmonicOscillator()
    ss = SamplerState(
        positions=ho.positions, current_PRNG_key=PRNG.get_random_key()
    )
    ts = ThermodynamicState(potential=ho.potential, temperature=300.0 * u.kelvin)
    integ = LangevinIntegrator(timestep=2.0 * u.femtoseconds)
    energies = []
    for _ in range(5):
        ss, _ = integ.run(ss, ts, number_of_steps=100)
        energies.append(float(ho.potential.compute_energy(ss.positions)))
    assert energies == pytest.approx(GOLDEN_ENERGIES, rel=2e-3, abs=1e-4)
    assert [float(x) for x in ss.positions.flatten()] == pytest.approx(
        GOLDEN_FINAL_POSITION, rel=2e-3, abs=1e-4
    )


def test_prng_stream_golden():
    """The PRNG key-splitting stream itself is pinned."""
    PRNG.set_seed(1234)
    k1 = PRNG.get_random_key()
    k2 = PRNG.get_random_key()
    import jax

    v1 = float(jax.random.uniform(k1))
    v2 = float(jax.random.uniform(k2))
    assert v1 == pytest.approx(0.93298197, rel=1e-5)
    assert v2 == pytest.approx(0.40579808, rel=1e-5)
