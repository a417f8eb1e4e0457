"""Physical observables over sampled configurations.

The first things a user asks of a sampler once it runs: structure (RDF),
mechanical state (virial pressure), and response functions (heat capacity).
The reference computes none of these (SURVEY.md section 5 lists no analysis
beyond MBAR free energies); this module adds them TPU-first -- each
estimator is one jitted pass over a trajectory stacked on a frame axis, and
ensemble reweighting hooks into
:meth:`chiron_tpu.analysis.MBAREstimator.compute_expectation`.

All inputs are unitless MD-system numerics (nm, kJ/mol, K) per the
construction-boundary convention (CLAUDE.md design invariants).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import units


@functools.partial(jax.jit, static_argnames=("n_bins",))
def _rdf_histogram(positions, box_diag, r_max, n_bins: int):
    """Pair-distance histogram of ONE frame: (n_bins,) counts (i<j pairs)."""
    n = positions.shape[0]
    d = positions[:, None, :] - positions[None, :, :]
    d = d - box_diag * jnp.round(d / box_diag)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    iu = jnp.triu_indices(n, k=1)
    r = r[iu]
    bins = jnp.clip(
        jnp.floor(r / r_max * n_bins).astype(jnp.int32), 0, n_bins
    )
    # one-hot reduction: TPU-friendly histogram (no scatters); pairs beyond
    # r_max land in the clip sentinel bin n_bins and are excluded
    in_range = (r < r_max)[:, None]
    counts = jnp.sum(
        (bins[:, None] == jnp.arange(n_bins)[None, :]) & in_range,
        axis=0, dtype=jnp.float32,
    )
    return counts


def radial_distribution_function(
    positions,
    box_vectors,
    r_max: Optional[float] = None,
    n_bins: int = 100,
):
    """g(r) averaged over a trajectory.

    Parameters
    ----------
    positions : (n_frames, N, 3) or (N, 3) array (nm, or Quantity)
    box_vectors : (3, 3) box (orthorhombic; nm, or Quantity)
    r_max : maximum distance (defaults to L/2)
    n_bins : histogram resolution

    Returns
    -------
    (r_centers, g) as numpy arrays.
    """
    pos = np.asarray(units.strip_md(positions, units.nanometer))
    box = np.asarray(units.strip_md(box_vectors, units.nanometer))
    box_diag = jnp.asarray(np.diagonal(box), dtype=jnp.float32)
    if pos.ndim == 2:
        pos = pos[None]
    n_frames, n, _ = pos.shape
    L_min = float(box_diag.min())
    if r_max is None:
        r_max = 0.5 * L_min
    if r_max > 0.5 * L_min + 1e-9:
        raise ValueError(
            f"r_max ({r_max}) exceeds half the box ({0.5 * L_min}): the "
            "minimum-image histogram would alias"
        )
    counts = np.zeros(n_bins, dtype=np.float64)
    for f in range(n_frames):
        counts += np.asarray(
            _rdf_histogram(
                jnp.asarray(pos[f], jnp.float32), box_diag,
                jnp.float32(r_max), n_bins,
            )
        )
    counts /= n_frames
    edges = np.linspace(0.0, r_max, n_bins + 1)
    r_centers = 0.5 * (edges[1:] + edges[:-1])
    shell_vol = 4.0 / 3.0 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    volume = float(np.prod(np.diagonal(box)))
    rho = n / volume
    # counts are i<j pairs: the ideal-gas expectation per shell is
    # N(N-1)/2 * V_shell/V = shell_vol * rho * (n-1)/2.  (Using n instead
    # of n-1 depresses the whole g(r) by (n-1)/n -- 3% at N=32, and an
    # ideal gas would not recover the g = 1 plateau.)
    ideal = shell_vol * rho * (n - 1) / 2.0
    g = counts / ideal
    return r_centers, g


@functools.partial(
    jax.jit, static_argnames=("sigma", "epsilon", "cutoff"),
)
def lj_virial(positions, box_diag, sigma: float, epsilon: float,
              cutoff: float):
    """Pair virial W = sum_{i<j} f_ij . r_ij for the cutoff LJ potential.

    Equals -3V dU/dV under uniform scaling of a configuration, so
    P_inst = (N kT + W/3) / V is the instantaneous virial pressure.
    """
    n = positions.shape[0]
    d = positions[:, None, :] - positions[None, :, :]
    d = d - box_diag * jnp.round(d / box_diag)
    r2 = jnp.sum(d * d, axis=-1)
    ids = jnp.arange(n)
    m = (r2 < cutoff * cutoff) & (ids[:, None] < ids[None, :])
    r2s = jnp.where(m, r2, 1.0)
    i2 = (sigma * sigma) / r2s
    i6 = i2 * i2 * i2
    # f.r = 24 eps (2 (s/r)^12 - (s/r)^6)
    w = jnp.where(m, 24.0 * epsilon * (2.0 * i6 * i6 - i6), 0.0)
    return jnp.sum(w)


def lj_virial_pressure(
    positions,
    box_vectors,
    temperature,
    sigma: float,
    epsilon: float,
    cutoff: float,
):
    """Virial pressure of LJ configurations: P = (N kT + W/3)/V (kJ/mol/nm^3).

    ``positions`` may be one frame (N, 3) or a trajectory (F, N, 3); the
    trajectory average is returned for the latter.  Multiply by
    :data:`PRESSURE_MD_TO_BAR` for bar.
    """
    pos = np.asarray(units.strip_md(positions, units.nanometer))
    box = np.asarray(units.strip_md(box_vectors, units.nanometer))
    T = units.strip_md(temperature, units.kelvin)
    kT = units.kB_MD * T
    box_diag = jnp.asarray(np.diagonal(box), dtype=jnp.float32)
    volume = float(np.prod(np.diagonal(box)))
    if pos.ndim == 2:
        pos = pos[None]
    n = pos.shape[1]
    ws = [
        float(lj_virial(jnp.asarray(p, jnp.float32), box_diag,
                        float(sigma), float(epsilon), float(cutoff)))
        for p in pos
    ]
    w = float(np.mean(ws))
    return (n * kT + w / 3.0) / volume


def heat_capacity_nvt(energies, temperature):
    """C_V from NVT energy fluctuations: (<E^2>-<E>^2) / (kB T^2).

    ``energies``: potential+kinetic samples in kJ/mol (add (3N/2) kB to the
    result when only potential energies are supplied and the kinetic part
    is the classical ideal contribution).  Returns kJ/mol/K.
    """
    E = np.asarray(units.strip_md(energies, units.kilojoule_per_mole),
                   dtype=np.float64)
    T = units.strip_md(temperature, units.kelvin)
    return float(np.var(E) / (units.kB_MD * T * T))


def unwrap_trajectory(frames, box_diag):
    """Undo periodic wrapping across a trajectory of (T, N, 3) frames.

    Frame-to-frame displacements are minimum-imaged and accumulated, so
    the result is continuous in space -- valid whenever no particle moves
    more than L/2 between consecutive frames (any sane report cadence).
    Transport observables (MSD, diffusion) need this: the runners wrap
    positions into the box every step.
    """
    frames = jnp.asarray(frames)
    L = jnp.asarray(box_diag)
    if L.ndim == 2:  # accept full (3, 3) box_vectors like the RDF does
        L = jnp.diagonal(L)
    L = L.reshape(1, 1, 3)
    d = jnp.diff(frames, axis=0)
    d = d - L * jnp.round(d / L)
    return jnp.concatenate(
        [frames[:1], frames[:1] + jnp.cumsum(d, axis=0)], axis=0
    )


def _autocorr_fft(a):
    """S2(m) = sum_t a[t] a[t+m] for each lag m, along axis 0 (FFT)."""
    T = a.shape[0]
    fa = jnp.fft.rfft(a, n=2 * T, axis=0)
    return jnp.fft.irfft(fa * jnp.conj(fa), n=2 * T, axis=0)[:T]


@jax.jit
def _msd_all_lags(x):
    """MSD over all lags via the FFT autocorrelation identity
    (O(T log T N) instead of the direct O(T^2 N) origin average)."""
    T, N = x.shape[0], x.shape[1]
    # MSD is translation-invariant; center each particle on its initial
    # position BEFORE the f32 pass.  The S1 - 2*S2 form cancels
    # catastrophically for coordinates far from the origin -- exactly
    # what an unwrapped diffusive trajectory produces (measured: 3.6%
    # relative error at +50 nm offset, 1.6e-6 centered).
    x = x - x[0:1]
    D = jnp.sum(x * x, axis=-1)                      # (T, N)
    S2 = jnp.sum(_autocorr_fft(x), axis=-1)          # (T, N)
    sumD = jnp.sum(D, axis=0)

    def body(S1_prev, m):
        S1 = S1_prev - D[m - 1] - D[T - m]
        return S1, S1

    _, S1_tail = jax.lax.scan(body, 2.0 * sumD, jnp.arange(1, T))
    S1 = jnp.concatenate([2.0 * sumD[None], S1_tail], axis=0)  # (T, N)
    counts = (T - jnp.arange(T)).astype(jnp.float32)[:, None]
    return jnp.mean((S1 - 2.0 * S2) / counts, axis=1)


def mean_squared_displacement(frames, box_diag=None):
    """MSD(t) averaged over particles and ALL time origins: (T,) array
    (nm^2).

    ``frames`` is (T, N, 3); pass ``box_diag`` to unwrap first (required
    for wrapped trajectories).  One jitted FFT pass (O(T log T))."""
    x = jnp.asarray(frames, jnp.float32)
    if box_diag is not None:
        x = unwrap_trajectory(x, box_diag)
    return _msd_all_lags(x)


def diffusion_coefficient(frames, times, box_diag=None,
                          fit_fraction=(0.2, 0.8)):
    """Self-diffusion D from the Einstein relation MSD = 6 D t.

    Least-squares slope over the middle ``fit_fraction`` window of lag
    times (skipping the ballistic onset and the noisy tail).  Returns D
    in nm^2/ps for ``times`` in ps.
    """
    msd = np.asarray(mean_squared_displacement(frames, box_diag),
                     dtype=np.float64)
    t = np.asarray(times, dtype=np.float64)
    lo = int(len(t) * fit_fraction[0])
    hi = max(lo + 2, int(len(t) * fit_fraction[1]))
    slope = np.polyfit(t[lo:hi], msd[lo:hi], 1)[0]
    return float(slope / 6.0)


def velocity_autocorrelation(velocities):
    """Normalized VACF(t) over (T, N, 3) velocity frames: (T,) array.

    C(t) = <v(0).v(t)> / <v(0).v(0)>, averaged over particles and ALL
    time origins (one jitted FFT pass); the Green-Kubo integral of the
    unnormalized VACF is an independent route to D.
    """
    v = jnp.asarray(velocities, jnp.float32)
    T = v.shape[0]
    S2 = jnp.mean(jnp.sum(_autocorr_fft(v), axis=-1), axis=1)  # (T,)
    counts = (T - jnp.arange(T)).astype(jnp.float32)
    c = S2 / counts
    return c / c[0]


def mbar_expectation(estimator, samples, state_index: int = 0):
    """<A> at a thermodynamic state via MBAR reweighting.

    Thin convenience over
    :meth:`chiron_tpu.analysis.MBAREstimator.compute_expectation`.
    1D ``samples`` must already be in the estimator's column order; a 2D
    ``(iterations, replicas)`` array is flattened to match the layout the
    estimator was initialized with (a blind C-order ``reshape(-1)`` of
    the natural (T, R) observable array would pair every MBAR weight
    with the wrong sample under the replica-major column order the 3D
    reporter path produces).
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        flat = a
    elif a.ndim == 2 and estimator._iteration_layout is not None:
        T, R = estimator._iteration_layout
        if a.shape != (T, R):
            raise ValueError(
                f"expected an (iterations, replicas) = ({T}, {R}) "
                f"observable array matching the estimator's layout, got "
                f"{a.shape}"
            )
        flat = a.reshape(-1) if estimator._iteration_major else a.T.reshape(-1)
    else:
        raise ValueError(
            "multi-dimensional observable arrays need the estimator's "
            "iteration layout to order samples (initialize with "
            "iteration_layout=...), or pass a 1D array already in the "
            "estimator's column order"
        )
    return estimator.compute_expectation(flat, state_index=state_index)


# bar per (kJ/mol/nm^3): 1 kJ/mol/nm^3 = 16.6054 bar
PRESSURE_MD_TO_BAR = 16.605390671738466
