#!/usr/bin/env python
"""Regenerate tests/data/openmm_goldens.json against a LIVE OpenMM context.

The reference validates LJ/HO energies against an actual OpenMM context at
test time (reference chiron/tests/test_testsystems.py:11-24, 168-219).
OpenMM cannot be installed on the TPU hosts this framework targets, so the
committed goldens ship with analytic float64 provenance; THIS script closes
the residual trust gap: run it once on any CPU machine with ``openmm``
installed and commit the rewritten JSON, whose provenance block then cites
the OpenMM version and this script's hash.

    python scripts/regenerate_openmm_goldens.py [--out tests/data/openmm_goldens.json]

Requires: numpy, openmm.  Optional: openmmtools (adds the harmonic-
oscillator cross-check of reference test_testsystems.py:27-73).  It does
NOT require jax or chiron_tpu -- the fixture lattice is reproduced inline,
bit-identically (float32 rounding included) to
``chiron_tpu.testsystems.LennardJonesFluid``.
"""

import argparse
import datetime
import hashlib
import json
import math
import os
import sys

import numpy as np

# the exact fixture of tests/test_goldens.py::test_lj_fixture_energy... ,
# itself mirroring reference test_testsystems.py:179-194
N_PARTICLES = 1000
SIGMA_NM = 0.34               # argon
EPSILON_KCAL = 0.238
CUTOFF_NM = 3 * 0.34
DENSITIES = [0.5, 0.05, 0.005, 0.001]
KCAL_TO_KJ = 4.184


def fixture_lattice(nparticles: int, reduced_density: float):
    """Bit-identical copy of chiron_tpu.testsystems.LennardJonesFluid's
    lattice: cubic grid in a box of volume N sigma^3 / rho*, positions AND
    the box length rounded to float32 exactly as the committed fixture
    stores them (positions via jnp.asarray(..., float32), the box via
    jnp.eye(3, float32) * L)."""
    volume = nparticles * SIGMA_NM ** 3 / reduced_density
    L = volume ** (1.0 / 3.0)
    n_side = int(math.ceil(nparticles ** (1.0 / 3.0)))
    spacing = L / n_side
    grid = np.arange(n_side) * spacing
    xyz = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), axis=-1)
    xyz = xyz.reshape(-1, 3)[:nparticles]
    L32 = float(np.float32(1.0) * np.float32(L))
    return np.asarray(xyz, dtype=np.float32).astype(np.float64), L32


def openmm_lj_energy(positions_nm: np.ndarray, box_L_nm: float) -> float:
    """Potential energy (kJ/mol) of the truncated, unshifted LJ system in a
    double-precision OpenMM Reference context -- the same force settings as
    the reference fixture (switch_width=None, dispersion_correction=False,
    shift=False; reference test_testsystems.py:184-194)."""
    import openmm
    from openmm import unit

    system = openmm.System()
    nb = openmm.NonbondedForce()
    nb.setNonbondedMethod(openmm.NonbondedForce.CutoffPeriodic)
    nb.setCutoffDistance(CUTOFF_NM * unit.nanometer)
    nb.setUseSwitchingFunction(False)
    nb.setUseDispersionCorrection(False)
    for _ in range(len(positions_nm)):
        system.addParticle(39.948 * unit.amu)
        nb.addParticle(
            0.0,
            SIGMA_NM * unit.nanometer,
            EPSILON_KCAL * unit.kilocalories_per_mole,
        )
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors(
        openmm.Vec3(box_L_nm, 0, 0) * unit.nanometer,
        openmm.Vec3(0, box_L_nm, 0) * unit.nanometer,
        openmm.Vec3(0, 0, box_L_nm) * unit.nanometer,
    )
    integrator = openmm.VerletIntegrator(1.0 * unit.femtoseconds)
    platform = openmm.Platform.getPlatformByName("Reference")  # double prec.
    context = openmm.Context(system, integrator, platform)
    context.setPositions(positions_nm * unit.nanometer)
    e = context.getState(getEnergy=True).getPotentialEnergy()
    return float(e.value_in_unit(unit.kilojoule_per_mole))


def openmm_ho_energies():
    """Reference test_testsystems.py:27-73: openmmtools HarmonicOscillator
    energies at the two probe positions, in kJ/mol.  Returns None when
    openmmtools is unavailable."""
    try:
        import openmm
        from openmm import unit
        from openmmtools.testsystems import HarmonicOscillator
    except ImportError:
        return None
    ho = HarmonicOscillator()
    integrator = openmm.VerletIntegrator(1.0 * unit.femtoseconds)
    platform = openmm.Platform.getPlatformByName("Reference")
    context = openmm.Context(ho.system, integrator, platform)
    out = {}
    for name, pos in (
        ("x_0.1nm", [[0.1, 0.0, 0.0]]),
        ("y_0.1nm", [[0.0, 0.1, 0.0]]),
    ):
        context.setPositions(np.asarray(pos) * unit.nanometer)
        e = context.getState(getEnergy=True).getPotentialEnergy()
        out[name] = float(e.value_in_unit(unit.kilojoule_per_mole))
    out["K_kj_per_mol_nm2"] = float(
        ho.K.value_in_unit(unit.kilojoule_per_mole / unit.nanometer ** 2)
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "data", "openmm_goldens.json",
        ),
    )
    args = ap.parse_args()

    try:
        import openmm
    except ImportError:
        sys.exit(
            "openmm is required: run this script on a CPU machine with "
            "`pip install openmm` (and optionally openmmtools), then "
            "commit the rewritten JSON."
        )

    lj = {}
    for rho in DENSITIES:
        pos, L = fixture_lattice(N_PARTICLES, rho)
        lj[str(rho)] = openmm_lj_energy(pos, L)
        print(f"rho*={rho}: E = {lj[str(rho)]!r} kJ/mol")

    with open(os.path.abspath(__file__), "rb") as f:
        script_hash = hashlib.sha256(f.read()).hexdigest()

    doc = {
        "provenance": {
            "source": "openmm",
            "openmm_version": openmm.version.version,
            "platform": "Reference (double precision)",
            "script": "scripts/regenerate_openmm_goldens.py",
            "script_sha256": script_hash,
            "date": datetime.date.today().isoformat(),
        },
        "lj_fixture": {
            "nparticles": N_PARTICLES,
            "sigma_nm": SIGMA_NM,
            "epsilon_kcal_per_mole": EPSILON_KCAL,
            "cutoff_nm": CUTOFF_NM,
            "energies_kj_per_mole": lj,
        },
    }
    ho = openmm_ho_energies()
    if ho is not None:
        doc["harmonic_oscillator"] = ho
    else:
        print("openmmtools not installed -- harmonic-oscillator goldens "
              "skipped (LJ fixture regenerated)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
