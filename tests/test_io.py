"""PDB I/O tests (counterpart of the reference's data-file based tests)."""

import numpy as np
import pytest

from chiron_tpu import units
from chiron_tpu.io import read_pdb, write_pdb
from chiron_tpu.topology import Topology
from chiron_tpu.utils import get_data_file_path


def test_read_packaged_two_particles():
    path = get_data_file_path("two_particles.pdb")
    positions, topology, box = read_pdb(path)
    assert positions.shape == (2, 3)
    # 5 A separation -> 0.5 nm
    pos = positions.value_in_unit_system(units.md_unit_system)
    assert np.allclose(pos[1] - pos[0], [0.5, 0.0, 0.0])
    assert topology.getNumAtoms() == 2
    assert np.allclose(topology.masses(), 39.948)
    assert box is not None
    box_nm = box.value_in_unit_system(units.md_unit_system)
    assert np.allclose(np.diagonal(box_nm), 10.0)


def test_pdb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 3.0, (17, 3))
    top = Topology.uniform(17, 39.948, element="Ar")
    path = str(tmp_path / "out.pdb")
    write_pdb(path, pos, top, box_vectors=np.eye(3) * 3.0)
    pos2, top2, box2 = read_pdb(path)
    pos2 = pos2.value_in_unit_system(units.md_unit_system)
    assert np.allclose(pos2, pos, atol=1e-3)  # PDB has 3 decimals in A
    assert top2.getNumAtoms() == 17
    assert np.allclose(
        np.diagonal(box2.value_in_unit_system(units.md_unit_system)), 3.0
    )


def test_data_file_missing():
    with pytest.raises(ValueError):
        get_data_file_path("nope.pdb")


def test_pdb_multimodel_reads_first_model_only(tmp_path):
    """ENDMDL stops the reader: multi-model NMR-style files yield the first
    model's atoms (openmm/mdtraj default-frame semantics), not a silent
    concatenation of every model."""
    path = str(tmp_path / "multi.pdb")
    with open(path, "w") as fh:
        fh.write(
            "MODEL     1\n"
            "ATOM      1  Ar  UNK A   1       1.000   2.000   3.000"
            "  1.00  0.00          Ar\n"
            "ENDMDL\n"
            "MODEL     2\n"
            "ATOM      1  Ar  UNK A   1       9.000   9.000   9.000"
            "  1.00  0.00          Ar\n"
            "ENDMDL\n"
            "END\n"
        )
    pos, topo, _ = read_pdb(path)
    assert topo.n_atoms == 1
    pos_nm = pos.value_in_unit_system(units.md_unit_system)
    assert np.allclose(pos_nm, [[0.1, 0.2, 0.3]])


def test_pdb_no_atoms_raises(tmp_path):
    path = str(tmp_path / "empty.pdb")
    with open(path, "w") as fh:
        fh.write("REMARK nothing here\nEND\n")
    with pytest.raises(ValueError, match="no ATOM/HETATM"):
        read_pdb(path)


def test_sdf_truncated_raises(tmp_path):
    """A counts line claiming more atoms/bonds than the file holds is a
    clean ValueError, not an IndexError mid-parse."""
    from chiron_tpu.io import read_sdf

    path = str(tmp_path / "trunc.sdf")
    with open(path, "w") as fh:
        fh.write(
            "mol\n  gen\n\n"
            "  9  8  0  0  0  0  0  0  0  0999 V2000\n"
            "    0.0000    0.0000    0.0000 C   0  0\n"
        )
    with pytest.raises(ValueError, match="truncated SDF"):
        read_sdf(path)


def test_read_reference_fixtures():
    """Fixture parity: the reference's ethanol/single-particle structures
    load through the standalone readers (reference chiron/data/)."""
    import numpy as np

    from chiron_tpu.io import read_pdb, read_sdf
    from chiron_tpu.utils import get_data_file_path

    pos, topo, box = read_pdb(get_data_file_path("ethanol.pdb"))
    assert topo.n_atoms == 9
    masses = np.asarray(topo.masses())
    assert np.isclose(masses.sum(), 46.07, atol=0.1)  # C2H6O

    pos_s, topo_s, bonds = read_sdf(get_data_file_path("ethanol.sdf"))
    assert topo_s.n_atoms == 9
    assert len(bonds) == 8
    # identical coordinates in both formats (to PDB's 1e-3 A rounding)
    import numpy as np
    d = np.abs(np.asarray(pos._value) - np.asarray(pos_s._value))
    assert d.max() < 1e-4  # nm

    pos1, topo1, _ = read_pdb(get_data_file_path("single_particle.pdb"))
    assert topo1.n_atoms == 1
    assert np.allclose(np.asarray(pos1._value), 0.0)
