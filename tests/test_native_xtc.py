"""Native XTC codec tests: roundtrip fidelity + reporter integration.

The reference writes XTC through mdtraj (reference chiron/reporters.py:
351-432); the native C codec (chiron_tpu/native/xtc.c) implements the
GROMACS xdrfile 3dfcoord format directly, so the guarantee no longer
depends on mdtraj being importable.
"""

import os

import numpy as np
import pytest

from chiron_tpu.native import has_native_xtc

pytestmark = pytest.mark.skipif(
    not has_native_xtc(), reason="no C compiler for the native codec"
)


def test_xtc_roundtrip_precision(tmp_path):
    from chiron_tpu.native.xtc_io import XTCWriter, read_xtc

    rng = np.random.default_rng(0)
    n = 1000
    frames = rng.uniform(0, 5.0, size=(5, n, 3)).astype(np.float32)
    box = np.eye(3, dtype=np.float32) * 5.0
    path = str(tmp_path / "t.xtc")
    w = XTCWriter(path, precision=1000.0)
    for i, f in enumerate(frames):
        w.write(f, box, step=i * 10, time_ps=i * 0.02)
    w.close()

    pos, boxes, times, steps = read_xtc(path)
    assert pos.shape == (5, n, 3)
    # quantized at 1/precision: roundtrip within half a grid cell (+eps)
    assert np.abs(pos - frames).max() < 0.5 / 1000.0 * 1.05
    assert steps.tolist() == [0, 10, 20, 30, 40]
    np.testing.assert_allclose(times, np.arange(5) * 0.02, atol=1e-6)
    np.testing.assert_allclose(boxes[0], box)


def test_xtc_correlated_frames_compress(tmp_path):
    """MD-like (spatially sorted) coordinates compress well below raw f32,
    and tiny (<=9 atom) frames take the uncompressed branch."""
    from chiron_tpu.native.xtc_io import XTCWriter, read_xtc

    rng = np.random.default_rng(1)
    n = 4000
    base = np.sort(rng.uniform(0, 5.0, size=(n, 3)).astype(np.float32), axis=0)
    path = str(tmp_path / "c.xtc")
    w = XTCWriter(path)
    w.write(base, np.eye(3, dtype=np.float32) * 5.0)
    w.close()
    assert os.path.getsize(path) < 0.45 * n * 12

    small = rng.uniform(0, 2.0, size=(4, 3)).astype(np.float32)
    path2 = str(tmp_path / "s.xtc")
    w2 = XTCWriter(path2)
    w2.write(small, None)
    w2.close()
    pos, _, _, _ = read_xtc(path2)
    np.testing.assert_allclose(pos[0], small, atol=1e-6)  # exact floats


def test_reporter_writes_native_xtc(tmp_path):
    """LangevinDynamicsReporter produces a decodable .xtc alongside the DCD."""
    from chiron_tpu.native.xtc_io import read_xtc
    from chiron_tpu.reporters import BaseReporter, LangevinDynamicsReporter

    BaseReporter.set_directory(str(tmp_path))
    rep = LangevinDynamicsReporter("xtc_smoke", buffer_size=1)
    rep.reset_reporter_file()
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 3.0, size=(3, 50, 3))
    box = np.eye(3) * 3.0
    for f in frames:
        rep.report({"positions": f, "box_vectors": box, "step": 0})
    rep.flush_buffer()

    pos, boxes, _, _ = read_xtc(rep.xtc_file_path)
    assert pos.shape == (3, 50, 3)
    assert np.abs(pos - frames).max() < 1e-3
    np.testing.assert_allclose(boxes[-1], box, atol=1e-6)
    # DCD still written in parallel
    assert os.path.exists(rep.dcd_file_path)
