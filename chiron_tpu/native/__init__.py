"""Native (C) runtime components, loaded through ctypes.

The compute path is jax/XLA/Pallas; the IO-side hot utilities that the
reference delegated to native third-party libraries live here as small C
sources compiled on demand (``cc -O2 -shared``) into a per-version cache.
No pybind11/setuptools machinery: ctypes keeps the build one compiler
invocation and the load path dependency-free.

Currently: the XTC trajectory codec (``xtc.c``) -- the GROMACS compressed
format the reference writes via mdtraj (reference
chiron/reporters.py:351-432).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

log = logging.getLogger("chiron_tpu")

_SRC_DIR = Path(__file__).parent
_lib_cache: dict = {}


def _build_and_load(name: str) -> Optional[ctypes.CDLL]:
    """Compile ``<name>.c`` into a cached shared object and dlopen it."""
    if name in _lib_cache:
        return _lib_cache[name]
    src = _SRC_DIR / f"{name}.c"
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get(
            "CHIRON_TPU_NATIVE_CACHE",
            Path(tempfile.gettempdir()) / "chiron_tpu_native",
        )
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"{name}-{tag}.so"
    if not so_path.exists():
        cc = os.environ.get("CC", "cc")
        tmp = so_path.with_suffix(".so.tmp")
        cmd = [cc, "-O2", "-shared", "-fPIC", "-o", str(tmp), str(src), "-lm"]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, text=True, timeout=120
            )
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired) as e:
            log.warning("native %s build failed (%s); native path disabled",
                        name, e)
            _lib_cache[name] = None
            return None
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError as e:
        log.warning("native %s load failed (%s)", name, e)
        lib = None
    _lib_cache[name] = lib
    return lib


def xtc_library() -> Optional[ctypes.CDLL]:
    lib = _build_and_load("xtc")
    if lib is not None and not getattr(lib, "_xtc_configured", False):
        import ctypes as ct

        lib.xtc_encode_frame.restype = ct.c_long
        lib.xtc_encode_frame.argtypes = [
            ct.c_int, ct.c_int, ct.c_float, ct.POINTER(ct.c_float),
            ct.POINTER(ct.c_float), ct.c_float, ct.POINTER(ct.c_ubyte),
            ct.c_long,
        ]
        lib.xtc_decode_frame.restype = ct.c_long
        lib.xtc_decode_frame.argtypes = [
            ct.POINTER(ct.c_ubyte), ct.c_long, ct.POINTER(ct.c_int),
            ct.POINTER(ct.c_int), ct.POINTER(ct.c_float),
            ct.POINTER(ct.c_float), ct.POINTER(ct.c_float), ct.c_int,
            ct.POINTER(ct.c_float),
        ]
        lib._xtc_configured = True
    return lib


def has_native_xtc() -> bool:
    return xtc_library() is not None
