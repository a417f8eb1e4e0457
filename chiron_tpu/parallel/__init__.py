"""Multi-device (TPU mesh) execution for chiron-tpu.

The reference has no distribution machinery at all (SURVEY.md section 2
checklist: replicas are propagated in a serial Python loop, reference
chiron/multistate.py:497-510).  This package adds the genuinely new
capability the north star mandates: replica-parallel sampling over a
``jax.sharding.Mesh``, with XLA collectives over ICI.

* :mod:`chiron_tpu.parallel.mesh` -- mesh construction helpers.
* :mod:`chiron_tpu.parallel.tempering` -- ``ParallelTemperingSampler``:
  replicas stacked on a leading axis, propagated by ONE compiled program
  (temperature as data, not as per-state closures) and sharded across
  devices with ``shard_map``.
* :mod:`chiron_tpu.parallel.multistate` -- ``MeshMultiStateSampler``:
  the general replica-exchange sampler with homogeneous potential
  families stacked as data and replicas sharded over the mesh.
* :mod:`chiron_tpu.parallel.spatial` -- particle-axis sharding: the
  row-sharded pair kernel (``make_sharded_lj_force``) and the
  single-replica large-N Langevin engine (``make_spatial_lj_runner``,
  one positions all_gather per step).
"""

from .mesh import make_replica_mesh, replica_sharding
from .multistate import MeshMultiStateSampler
from .spatial import (make_sharded_lj_force, make_spatial_band_lj_runner,
                      make_spatial_lj_runner)
from .tempering import ParallelTemperingSampler

__all__ = [
    "make_replica_mesh",
    "replica_sharding",
    "MeshMultiStateSampler",
    "ParallelTemperingSampler",
    "make_sharded_lj_force",
    "make_spatial_lj_runner",
    "make_spatial_band_lj_runner",
]
