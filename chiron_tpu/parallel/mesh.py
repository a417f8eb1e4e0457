"""Device-mesh helpers for replica-parallel sampling."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_replica_mesh(
    n_devices: Optional[int] = None, axis_name: str = "replica"
) -> Mesh:
    """A 1D mesh over (up to) ``n_devices`` devices for the replica axis.

    Replica-parallel sampling is data parallelism over the mesh: one replica
    block per chip, collectives (tiny R x S energy matrices) over ICI
    (SURVEY.md section 2 parallelism checklist).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replica_sharding(mesh: Mesh, axis_name: str = "replica") -> NamedSharding:
    """Sharding that splits the leading (replica) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that replicates an array on every device of the mesh."""
    return NamedSharding(mesh, PartitionSpec())
