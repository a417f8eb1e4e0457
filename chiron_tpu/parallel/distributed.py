"""Multi-host cluster initialization.

The reference has no distributed backend (SURVEY.md section 2 checklist);
the TPU-native equivalent of NCCL/MPI setup is ``jax.distributed`` --
collectives then compile to XLA ops over ICI within a slice and DCN across
slices, with no hand-rolled communication layer.

Usage on each host of a multi-host TPU pod/slice::

    from chiron_tpu.parallel import distributed
    distributed.initialize_cluster()          # env-driven (TPU pods: no args)
    mesh = make_replica_mesh()                # now spans all hosts' devices

Single-host (or CPU-test) processes may call this as a no-op.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

log = logging.getLogger("chiron_tpu")


def initialize_cluster(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    On TPU pods all arguments are discovered from the environment; on other
    platforms pass them explicitly.  Returns True when distributed mode was
    initialized, False when running single-process (no-op).
    """
    if num_processes is None and coordinator_address is None:
        import os

        # TPU pod runtimes export these; absent => single process.
        if not any(
            v in os.environ
            for v in ("TPU_WORKER_HOSTNAMES", "JAX_COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS")
        ):
            log.info("single-process run; jax.distributed not initialized")
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        log.debug("jax.distributed.initialize: %s", e)
        return True
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
