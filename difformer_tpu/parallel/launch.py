"""Multi-host launch helpers.

The reference is strictly single-process (SURVEY.md §2.6). Here multi-host
is the standard JAX recipe: one process per host, ``jax.distributed
.initialize`` to join the cluster, then every mesh in ``parallel.mesh``
spans all hosts automatically (collectives ride ICI within a slice, DCN
across slices). This module just wraps the boilerplate + env detection.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_cluster(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None):
    """Join (or no-op on single-process) the JAX cluster.

    With no arguments, relies on TPU environment auto-detection (GKE/GCE
    metadata); explicit args support manual launches:
      initialize_cluster("host0:1234", num_processes=4, process_id=rank)
    """
    import jax

    if num_processes is None and coordinator_address is None:
        env_procs = os.environ.get("DIFFORMER_NUM_PROCESSES")
        if env_procs is None:
            return False  # single-process
        num_processes = int(env_procs)
        coordinator_address = os.environ["DIFFORMER_COORDINATOR"]
        process_id = int(os.environ.get("DIFFORMER_PROCESS_ID", 0))
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    return False


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def global_device_count() -> int:
    import jax

    return jax.device_count()
