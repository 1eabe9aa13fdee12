"""Device-mesh construction + multi-host initialization.

The reference is strictly single-process with no parallelism
(SURVEY.md section 2, parallelism inventory); this module is where the TPU
framework goes beyond it: a 1-D data mesh shards observations/batches across
chips (collectives ride ICI within a slice), and `initialize_distributed`
brings up multi-host execution over DCN via jax.distributed.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data"):
    """1-D mesh over the first n (default all) local devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX (DCN) when a cluster is configured.

    Reads standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) when args are omitted. Returns True iff distributed mode
    was initialized; single-host runs return False and proceed locally.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
