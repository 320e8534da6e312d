"""Multi-host (pod / DCN) support.

The reference is strictly single-process (SURVEY.md §2.10). For pod slices,
JAX's runtime handles ICI collectives inside a host and DCN across hosts; the
framework-side obligations are (1) initializing the distributed runtime and
(2) sharding the *input pipeline* per host so each process feeds its local
chips — both provided here. Single-host callers can ignore this module
entirely (every helper degrades to a no-op).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host slice.

    No-op when neither arguments nor the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) are set —
    i.e. in the reference-parity single-host case.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:  # NOT `or`: 0 is the coordinator's valid id
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_for_host(
    items: Sequence,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    equalize: bool = False,
):
    """Deterministic per-host shard of a sequence (round-robin).

    Each host's input pipeline reads only its shard; per-host batches
    combine into the global batch via
    ``jax.make_array_from_process_local_data``
    (parallel.mesh.global_batch_from_local). With ``equalize=True`` every
    shard is truncated to the common minimum length so all hosts run the
    same number of steps (SPMD programs deadlock if one host runs an extra
    batch). Used by PointCloudDataDirectoryModule.setup() on the split
    indices.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    shard = [f for i, f in enumerate(items) if i % pc == pi]
    if equalize:
        shard = shard[: len(items) // pc]
    if isinstance(items, np.ndarray):
        return np.asarray(shard, dtype=items.dtype)
    return shard


def shard_files_for_host(
    files: Sequence[str],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Per-host round-robin shard of a file list (see shard_for_host)."""
    return list(shard_for_host(files, process_index, process_count))
