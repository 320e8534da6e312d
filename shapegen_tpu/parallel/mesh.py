"""Device mesh + sharding helpers: the framework's scale-out layer.

The reference has **no** multi-device support (devices=1 everywhere,
train_point_ddpm.py:82; SURVEY.md §2.10). Here scale-out is first-class and
TPU-native: a 1-D ``jax.sharding.Mesh`` over the 'data' axis, batch-sharded
train steps (XLA inserts the psum gradient/batch-stat reductions over ICI),
and sampler fan-out where num_samples shards across chips with latents
HBM-resident for the whole lax.scan.

The mesh API is deliberately N-D-ready (axis_names tuple) so tensor/pipeline
axes can be added later, but only 'data' is used for reference parity — the
largest model is ~21M params and fits per-chip.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
) -> Mesh:
    """1-D (or reshaped N-D) mesh over the first num_devices devices."""
    devices = jax.devices()
    if jax.process_count() > 1 and num_devices not in (None, len(devices)):
        # On a pod, a mesh that covers only some processes' devices breaks
        # make_array_from_process_local_data (every process must contribute
        # its addressable shards). The full global mesh is the only valid
        # data-parallel layout here.
        raise ValueError(
            f"num_devices={num_devices} on a {jax.process_count()}-process "
            f"run: multi-host meshes must span all {len(devices)} global "
            "devices (omit --num-devices)"
        )
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    if len(axis_names) > 1:
        # Equal split across leading axes; last axis absorbs the remainder.
        raise NotImplementedError(
            "only 1-D data meshes are used for reference parity; "
            "extend here for tp/pp axes"
        )
    return Mesh(devices.reshape(n), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_batch_from_local(batch: Any, mesh: Mesh) -> Any:
    """Assemble per-host local batches into one global data-sharded array.

    The multi-host (DCN) input path: every process feeds its local shard and
    ``jax.make_array_from_process_local_data`` stitches the global batch
    whose addressable shards live on the local chips. Works identically in
    the single-process case (local == global), so tests exercise the same
    code path the pod runs.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Place a host batch on device(s), batch-dim sharded when mesh given.

    Multi-process (pod) runs route through ``global_batch_from_local``:
    each host contributes its local batch to the global array.
    """
    if mesh is None:
        return jax.device_put(batch)
    if jax.process_count() > 1:
        return global_batch_from_local(batch, mesh)
    return jax.device_put(batch, batch_sharding(mesh))


def replicate_state(state: Any, mesh: Optional[Mesh]) -> Any:
    """Replicate model/optimizer state across the mesh."""
    if mesh is None:
        return state
    return jax.device_put(state, replicated_sharding(mesh))


def shard_sample_count(num_samples: int, mesh: Optional[Mesh]) -> int:
    """Round num_samples up to a device multiple for sharded sampling."""
    if mesh is None:
        return num_samples
    n = mesh.devices.size
    return ((num_samples + n - 1) // n) * n
