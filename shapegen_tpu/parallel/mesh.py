"""Device mesh + sharding helpers: the framework's scale-out layer.

The reference has **no** multi-device support (devices=1 everywhere,
train_point_ddpm.py:82; SURVEY.md §2.10). Here scale-out is first-class and
TPU-native: a ``jax.sharding.Mesh`` whose 'data' axis carries batch-sharded
train steps (XLA inserts the psum gradient/batch-stat reductions over ICI)
and sampler fan-out where num_samples shards across chips with latents
HBM-resident for the whole lax.scan.

N-D meshes are supported: pass ``axis_names=("data", "model")`` +
``mesh_shape`` and a rules-based parameter-sharding tree
(``tree_shardings``/``shard_state``) to add tensor parallelism on top of DP
— see models/point_unet.py::POINT_UNET_LARGE_TP_RULES for the flagship's
Megatron-style column->row split of its global-feature chain. For reference
parity the 1-D data mesh remains the default (and the perf operating point:
the largest model is ~21M params and fits per-chip, so TP buys memory
headroom, not speed — the split chain trades one activation psum per step).
"""

from __future__ import annotations

import math
import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over the first num_devices devices.

    1-D by default; for an N-D mesh give matching ``axis_names`` and
    ``mesh_shape`` (e.g. ``("data", "model")``, ``(4, 2)``).
    """
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
        if mesh_shape is None or len(mesh_shape) != len(axis_names):
            raise ValueError(
                f"an N-D mesh needs mesh_shape with one entry per axis name; "
                f"got axis_names={tuple(axis_names)} mesh_shape={mesh_shape}"
            )
        if math.prod(mesh_shape) != n:
            raise ValueError(
                f"mesh_shape {tuple(mesh_shape)} does not cover "
                f"{n} devices"
            )
        return Mesh(devices.reshape(tuple(mesh_shape)), tuple(axis_names))
    return Mesh(devices.reshape(n), tuple(axis_names))


def data_axis_size(mesh: Mesh) -> int:
    """Size of the batch-sharding ('data') axis — the divisibility unit for
    global batches (other axes replicate the batch)."""
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        "data", mesh.devices.size
    )


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


def _path_str(path) -> str:
    """'/'-joined leaf path: dict keys and attribute names as-is, sequence
    indices as digits — e.g. 'params/DenseBN_0/Dense_0/kernel' or
    'opt_state/0/mu/DenseBN_0/Dense_0/kernel'."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tree_shardings(
    tree: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]]
) -> Any:
    """Per-leaf NamedSharding tree from first-matching path-regex rules.

    ``rules`` is a list of (regex, PartitionSpec); each leaf's '/'-joined
    path (see _path_str) is matched with ``re.search`` against the rules in
    order, and the first hit decides its spec — no hit means replicated.
    Optimizer moments need no extra rules: optax's mu/nu mirror the param
    tree, so a rule matching 'DenseBN_0/Dense_0/kernel' also matches the
    corresponding moment leaves. Specs are validated against the leaf rank
    and the mesh axis sizes (a sharded dim must divide evenly).
    """
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def one(path, leaf):
        p = _path_str(path)
        for pat, spec in compiled:
            if pat.search(p):
                if len(spec) > getattr(leaf, "ndim", 0):
                    raise ValueError(
                        f"rule {pat.pattern!r} gives rank-{len(spec)} spec "
                        f"{spec} to rank-{getattr(leaf, 'ndim', 0)} leaf {p}"
                    )
                for d, ax in enumerate(spec):
                    if ax is None:
                        continue
                    size = axis_sizes.get(ax)
                    if size is None:
                        raise ValueError(
                            f"rule {pat.pattern!r}: axis {ax!r} not in mesh "
                            f"{tuple(mesh.axis_names)}"
                        )
                    if leaf.shape[d] % size:
                        raise ValueError(
                            f"leaf {p} dim {d} ({leaf.shape[d]}) not "
                            f"divisible by mesh axis {ax!r} ({size})"
                        )
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_state(
    state: Any,
    mesh: Optional[Mesh],
    rules: Optional[Sequence[Tuple[str, P]]] = None,
) -> Any:
    """Place train state on the mesh: replicated without rules (the DP
    default), else per-leaf by ``tree_shardings`` (tensor parallelism)."""
    if mesh is None:
        return state
    if not rules:
        return jax.device_put(state, replicated_sharding(mesh))
    return jax.device_put(state, tree_shardings(state, mesh, rules))


def replicate_state(state: Any, mesh: Optional[Mesh]) -> Any:
    """Replicate model/optimizer state across the mesh."""
    return shard_state(state, mesh, None)


def shard_sample_count(num_samples: int, mesh: Optional[Mesh]) -> int:
    """Round num_samples up to a data-axis multiple for sharded sampling."""
    if mesh is None:
        return num_samples
    n = data_axis_size(mesh)
    return ((num_samples + n - 1) // n) * n
