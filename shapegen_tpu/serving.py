"""Serving: ahead-of-time sampler export (StableHLO via jax.export).

Production deployment surface the reference lacks entirely: the full
1000-step DDIM sampler (weights baked in as constants) exports to one
serialized StableHLO artifact that a serving binary can load and run with
no Python model code — the artifact *is* the compiled-once scan program.

The exported function takes a single uint32 PRNG key array and returns the
sampled point clouds / latents.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from shapegen_tpu.ops import voxel_to_points_padded


def export_sampler(
    task,
    state,
    num_samples: int,
    num_points: int = None,
    num_steps: int = 1000,
    platforms=None,
) -> bytes:
    """Serialize the task's DDIM sampler with weights baked in.

    platforms: optional list like ['tpu'] or ['cpu'] to pin lowering
    platforms (defaults to the current backend).
    """

    def run(key_data):
        key = jax.random.wrap_key_data(key_data)
        return task.sample(state, key, num_samples, num_points, num_steps)

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(run), **kwargs)(key_spec)
    return bytes(exported.serialize())


def export_conditional_sampler(
    task,
    state,
    labels,
    num_points: int = None,
    num_steps: int = 1000,
    guidance_scale: float = 2.0,
    platforms=None,
) -> bytes:
    """Serialize the classifier-free-guided conditional sampler with the
    label batch and guidance scale baked in (one artifact per serving
    configuration; see export_sampler)."""
    labels = jnp.asarray(labels, jnp.int32)

    def run(key_data):
        key = jax.random.wrap_key_data(key_data)
        return task.sample_conditional(
            state, key, labels, num_points=num_points, num_steps=num_steps,
            guidance_scale=guidance_scale,
        )

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(run), **kwargs)(key_spec)
    return bytes(exported.serialize())


def export_ldm_sampler(
    task,
    state,
    num_samples: int,
    num_steps: int = 1000,
    threshold: float = 0.4,
    max_points: int = 2048,
    platforms=None,
) -> bytes:
    """Serialize the FULL latent-diffusion pipeline as one program.

    One StableHLO artifact contains the whole reference inference path
    (diffusion.py:619-653): the 1000-step latent DDIM `lax.scan`, the frozen
    VAE decode, and — for voxel-based LDMs — the thresholded voxel→point
    conversion (threshold 0.4, diffusion.py:576,620). The ragged output of
    the reference (utils.py:511-538 returns variable-length lists) becomes
    a static (points, mask, count) triple; de-padding stays a host edge in
    the consumer. Point-VAE LDMs return decoded (B, N, 3) clouds directly.
    """

    def run(key_data):
        key = jax.random.wrap_key_data(key_data)
        z0 = task.sample_latents(state, key, num_samples, num_steps)
        x = task.decode(z0)
        if not task.is_voxel_based:
            return x
        grids = jnp.squeeze(x, axis=-1)
        return voxel_to_points_padded(
            grids, max_points=max_points, threshold=threshold
        )

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(run), **kwargs)(key_spec)
    return bytes(exported.serialize())


def export_vae_sampler(
    task,
    state,
    num_samples: int,
    threshold: float = 0.4,
    max_points: int = 2048,
    platforms=None,
) -> bytes:
    """Serialize prior-draw VAE generation (networks.py:2446-2462).

    Voxel VAEs (VAE3D / VAE3DLarge): z ~ N(0, I) → decode → thresholded
    occupancy → padded (points, mask, count). Point VAEs
    (SimplePointNetVAE / PointNetVAE): z → decoded (B, N, 3) clouds.
    """

    def run(key_data):
        key = jax.random.wrap_key_data(key_data)
        if hasattr(task, "sample_voxels"):
            voxels = task.sample_voxels(state, key, num_samples)
            grids = jnp.squeeze(voxels, axis=-1)
            return voxel_to_points_padded(
                grids, max_points=max_points, threshold=threshold
            )
        return task.sample(state, key, num_samples)

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(run), **kwargs)(key_spec)
    return bytes(exported.serialize())


def load_sampler(blob: bytes):
    """Deserialize an exported sampler; returns fn(key_data) -> samples."""
    exported = jax_export.deserialize(blob)

    def run(key_data):
        return exported.call(jnp.asarray(key_data, jnp.uint32))

    return run


def key_data(seed: int) -> jnp.ndarray:
    """uint32 key payload for an exported sampler."""
    return jax.random.key_data(jax.random.PRNGKey(seed))
