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


def load_sampler(blob: bytes):
    """Deserialize an exported sampler; returns fn(key_data) -> samples."""
    exported = jax_export.deserialize(blob)

    def run(key_data):
        return exported.call(jnp.asarray(key_data, jnp.uint32))

    return run


def key_data(seed: int) -> jnp.ndarray:
    """uint32 key payload for an exported sampler."""
    return jax.random.key_data(jax.random.PRNGKey(seed))
