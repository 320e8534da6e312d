"""Reverse-process samplers as single compiled ``lax.scan`` programs.

The reference runs each sampler as a 1000-iteration *Python* loop with one
full denoiser forward per iteration (diffusion.py:279-287 and friends) — a
host-bound launch pattern. Here the entire reverse trajectory is one XLA
program: latents stay HBM-resident across steps, there is no host sync until
the final result, and the denoiser is traced exactly once.

Behavioral parity targets (reference file:line):
  * ddim_sample:       diffusion.py:261-289  ("sample" — the default
                       entrypoint sampler). t starts at 1.0 and steps down by
                       1/num_steps; the final next_t deliberately underflows
                       slightly below 0, as in the reference. Returns x_0.
  * ddpm_sample:       diffusion.py:225-259  ("sample2" — ancestral DDPM).
                       x_t <- signal_prev*x_0 + sqrt(noise_prev/noise) *
                       noise_rate * fresh_noise; last step returns x_0.
  * ddim_sample_from:  diffusion.py:291-337  ("sample3" — DDIM from a given
                       (x, start_t)). Steps over linspace(start_t, 0,
                       num_steps); skips the state update on the last step.

All samplers are rank-generic: shape (B, N, 3) for point clouds and (B, D)
for latents (diffusion.py:575-707 reuses the same math in latent space).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from shapegen_tpu.core.diffusion import DenoiseFn, expand_rates, remove_noise
from shapegen_tpu.core.schedules import Schedule, offset_cosine_schedule


def ddim_sample(
    key: jax.Array,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    num_steps: int = 1000,
    schedule: Schedule = offset_cosine_schedule,
) -> jnp.ndarray:
    """Deterministic DDIM sampling from pure noise (diffusion.py:261-289)."""
    batch = shape[0]
    x_t = jax.random.normal(key, shape, dtype=jnp.float32)
    step_size = 1.0 / num_steps

    def body(carry, step):
        x_t, _ = carry
        t = jnp.full((batch,), 1.0, jnp.float32) - step.astype(jnp.float32) * step_size
        noise_rates, signal_rates = schedule(t)
        predicted_noise = denoise_fn(x_t, t)
        x_0 = remove_noise(x_t, predicted_noise, noise_rates, signal_rates)
        next_t = t - step_size  # underflows slightly below 0 on the last step
        next_noise_rates, next_signal_rates = schedule(next_t)
        x_next = (
            expand_rates(next_signal_rates, x_0) * x_0
            + expand_rates(next_noise_rates, x_0) * predicted_noise
        )
        return (x_next, x_0), None

    (_, x_0), _ = jax.lax.scan(
        body, (x_t, jnp.zeros_like(x_t)), jnp.arange(num_steps)
    )
    return x_0


def ddpm_sample(
    key: jax.Array,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    num_steps: int = 1000,
    schedule: Schedule = offset_cosine_schedule,
) -> jnp.ndarray:
    """Ancestral DDPM sampling (diffusion.py:225-259)."""
    batch = shape[0]
    init_key, noise_key = jax.random.split(key)
    x_t = jax.random.normal(init_key, shape, dtype=jnp.float32)

    def body(x_t, i):
        # i runs num_steps-1 ... 0 (reversed(range(num_steps))).
        t = jnp.full((batch,), 1.0, jnp.float32) * i.astype(jnp.float32) / num_steps
        noise_rates, signal_rates = schedule(t)
        predicted_noise = denoise_fn(x_t, t)
        x_0 = remove_noise(x_t, predicted_noise, noise_rates, signal_rates)

        t_prev = jnp.full((batch,), 1.0, jnp.float32) * (
            i.astype(jnp.float32) - 1.0
        ) / num_steps
        noise_rates_prev, signal_rates_prev = schedule(t_prev)
        coefficient = jnp.sqrt(noise_rates_prev / noise_rates)
        fresh = jax.random.normal(jax.random.fold_in(noise_key, i), x_t.shape, x_t.dtype)
        x_ancestral = (
            expand_rates(signal_rates_prev, x_0) * x_0
            + expand_rates(coefficient, x_0)
            * expand_rates(noise_rates, x_0)
            * fresh
        )
        # "Don't add noise at the last step" (diffusion.py:248-257).
        x_next = jnp.where(i > 0, x_ancestral, x_0)
        return x_next, None

    x_t, _ = jax.lax.scan(body, x_t, jnp.arange(num_steps - 1, -1, -1))
    return x_t


def ddim_sample_from(
    key: Optional[jax.Array],
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    start_t: jnp.ndarray,
    num_steps: int = 1000,
    schedule: Schedule = offset_cosine_schedule,
) -> jnp.ndarray:
    """DDIM sampling from a given noisy state (diffusion.py:291-337).

    ``start_t`` is (B,); as in the reference, the step grid is built from
    start_t[0] (diffusion.py:324). ``key`` is only used when ``x`` is None in
    the reference; here x is required, so key may be None.
    """
    del key
    batch = x.shape[0]
    steps = jnp.linspace(start_t[0], 0.0, num_steps)

    def body(carry, i):
        x, _ = carry
        t = steps[i]
        noise_rates, signal_rates = schedule(t)
        t_batch = jnp.broadcast_to(t, (batch,))
        predicted_noise = denoise_fn(x, t_batch)
        x_0 = remove_noise(x, predicted_noise, noise_rates, signal_rates)

        next_t = steps[jnp.minimum(i + 1, num_steps - 1)]
        next_noise_rates, next_signal_rates = schedule(next_t)
        x_updated = (
            expand_rates(jnp.broadcast_to(next_signal_rates, (batch,)), x_0) * x_0
            + expand_rates(jnp.broadcast_to(next_noise_rates, (batch,)), x_0)
            * predicted_noise
        )
        # Skip the state update on the last iteration (diffusion.py:332).
        x_next = jnp.where(i < num_steps - 1, x_updated, x)
        return (x_next, x_0), None

    (_, x_0), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), jnp.arange(num_steps))
    return x_0
