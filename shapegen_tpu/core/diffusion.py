"""Forward-noising process and epsilon-prediction loss (pure functions).

Behavioral parity targets (reference file:line):
  * add_noise:    diffusion.py:138-152 (point clouds, rank-3 broadcast) and
                  diffusion.py:490-504 (latents, rank-2 broadcast) — unified
                  here by broadcasting rates over all trailing axes of x.
  * remove_noise: diffusion.py:154-168 / 506-520.
  * loss:         diffusion.py:170-186 — **L1 (MAE)**, deliberately not MSE.
  * t sampling:   continuous U(0,1) per batch element (diffusion.py:83).

These are rank-generic: the same functions drive the (B, N, 3) point-cloud
process and the (B, D) latent process.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from shapegen_tpu.core.schedules import Schedule, offset_cosine_schedule

# denoise_fn(x_t, t) -> predicted noise, same shape as x_t.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def expand_rates(rates: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-sample rates (B,) against x (B, ...).

    Mirrors the reference's ``.view(-1, 1, 1)`` (points) / ``.view(-1, 1)``
    (latents) without hard-coding rank.
    """
    rates = jnp.asarray(rates)
    return rates.reshape(rates.shape + (1,) * (x.ndim - rates.ndim))


def add_noise(
    key: jax.Array,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    schedule: Schedule = offset_cosine_schedule,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x_t = signal_rate * x_0 + noise_rate * eps,  eps ~ N(0, I).

    Returns (x_t, noise, noise_rates, signal_rates), like diffusion.py:138-152.
    """
    noise = jax.random.normal(key, x_0.shape, dtype=x_0.dtype)
    noise_rates, signal_rates = schedule(t)
    x_t = expand_rates(signal_rates, x_0) * x_0 + expand_rates(noise_rates, x_0) * noise
    return x_t, noise, noise_rates, signal_rates


def remove_noise(
    x_t: jnp.ndarray,
    predicted_noise: jnp.ndarray,
    noise_rates: jnp.ndarray,
    signal_rates: jnp.ndarray,
) -> jnp.ndarray:
    """x_0 = (x_t - noise_rate * eps_hat) / signal_rate (diffusion.py:154-168)."""
    return (x_t - expand_rates(noise_rates, x_t) * predicted_noise) / expand_rates(
        signal_rates, x_t
    )


def l1_eps_loss(noise: jnp.ndarray, predicted_noise: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error between true and predicted noise (diffusion.py:183)."""
    return jnp.mean(jnp.abs(noise - predicted_noise))


def diffusion_loss(
    key: jax.Array,
    denoise_fn: DenoiseFn,
    x_0: jnp.ndarray,
    t: jnp.ndarray,
    schedule: Schedule = offset_cosine_schedule,
) -> jnp.ndarray:
    """Full forward-noising + eps-prediction L1 loss (diffusion.py:170-186)."""
    x_t, noise, _, _ = add_noise(key, x_0, t, schedule)
    predicted_noise = denoise_fn(x_t, t)
    return l1_eps_loss(noise, predicted_noise)


def sample_timesteps(key: jax.Array, batch_size: int) -> jnp.ndarray:
    """t ~ U(0,1) per batch element (diffusion.py:83)."""
    return jax.random.uniform(key, (batch_size,), dtype=jnp.float32)
