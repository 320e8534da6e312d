"""Continuous-time diffusion noise schedules (pure jnp).

Behavioral parity targets (reference file:line):
  * offset-cosine schedule: diffusion.py:207-223 — angles between
    acos(max_signal_rate) and acos(min_signal_rate); signal = cos(angle),
    noise = sin(angle), so signal^2 + noise^2 == 1 for all t.
  * linear schedule: diffusion.py:189-205 — betas linear in t followed by a
    cumprod over the *batch* dimension. That cumprod couples schedule values
    across unrelated batch elements (a latent quirk of the reference; only
    meaningful for sorted t). The default schedule everywhere is cosine, so we
    reproduce the linear schedule faithfully behind its own function and
    document the quirk here instead of silently "fixing" it.

All schedules map diffusion times ``t`` (any shape, typically (B,), values
nominally in [0, 1] but allowed to extrapolate slightly past the ends as the
reference's DDIM sampler does on its last step, diffusion.py:285-287) to
``(noise_rates, signal_rates)`` of the same shape.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]

# Reference constants (diffusion.py:32-35).
LINEAR_MIN_RATE = 1e-4
LINEAR_MAX_RATE = 0.02
COSINE_MIN_SIGNAL_RATE = 0.02
COSINE_MAX_SIGNAL_RATE = 0.95


def offset_cosine_schedule(
    diffusion_times: jnp.ndarray,
    min_signal_rate: float = COSINE_MIN_SIGNAL_RATE,
    max_signal_rate: float = COSINE_MAX_SIGNAL_RATE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Offset-cosine schedule. Returns (noise_rates, signal_rates)."""
    t = jnp.asarray(diffusion_times, dtype=jnp.float32)
    start_angle = jnp.arccos(jnp.float32(max_signal_rate))
    end_angle = jnp.arccos(jnp.float32(min_signal_rate))
    angles = start_angle + t * (end_angle - start_angle)
    signal_rates = jnp.cos(angles)
    noise_rates = jnp.sin(angles)
    return noise_rates, signal_rates


def linear_schedule(
    diffusion_times: jnp.ndarray,
    min_rate: float = LINEAR_MIN_RATE,
    max_rate: float = LINEAR_MAX_RATE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear-beta schedule, faithful to diffusion.py:189-205.

    Note the cumprod over axis 0 (the batch axis for (B,)-shaped t): this is
    the reference's behavior, preserved deliberately — see module docstring.
    """
    t = jnp.asarray(diffusion_times, dtype=jnp.float32)
    betas = min_rate + t * (max_rate - min_rate)
    alphas = 1.0 - betas
    alpha_bars = jnp.cumprod(alphas, axis=0)
    signal_rates = alpha_bars
    noise_rates = 1.0 - alpha_bars
    return noise_rates, signal_rates


_SCHEDULES = {
    "cosine": offset_cosine_schedule,
    "linear": linear_schedule,
}


def get_schedule(name: str) -> Schedule:
    """Look up a schedule by the reference's ctor string ('cosine'|'linear')."""
    try:
        return _SCHEDULES[name]
    except KeyError:
        raise ValueError(
            f"Unknown noise schedule {name!r}; expected one of {sorted(_SCHEDULES)}"
        ) from None


@functools.lru_cache(maxsize=None)
def cached_schedule(name: str) -> Schedule:
    return get_schedule(name)
