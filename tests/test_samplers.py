"""Sampler tests: single-step algebra, numpy-oracle parity, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu.core import samplers
from shapegen_tpu.core.schedules import offset_cosine_schedule


def _np_schedule(t):
    start = np.arccos(0.95)
    end = np.arccos(0.02)
    ang = start + np.asarray(t, np.float32) * (end - start)
    return np.sin(ang), np.cos(ang)


def _oracle_denoiser(target):
    """eps-oracle: given x_t built from `target`, return the exact noise."""

    def fn(x_t, t):
        nr, sr = offset_cosine_schedule(t)
        nr = nr.reshape(nr.shape + (1,) * (x_t.ndim - 1))
        sr = sr.reshape(sr.shape + (1,) * (x_t.ndim - 1))
        return (x_t - sr * target) / nr

    return fn


def test_ddim_single_step_recovers_target():
    key = jax.random.PRNGKey(24)
    target = jnp.broadcast_to(jnp.array([0.5, -0.25, 1.0]), (2, 64, 3))
    x0 = samplers.ddim_sample(key, _oracle_denoiser(target), (2, 64, 3), num_steps=1)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(target), atol=1e-4)


def test_ddim_many_steps_recovers_target():
    key = jax.random.PRNGKey(3)
    target = jnp.broadcast_to(jnp.array([0.1, 0.2, -0.3]), (1, 32, 3))
    x0 = samplers.ddim_sample(key, _oracle_denoiser(target), (1, 32, 3), num_steps=50)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(target), atol=1e-3)


def test_ddim_matches_numpy_reference_loop():
    """Step the reference DDIM equations (diffusion.py:261-289) in numpy."""
    num_steps = 13
    shape = (3, 16, 3)
    key = jax.random.PRNGKey(11)

    # A fixed arbitrary linear "denoiser" so the loop math is the only variable.
    w = np.asarray(jax.random.normal(jax.random.PRNGKey(99), (3, 3))) * 0.1

    def denoise_jax(x_t, t):
        return x_t @ jnp.asarray(w) + t[:, None, None] * 0.01

    x0_jax = samplers.ddim_sample(key, denoise_jax, shape, num_steps=num_steps)

    x_t = np.asarray(jax.random.normal(key, shape, dtype=jnp.float32))
    step_size = 1.0 / num_steps
    x0 = None
    for step in range(num_steps):
        t = np.full((shape[0],), 1.0, np.float32) - step * step_size
        nr, sr = _np_schedule(t)
        eps = x_t @ w + t[:, None, None] * 0.01
        x0 = (x_t - nr[:, None, None] * eps) / sr[:, None, None]
        nt = t - step_size
        nnr, nsr = _np_schedule(nt)
        x_t = nsr[:, None, None] * x0 + nnr[:, None, None] * eps
    # fp32: the 1/signal_rate division at t≈1 divides by 0.02, amplifying
    # accumulation-order differences between XLA and numpy.
    np.testing.assert_allclose(np.asarray(x0_jax), x0, rtol=5e-3, atol=0.1)


def test_ddpm_matches_numpy_reference_loop_last_step():
    """DDPM last-step behavior: returns x_0, no extra noise (diffusion.py:256)."""
    target = jnp.broadcast_to(jnp.array([0.3, 0.0, -0.6]), (2, 32, 3))
    key = jax.random.PRNGKey(5)
    out = samplers.ddpm_sample(key, _oracle_denoiser(target), (2, 32, 3), num_steps=8)
    # Oracle denoiser drives every x_0 estimate to the target exactly.
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_ddim_sample_from_matches_numpy_reference_loop():
    """Reference sample3 math (diffusion.py:291-337) in numpy."""
    num_steps = 9
    shape = (2, 16, 3)
    start_t = jnp.array([0.35, 0.35])
    x_init = jax.random.normal(jax.random.PRNGKey(8), shape, dtype=jnp.float32)

    w = np.asarray(jax.random.normal(jax.random.PRNGKey(77), (3, 3))) * 0.05

    def denoise_jax(x, t):
        return x @ jnp.asarray(w)

    got = samplers.ddim_sample_from(
        None, denoise_jax, x_init, start_t, num_steps=num_steps
    )

    x = np.asarray(x_init)
    steps = np.linspace(0.35, 0.0, num_steps, dtype=np.float32)
    x0 = None
    for i in range(num_steps):
        t = steps[i]
        nr, sr = _np_schedule(t)
        eps = x @ w
        x0 = (x - nr * eps) / sr
        if i < num_steps - 1:
            nnr, nsr = _np_schedule(steps[i + 1])
            x = nsr * x0 + nnr * eps
    np.testing.assert_allclose(np.asarray(got), x0, rtol=2e-3, atol=2e-4)


def test_samplers_deterministic_given_key():
    target = jnp.zeros((1, 8, 3))
    fn = _oracle_denoiser(target + 0.1)
    a = samplers.ddim_sample(jax.random.PRNGKey(1), fn, (1, 8, 3), num_steps=4)
    b = samplers.ddim_sample(jax.random.PRNGKey(1), fn, (1, 8, 3), num_steps=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latent_rank_supported():
    target = jnp.full((4, 64), 0.2)
    out = samplers.ddim_sample(
        jax.random.PRNGKey(2), _oracle_denoiser(target), (4, 64), num_steps=5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)
