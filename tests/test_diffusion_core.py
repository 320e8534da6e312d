"""Algebra tests for the forward process and loss."""

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu.core import diffusion
from shapegen_tpu.core.schedules import offset_cosine_schedule


def test_add_remove_roundtrip_points():
    key = jax.random.PRNGKey(24)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (4, 128, 3))
    t = jnp.array([0.1, 0.4, 0.7, 0.99])
    x_t, noise, nr, sr = diffusion.add_noise(k2, x0, t)
    recovered = diffusion.remove_noise(x_t, noise, nr, sr)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(x0), atol=1e-4)


def test_add_remove_roundtrip_latents():
    # Same functions drive the (B, D) latent process (diffusion.py:490-520).
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    z0 = jax.random.normal(k1, (8, 256))
    t = jax.random.uniform(k2, (8,))
    z_t, noise, nr, sr = diffusion.add_noise(k1, z0, t)
    recovered = diffusion.remove_noise(z_t, noise, nr, sr)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(z0), atol=1e-4)


def test_add_noise_matches_formula():
    key = jax.random.PRNGKey(3)
    x0 = jnp.ones((2, 16, 3))
    t = jnp.array([0.2, 0.8])
    x_t, noise, nr, sr = diffusion.add_noise(key, x0, t)
    expected = sr[:, None, None] * x0 + nr[:, None, None] * noise
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(expected), rtol=1e-6)
    nr_ref, sr_ref = offset_cosine_schedule(t)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(nr_ref))
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref))


def test_l1_loss_is_mae_not_mse():
    a = jnp.zeros((2, 4, 3))
    b = jnp.full((2, 4, 3), 2.0)
    assert float(diffusion.l1_eps_loss(a, b)) == 2.0  # MSE would be 4.0


def test_diffusion_loss_zero_for_oracle():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 32, 3))
    t = jnp.array([0.3, 0.6])

    captured = {}

    def noisy_oracle(x_t, t_in):
        return captured["noise"]

    # Capture the true noise by re-deriving it with the same key split logic.
    loss_key = jax.random.PRNGKey(42)
    x_t, noise, _, _ = diffusion.add_noise(loss_key, x0, t)
    captured["noise"] = noise
    loss = diffusion.diffusion_loss(loss_key, noisy_oracle, x0, t)
    assert float(loss) < 1e-7


def test_sample_timesteps_shape_and_range():
    t = diffusion.sample_timesteps(jax.random.PRNGKey(1), 64)
    assert t.shape == (64,)
    assert float(t.min()) >= 0.0 and float(t.max()) <= 1.0
