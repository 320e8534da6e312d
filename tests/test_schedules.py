"""Golden tests for noise schedules against closed-form values."""

import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu.core import schedules


def test_cosine_endpoints():
    noise, signal = schedules.offset_cosine_schedule(jnp.array([0.0, 1.0]))
    # At t=0 signal rate is the max (0.95); at t=1 it is the min (0.02).
    np.testing.assert_allclose(signal[0], 0.95, rtol=1e-6)
    np.testing.assert_allclose(signal[1], 0.02, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(noise, np.sqrt(1 - np.asarray(signal) ** 2), rtol=1e-6)


def test_cosine_unit_energy():
    t = jnp.linspace(-0.05, 1.05, 23)  # includes the DDIM end-of-loop underflow
    noise, signal = schedules.offset_cosine_schedule(t)
    np.testing.assert_allclose(np.asarray(noise**2 + signal**2), 1.0, rtol=1e-6)


def test_cosine_closed_form():
    t = np.array([0.25, 0.5, 0.75], np.float32)
    noise, signal = schedules.offset_cosine_schedule(jnp.asarray(t))
    start = np.arccos(0.95)
    end = np.arccos(0.02)
    ang = start + t * (end - start)
    np.testing.assert_allclose(np.asarray(signal), np.cos(ang), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(noise), np.sin(ang), rtol=1e-6)


def test_linear_schedule_batch_cumprod_quirk():
    # Faithful reproduction of diffusion.py:189-205 including the cumprod over
    # the batch axis.
    t = np.array([0.1, 0.5, 0.9], np.float32)
    noise, signal = schedules.linear_schedule(jnp.asarray(t))
    betas = 1e-4 + t * (0.02 - 1e-4)
    alpha_bars = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(signal), alpha_bars, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(noise), 1 - alpha_bars, rtol=1e-6)


def test_get_schedule():
    assert schedules.get_schedule("cosine") is schedules.offset_cosine_schedule
    assert schedules.get_schedule("linear") is schedules.linear_schedule
    with pytest.raises(ValueError):
        schedules.get_schedule("nope")
