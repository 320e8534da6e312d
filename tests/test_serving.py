"""AOT sampler export roundtrip + consumer-process proof."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import models, serving
from shapegen_tpu.train import tasks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_load_roundtrip():
    model = models.SimplePointUNet(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=16)
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((2, 16, 3)))

    blob = serving.export_sampler(task, state, num_samples=2, num_points=16,
                                  num_steps=3)
    assert isinstance(blob, bytes) and len(blob) > 1000

    fn = serving.load_sampler(blob)
    kd = serving.key_data(7)
    out = fn(kd)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    # Matches the live sampler up to compilation-order float noise.
    live = task.sample(state, jax.random.PRNGKey(7), 2, 16, num_steps=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), rtol=1e-4)


def test_export_runs_in_consumer_process_without_model_code(tmp_path):
    """The point of StableHLO export: a consumer with NO Python model code.
    A subprocess that imports only shapegen_tpu.serving (the script asserts
    no shapegen_tpu.models / .train / flax modules get loaded) deserializes
    the artifact, runs it, and must reproduce this process's output of the
    same artifact bitwise (same program, same platform, same key)."""
    model = models.SimplePointUNet(dim=32, time_dim=32)
    task = tasks.PointDiffusionTask(model, num_points=16)
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((2, 16, 3)))
    blob = serving.export_sampler(
        task, state, num_samples=2, num_points=16, num_steps=3
    )
    blob_path = tmp_path / "sampler.stablehlo"
    blob_path.write_bytes(blob)

    here = np.asarray(serving.load_sampler(blob)(serving.key_data(7)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    # The consumer must import shapegen_tpu.serving regardless of how pytest
    # was invoked (python adds the script's dir to sys.path, not the cwd).
    prior = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + prior if prior else "")
    out_path = tmp_path / "consumer_out.npy"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "serving_consumer.py"),
         str(blob_path), "7", str(out_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "consumer OK" in res.stdout

    theirs = np.load(out_path)
    np.testing.assert_array_equal(here, theirs)


def test_export_ldm_pipeline_roundtrip():
    """ONE artifact holds the whole LDM inference path: latent DDIM scan →
    frozen VAE decode → voxel→point conversion (diffusion.py:619-653)."""
    from shapegen_tpu.ops import voxel_to_points_padded

    vae = models.VAE3DLarge(latent_dim=16)
    rng = jax.random.PRNGKey(0)
    vae_vars = vae.init(rng, jnp.zeros((1, 32, 32, 32, 1)), rng, train=False)
    task = tasks.LatentDiffusionTask(
        models.SimpleLatentUNet(latent_dim=16, dim=32, time_dim=32),
        vae, vae_vars, latent_dim=16, max_epochs=2,
    )
    state = task.init_state(jax.random.PRNGKey(1), jnp.zeros((2, 16)))

    blob = serving.export_ldm_sampler(
        task, state, num_samples=2, num_steps=3, threshold=0.4, max_points=64
    )
    pts, mask, count = serving.load_sampler(blob)(serving.key_data(11))
    assert pts.shape == (2, 64, 3) and mask.shape == (2, 64)
    assert np.isfinite(np.asarray(pts)).all()

    z0 = task.sample_latents(state, jax.random.PRNGKey(11), 2, num_steps=3)
    grids = jnp.squeeze(task.decode(z0), axis=-1)
    live_pts, live_mask, live_count = voxel_to_points_padded(
        grids, max_points=64, threshold=0.4
    )
    np.testing.assert_array_equal(np.asarray(count), np.asarray(live_count))
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(live_mask))
    np.testing.assert_allclose(np.asarray(pts), np.asarray(live_pts),
                               rtol=1e-4, atol=1e-5)


def test_export_ldm_point_vae_returns_clouds():
    """Point-VAE LDMs skip voxel conversion: the artifact emits (B, N, 3)."""
    vae = models.SimplePointNetVAE(num_points=64, latent_dim=16)
    rng = jax.random.PRNGKey(0)
    vae_vars = vae.init(rng, jnp.zeros((1, 64, 3)), rng, train=False)
    task = tasks.LatentDiffusionTask(
        models.SimpleLatentUNet(latent_dim=16, dim=32, time_dim=32),
        vae, vae_vars, latent_dim=16, is_voxel_based=False, max_epochs=2,
    )
    state = task.init_state(jax.random.PRNGKey(1), jnp.zeros((2, 16)))

    blob = serving.export_ldm_sampler(task, state, num_samples=2, num_steps=3)
    out = serving.load_sampler(blob)(serving.key_data(3))
    assert out.shape == (2, 64, 3)
    z0 = task.sample_latents(state, jax.random.PRNGKey(3), 2, num_steps=3)
    live = task.decode(z0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-4, atol=1e-5)


def test_export_vae_prior_sampler_roundtrip():
    """VAE prior-draw generation (networks.py:2446-2462) as one artifact."""
    from shapegen_tpu.ops import voxel_to_points_padded

    task = tasks.VAE3DLargeTask(models.VAE3DLarge(latent_dim=16), max_epochs=2)
    state = task.init_state(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 32, 1))
    )
    blob = serving.export_vae_sampler(
        task, state, num_samples=2, threshold=0.4, max_points=64
    )
    pts, mask, count = serving.load_sampler(blob)(serving.key_data(5))
    assert pts.shape == (2, 64, 3)

    voxels = task.sample_voxels(state, jax.random.PRNGKey(5), 2)
    live_pts, live_mask, live_count = voxel_to_points_padded(
        jnp.squeeze(voxels, axis=-1), max_points=64, threshold=0.4
    )
    np.testing.assert_array_equal(np.asarray(count), np.asarray(live_count))
    np.testing.assert_allclose(np.asarray(pts), np.asarray(live_pts),
                               rtol=1e-4, atol=1e-5)


def test_export_point_vae_prior_sampler():
    task = tasks.PointNetVAETask(
        models.PointNetVAE(num_points=64, latent_dim=16)
    )
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((2, 64, 3)))
    blob = serving.export_vae_sampler(task, state, num_samples=2)
    out = serving.load_sampler(blob)(serving.key_data(13))
    assert out.shape == (2, 64, 3)
    live = task.sample(state, jax.random.PRNGKey(13), 2)
    # The exported program and the op-by-op live path fuse/reassociate f32
    # matmuls differently; the untrained decoder amplifies that to ~2e-4 rel.
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-3, atol=1e-4)


def test_export_conditional_roundtrip():
    model = models.PointUNetLarge(dim=32, time_dim=32, num_classes=5)
    task = tasks.PointDiffusionTask(model, num_points=16, num_classes=5)
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((2, 16, 3)))

    labels = jnp.asarray([1, 3], jnp.int32)
    blob = serving.export_conditional_sampler(
        task, state, labels, num_points=16, num_steps=3, guidance_scale=2.0
    )
    fn = serving.load_sampler(blob)
    out = fn(serving.key_data(9))
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    live = task.sample_conditional(
        state, jax.random.PRNGKey(9), labels, num_points=16, num_steps=3,
        guidance_scale=2.0,
    )
    # Untrained weights + CFG at 3 steps produce huge values (the final
    # /signal_rate=0.02 divide amplifies fp noise); compare to a
    # scale-aware tolerance.
    live = np.asarray(live)
    np.testing.assert_allclose(
        np.asarray(out), live, rtol=1e-3, atol=1e-4 * np.abs(live).max()
    )
