"""Shape/dtype golden tests and train/eval semantics for all model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu import models
from shapegen_tpu.models.layers import timestep_embedding
from shapegen_tpu.models.vae3d import (
    binary_cross_entropy,
    kl_divergence_mean,
    kl_divergence_sum,
    kl_warmup_weight,
)


def _n_params(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


def test_timestep_embedding_matches_reference_formula():
    t = jnp.array([0.0, 0.5, 1.0])
    emb = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.sin(args), np.cos(args)], -1)
    np.testing.assert_allclose(emb, want, atol=1e-6)
    # odd dim zero-pads
    assert timestep_embedding(t, 7).shape == (3, 7)
    assert float(timestep_embedding(t, 7)[0, -1]) == 0.0


def test_timestep_embedding_promotes_bf16_to_f32():
    """bf16 timesteps must not drag the sin/cos table below f32 (the
    promotion floors at f32; f64 parity inputs still promote upward)."""
    import jax.numpy as jnp

    t32 = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    emb_bf16 = timestep_embedding(t32.astype(jnp.bfloat16), 16)
    assert emb_bf16.dtype == jnp.float32
    # Value-level: the bf16 path matches the f32 path to bf16 input rounding.
    emb_f32 = timestep_embedding(t32, 16)
    np.testing.assert_allclose(
        np.asarray(emb_bf16), np.asarray(emb_f32), atol=1e-2
    )


def test_point_unet_large_shapes_and_size():
    model = models.PointUNetLarge()
    x = jnp.zeros((2, 128, 3))
    t = jnp.array([0.1, 0.9])
    variables = model.init(jax.random.PRNGKey(0), x, t, train=False)
    out = model.apply(variables, x, t, train=False)
    assert out.shape == (2, 128, 3)
    assert out.dtype == jnp.float32
    n = _n_params(variables["params"])
    # Exact hand-count of UNetPointNetLarge(256, 256) (networks.py:724-777)
    # is ~21.5M weights; allow slack for BN scale/bias bookkeeping.
    assert 20e6 < n < 23e6, n


def test_point_unet_large_batchnorm_train_updates_stats():
    model = models.PointUNetLarge()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    t = jnp.array([0.2, 0.8])
    variables = model.init(jax.random.PRNGKey(0), x, t, train=False)
    out, mutated = model.apply(
        variables, x, t, train=True, mutable=["batch_stats"]
    )
    # Running stats must change in train mode.
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    # Eval mode must not require mutation.
    out_eval = model.apply(variables, x, t, train=False)
    assert out_eval.shape == x.shape


def test_simple_point_unet_shapes():
    model = models.SimplePointUNet()
    x = jnp.zeros((2, 64, 3))
    t = jnp.array([0.1, 0.9])
    variables = model.init(jax.random.PRNGKey(0), x, t)
    assert model.apply(variables, x, t).shape == (2, 64, 3)


@pytest.mark.parametrize(
    "cls", [models.UNetAttentionPoint, models.PointUNetLargeWithAttention]
)
def test_experimental_attention_unets(cls):
    model = cls()
    x = jnp.zeros((1, 32, 3))
    t = jnp.array([0.5])
    variables = model.init(jax.random.PRNGKey(0), x, t)
    assert model.apply(variables, x, t).shape == (1, 32, 3)


def test_latent_unet_shapes():
    model = models.SimpleLatentUNet(latent_dim=256, dim=512)
    z = jnp.zeros((4, 256))
    t = jnp.array([0.1, 0.2, 0.3, 0.4])
    variables = model.init(jax.random.PRNGKey(0), z, t)
    out = model.apply(variables, z, t)
    assert out.shape == (4, 256)
    # dropout active in train mode needs an rng
    out_train = model.apply(
        variables, z, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out_train.shape == (4, 256)


def test_vae3d_large_roundtrip_shapes():
    model = models.VAE3DLarge()
    x = jnp.zeros((2, 32, 32, 32, 1))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, rng, train=False)
    recon, mu, logvar = model.apply(variables, x, rng, train=False)
    assert recon.shape == (2, 32, 32, 32, 1)
    assert mu.shape == (2, 256) and logvar.shape == (2, 256)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid
    z = jnp.zeros((3, 256))
    dec = model.apply(variables, z, train=False, method=model.decode)
    assert dec.shape == (3, 32, 32, 32, 1)


def test_vae3d_shapes():
    model = models.VAE3D()
    x = jnp.zeros((1, 32, 32, 32, 1))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, rng, train=False)
    recon, mu, logvar = model.apply(variables, x, rng, train=False)
    assert recon.shape == (1, 32, 32, 32, 1)
    assert mu.shape == (1, 256)


def test_simple_pointnet_vae_shapes():
    model = models.SimplePointNetVAE(num_points=128)
    x = jnp.zeros((2, 128, 3))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, rng, train=False)
    recon, mu, logvar = model.apply(variables, x, rng, train=False)
    assert recon.shape == (2, 128, 3)
    assert mu.shape == (2, 256)


def test_pointnet_vae_folding_shapes():
    model = models.PointNetVAE(num_points=256)
    x = jnp.zeros((1, 600, 3))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, rng, train=False)
    recon, mu, logvar = model.apply(variables, x, rng, train=False)
    assert recon.shape == (1, 256, 3)
    assert mu.shape == (1, 256)


def test_pointnet_vae_experimental_shapes():
    model = models.PointNetVAEExperimental(num_points=2048)
    x = jnp.zeros((1, 1500, 3))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, rng, train=False)
    recon, mu, logvar = model.apply(variables, x, rng, train=False)
    # decoder emits 2 * sa1.npoint points (upsample x2 of 1024-point level,
    # networks.py:1759-1764)
    assert recon.shape == (1, 2048, 3)


def test_bce_parity_with_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    pred = rng.random((4, 8, 8)).astype(np.float32)
    target = (rng.random((4, 8, 8)) > 0.5).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy(
        torch.tensor(pred), torch.tensor(target), reduction="mean"
    ).item()
    got = float(binary_cross_entropy(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # sum reduction (VAE3D, networks.py:2119)
    want_sum = torch.nn.functional.binary_cross_entropy(
        torch.tensor(pred), torch.tensor(target), reduction="sum"
    ).item()
    got_sum = float(
        binary_cross_entropy(jnp.asarray(pred), jnp.asarray(target), reduction="sum")
    )
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-4)


def test_bce_hard_01_inputs_finite():
    # Exact 0/1 predictions appear when BCE is applied to voxelized point
    # clouds (metrics.py:181); torch clamps log at -100.
    pred = jnp.array([0.0, 1.0, 0.0, 1.0])
    target = jnp.array([0.0, 1.0, 1.0, 0.0])
    out = float(binary_cross_entropy(pred, target))
    assert np.isfinite(out)
    np.testing.assert_allclose(out, 50.0)  # mean of [0, 0, 100, 100]


def test_kl_formulas():
    mu = jnp.array([[0.5, -0.5]])
    logvar = jnp.array([[0.0, 0.1]])
    want = -0.5 * np.sum(
        1 + np.asarray(logvar) - np.asarray(mu) ** 2 - np.exp(np.asarray(logvar))
    )
    np.testing.assert_allclose(float(kl_divergence_sum(mu, logvar)), want, rtol=1e-6)
    np.testing.assert_allclose(
        float(kl_divergence_mean(mu, logvar)), want / 2, rtol=1e-6
    )


def test_kl_warmup_schedule():
    # networks.py:2355-2370 with defaults (warmup 10 -> 0.1, anneal to 1.0 by 100).
    assert np.isclose(float(kl_warmup_weight(0, 500)), 0.01)
    assert np.isclose(float(kl_warmup_weight(9, 500)), 0.1)
    assert np.isclose(float(kl_warmup_weight(10, 500)), 0.1 + 1 / 90 * 0.9)
    assert np.isclose(float(kl_warmup_weight(99, 500)), 1.0)
    assert np.isclose(float(kl_warmup_weight(200, 500)), 1.0)
    # max_epochs caps annealing (min(max_epochs, kl_annealing_epochs))
    assert np.isclose(float(kl_warmup_weight(49, 50)), 1.0)


def test_pointunet_bfloat16_compute(rng):
    """--compute-dtype bfloat16 path: bf16 internals, f32 head/params."""
    model = models.PointUNetLarge(dim=32, time_dim=32, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    t = jnp.asarray([0.2, 0.8], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, t, train=False)
    # Params stay f32 (mixed-precision recipe: bf16 compute, f32 master).
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(variables["params"])
    )
    out, _ = model.apply(
        variables, x, t, train=True, mutable=["batch_stats"]
    )
    assert out.dtype == jnp.float32  # output head computes in f32
    assert np.isfinite(np.asarray(out)).all()
