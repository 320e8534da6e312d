"""Numerical parity of core layers vs torch equivalents with shared weights.

These pin the fidelity traps called out in SURVEY.md §7 (BatchNorm train/eval
semantics being the main one): the flax channel-last formulations must equal
the reference's channel-first torch modules when given identical weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from shapegen_tpu.models.layers import DenseBN, DenseGN  # noqa: E402


def test_dense_bn_eval_matches_torch_conv1d_bn(rng):
    B, C_in, C_out, N = 4, 8, 16, 32
    x = rng.standard_normal((B, N, C_in)).astype(np.float32)

    tconv = torch.nn.Conv1d(C_in, C_out, 1)
    tbn = torch.nn.BatchNorm1d(C_out)
    tbn.running_mean.data = torch.tensor(
        rng.standard_normal(C_out).astype(np.float32)
    )
    tbn.running_var.data = torch.tensor(
        rng.random(C_out).astype(np.float32) + 0.5
    )
    tconv.eval()
    tbn.eval()
    with torch.no_grad():
        want = torch.relu(
            tbn(tconv(torch.tensor(x).transpose(1, 2)))
        ).transpose(1, 2).numpy()

    layer = DenseBN(C_out)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = {
        "Dense_0": {
            "kernel": jnp.asarray(
                tconv.weight.detach().numpy()[:, :, 0].T
            ),  # (O, I, 1) -> (I, O)
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        },
        "BatchNorm_0": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
    }
    batch_stats = {
        "BatchNorm_0": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        }
    }
    got = layer.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dense_bn_train_mode_matches_torch(rng):
    """Train mode: normalize with batch statistics (biased variance)."""
    B, C_in, C_out, N = 4, 8, 16, 32
    x = rng.standard_normal((B, N, C_in)).astype(np.float32)

    tconv = torch.nn.Conv1d(C_in, C_out, 1)
    tbn = torch.nn.BatchNorm1d(C_out)
    tconv.train()
    tbn.train()
    with torch.no_grad():
        want = torch.relu(
            tbn(tconv(torch.tensor(x).transpose(1, 2)))
        ).transpose(1, 2).numpy()

    layer = DenseBN(C_out)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = {
        "Dense_0": {
            "kernel": jnp.asarray(tconv.weight.detach().numpy()[:, :, 0].T),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        },
        "BatchNorm_0": variables["params"]["BatchNorm_0"],  # scale=1, bias=0
    }
    got, _ = layer.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_dense_gn_matches_torch_groupnorm(rng):
    B, C_in, C_out = 4, 16, 32
    x = rng.standard_normal((B, C_in)).astype(np.float32)

    tlin = torch.nn.Linear(C_in, C_out)
    tgn = torch.nn.GroupNorm(8, C_out)
    with torch.no_grad():
        want = torch.relu(tgn(tlin(torch.tensor(x)))).numpy()

    layer = DenseGN(C_out)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "Dense_0": {
            "kernel": jnp.asarray(tlin.weight.detach().numpy().T),
            "bias": jnp.asarray(tlin.bias.detach().numpy()),
        },
        "GroupNorm_0": variables["params"]["GroupNorm_0"],
    }
    got = layer.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv3d_matches_torch(rng):
    """flax channel-last Conv == torch Conv3d with transposed weights."""
    B, C_in, C_out, D = 2, 3, 5, 8
    x = rng.standard_normal((B, D, D, D, C_in)).astype(np.float32)

    tconv = torch.nn.Conv3d(C_in, C_out, 3, stride=1, padding=1)
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
        want = tconv(xt).permute(0, 2, 3, 4, 1).numpy()

    conv = nn.Conv(C_out, kernel_size=(3, 3, 3), padding=1)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch (O, I, kd, kh, kw) -> flax (kd, kh, kw, I, O)
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    got = conv.apply(
        {
            "params": {
                "kernel": jnp.asarray(kernel),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        },
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_strided_conv3d_padding1_matches_torch(rng):
    """The VAE3DLarge downsamplers: k4 s2 p1 halves the grid exactly like
    torch (we use explicit (1,1) padding, networks.py:2229)."""
    B, C_in, C_out, D = 1, 2, 4, 8
    x = rng.standard_normal((B, D, D, D, C_in)).astype(np.float32)

    tconv = torch.nn.Conv3d(C_in, C_out, 4, stride=2, padding=1)
    with torch.no_grad():
        want = (
            tconv(torch.tensor(x).permute(0, 4, 1, 2, 3))
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )

    conv = nn.Conv(C_out, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding=1)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    got = conv.apply(
        {
            "params": {
                "kernel": jnp.asarray(kernel),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        },
        jnp.asarray(x),
    )
    assert got.shape == want.shape == (1, 4, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_multihead_attention_matches_torch(rng):
    """SetAttentionBlock's core: flax MHA == torch MultiheadAttention with
    shared in/out projection weights."""
    B, N, C, H = 2, 16, 32, 4
    x = rng.standard_normal((B, N, C)).astype(np.float32)

    tattn = torch.nn.MultiheadAttention(C, H, batch_first=True)
    with torch.no_grad():
        want, _ = tattn(torch.tensor(x), torch.tensor(x), torch.tensor(x))
        want = want.numpy()

    mha = nn.MultiHeadDotProductAttention(num_heads=H, qkv_features=C)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x))

    w = tattn.in_proj_weight.detach().numpy()  # (3C, C)
    b = tattn.in_proj_bias.detach().numpy()
    wq, wk, wv = w[:C], w[C : 2 * C], w[2 * C :]
    bq, bk, bv = b[:C], b[C : 2 * C], b[2 * C :]
    wo = tattn.out_proj.weight.detach().numpy()
    bo = tattn.out_proj.bias.detach().numpy()

    def head_split(m):  # (C, C) torch y = x @ m.T -> flax kernel (C, H, C/H)
        return m.T.reshape(C, H, C // H)

    params = {
        "query": {"kernel": jnp.asarray(head_split(wq)),
                  "bias": jnp.asarray(bq.reshape(H, C // H))},
        "key": {"kernel": jnp.asarray(head_split(wk)),
                "bias": jnp.asarray(bk.reshape(H, C // H))},
        "value": {"kernel": jnp.asarray(head_split(wv)),
                  "bias": jnp.asarray(bv.reshape(H, C // H))},
        "out": {"kernel": jnp.asarray(wo.T.reshape(H, C // H, C)),
                "bias": jnp.asarray(bo)},
    }
    got = mha.apply({"params": params}, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
