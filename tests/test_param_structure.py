"""Golden param-tree structure tests.

Checkpoint compatibility depends on flax module naming; a refactor that
renames/renumbers submodules silently orphans every existing checkpoint
(this bit us once: inlining TimeMLP renumbered all Dense layers). These
tests pin the top-level structure of the flagship models.
"""

import jax
import jax.numpy as jnp

from shapegen_tpu import models


def _top_keys(model, *args, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), *args, **kwargs)
    return sorted(variables["params"].keys())


def test_point_unet_large_param_structure():
    x = jnp.zeros((1, 16, 3))
    t = jnp.zeros((1,))
    keys = _top_keys(models.PointUNetLarge(dim=32, time_dim=32), x, t, train=False)
    assert keys == [
        "BatchNorm_0",
        "DenseBN_0",
        "DenseBN_1",
        "DenseBN_2",
        "DenseBN_3",
        "DenseBN_4",
        "Dense_0",  # refine4
        "Dense_1",  # refine3
        "Dense_2",  # refine2
        "Dense_3",  # refine1
        "Dense_4",  # g_proj (split global kernel)
        "Dense_5",  # dec4 rung-1 r-branch
        "Dense_6",  # output head
        "PointNetLayer_0",
        "PointNetLayer_1",
        "PointNetLayer_2",
        "PointNetLayer_3",
        "PointNetLayer_4",
        "PointNetLayer_5",
        "PointNetLayer_6",
        "TimeMLP_0",
    ], keys


def test_conditional_only_adds_embed():
    x = jnp.zeros((1, 16, 3))
    t = jnp.zeros((1,))
    un = models.PointUNetLarge(dim=32, time_dim=32)
    co = models.PointUNetLarge(dim=32, time_dim=32, num_classes=5)
    vu = un.init(jax.random.PRNGKey(0), x, t, train=False)
    vc = co.init(jax.random.PRNGKey(0), x, t, y=jnp.zeros((1,), jnp.int32),
                 train=False)
    # Same tree except TimeMLP gains an Embed_0 and the conditional-only
    # injection heads appear — four per-decoder-stage heads plus the
    # global-pathway head (explicitly named so the auto-numbered
    # unconditional modules keep their names).
    cond_only = {"cond_dec4", "cond_dec3", "cond_dec2", "cond_dec1",
                 "cond_global"}
    assert sorted(set(vc["params"].keys()) - cond_only) == sorted(
        vu["params"].keys()
    )
    assert cond_only <= set(vc["params"].keys())
    assert not (cond_only & set(vu["params"].keys()))
    assert "Embed_0" in vc["params"]["TimeMLP_0"]
    assert "Embed_0" not in vu["params"]["TimeMLP_0"]


def test_vae3d_large_param_structure():
    x = jnp.zeros((1, 32, 32, 32, 1))
    rng = jax.random.PRNGKey(0)
    variables = models.VAE3DLarge(latent_dim=16).init(rng, x, rng, train=False)
    keys = sorted(variables["params"].keys())
    assert "fc_mu" in keys and "fc_logvar" in keys
    assert "enc_in" in keys and "dec_out" in keys
    assert "decoder_input" in keys
