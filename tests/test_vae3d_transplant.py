"""End-to-end voxel-VAE fidelity via torch weight transplant.

Oracle of VAE3DLarge (networks.py:2208-2490, rebuilt in transplant_utils.py):
residual conv encoder 32^3 -> 16^3 -> 8^3 -> 4^3 -> k4-valid -> 512, latent
heads, decoder fc -> 512x4^3 -> 3x(ConvT k4s2p1 + ResBlock) -> convs ->
sigmoid. Transplanted weights must reproduce encode() and decode() exactly
(validates conv/deconv padding alignment, ResBlock wiring, and the
channel-last layout end to end).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shapegen_tpu import models  # noqa: E402
from transplant_utils import VAE3DOracle, vae3d_trees  # noqa: E402

LATENT = 8


def test_vae3d_large_matches_torch_oracle(rng):
    oracle = VAE3DOracle(latent_dim=LATENT)
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.data = torch.tensor(
                rng.standard_normal(m.num_features).astype(np.float32) * 0.05
            )
            m.running_var.data = torch.tensor(
                rng.random(m.num_features).astype(np.float32) + 0.5
            )
    oracle.eval()

    x = rng.random((1, 32, 32, 32, 1)).astype(np.float32)
    z = rng.standard_normal((1, LATENT)).astype(np.float32)
    with torch.no_grad():
        mu_w, lv_w = oracle.encode(torch.tensor(x).permute(0, 4, 1, 2, 3))
        dec_w = oracle.decode(torch.tensor(z)).permute(0, 2, 3, 4, 1).numpy()

    model = models.VAE3DLarge(latent_dim=LATENT)
    rngk = jax.random.PRNGKey(0)
    variables = model.init(rngk, jnp.asarray(x), rngk, train=False)

    params, stats = vae3d_trees(oracle)
    assert set(params) == set(variables["params"])
    assert set(stats) == set(variables["batch_stats"])

    v = {"params": params, "batch_stats": stats}
    mu, lv = model.apply(v, jnp.asarray(x), train=False, method=model.encode)
    np.testing.assert_allclose(np.asarray(mu), mu_w.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv), lv_w.numpy(), rtol=1e-3, atol=1e-4)

    dec = model.apply(v, jnp.asarray(z), train=False, method=model.decode)
    # Torch decoder reshape is (C, D, H, W) channel-first; ours is
    # channel-last (D, H, W, C) — same learned function family but the fc
    # output ordering differs, so the fc kernel is transplanted permuted.
    np.testing.assert_allclose(np.asarray(dec), dec_w, rtol=1e-3, atol=1e-4)
