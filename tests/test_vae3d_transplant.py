"""End-to-end voxel-VAE fidelity via torch weight transplant.

Oracle of VAE3DLarge (networks.py:2208-2490): residual conv encoder
32^3 -> 16^3 -> 8^3 -> 4^3 -> k4-valid -> 512, latent heads, decoder
fc -> 512x4^3 -> 3x(ConvT k4s2p1 + ResBlock) -> convs -> sigmoid.
Transplanted weights must reproduce encode() and decode() exactly
(validates conv/deconv padding alignment, ResBlock wiring, and the
channel-last layout end to end).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shapegen_tpu import models  # noqa: E402

LATENT = 8


class TorchRes3D(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = torch.nn.Conv3d(cin, cout, 3, padding=1)
        self.b1 = torch.nn.BatchNorm3d(cout)
        self.c2 = torch.nn.Conv3d(cout, cout, 3, padding=1)
        self.b2 = torch.nn.BatchNorm3d(cout)
        self.down = torch.nn.Conv3d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        r = self.down(x) if self.down is not None else x
        h = torch.relu(self.b1(self.c1(x)))
        h = self.b2(self.c2(h))
        return torch.relu(h + r)


class TorchVAEOracle(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.enc_in = torch.nn.Conv3d(1, 32, 3, padding=1)
        self.res1 = TorchRes3D(32, 64)
        self.down1 = torch.nn.Conv3d(64, 64, 4, stride=2, padding=1)
        self.res2 = TorchRes3D(64, 128)
        self.down2 = torch.nn.Conv3d(128, 128, 4, stride=2, padding=1)
        self.res3 = TorchRes3D(128, 256)
        self.down3 = torch.nn.Conv3d(256, 256, 4, stride=2, padding=1)
        self.res4 = TorchRes3D(256, 512)
        self.enc_final = torch.nn.Conv3d(512, 512, 4)
        self.fc_mu = torch.nn.Linear(512, LATENT)
        self.fc_logvar = torch.nn.Linear(512, LATENT)
        self.dec_in = torch.nn.Linear(LATENT, 512 * 64)
        self.up1 = torch.nn.ConvTranspose3d(512, 256, 4, stride=2, padding=1)
        self.dres1 = TorchRes3D(256, 256)
        self.up2 = torch.nn.ConvTranspose3d(256, 128, 4, stride=2, padding=1)
        self.dres2 = TorchRes3D(128, 128)
        self.up3 = torch.nn.ConvTranspose3d(128, 64, 4, stride=2, padding=1)
        self.dres3 = TorchRes3D(64, 64)
        self.dec_conv = torch.nn.Conv3d(64, 32, 3, padding=1)
        self.dres4 = TorchRes3D(32, 32)
        self.dec_out = torch.nn.Conv3d(32, 1, 3, padding=1)

    def encode(self, x):
        h = torch.relu(self.enc_in(x))
        h = self.res1(h)
        h = torch.relu(self.down1(h))
        h = self.res2(h)
        h = torch.relu(self.down2(h))
        h = self.res3(h)
        h = torch.relu(self.down3(h))
        h = self.res4(h)
        h = torch.relu(self.enc_final(h)).flatten(1)
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z):
        h = self.dec_in(z).reshape(-1, 512, 4, 4, 4)
        h = self.dres1(torch.relu(self.up1(h)))
        h = self.dres2(torch.relu(self.up2(h)))
        h = self.dres3(torch.relu(self.up3(h)))
        h = self.dres4(torch.relu(self.dec_conv(h)))
        return torch.sigmoid(self.dec_out(h))


def _conv(c):
    return {
        "kernel": jnp.asarray(c.weight.detach().numpy().transpose(2, 3, 4, 1, 0)),
        "bias": jnp.asarray(c.bias.detach().numpy()),
    }


def _deconv(c):
    # flax ConvTranspose(transpose_kernel=False): torch (I, O, k...) ->
    # (k..., I, O) with spatial flip (verified mapping).
    w = c.weight.detach().numpy().transpose(2, 3, 4, 0, 1)
    w = w[::-1, ::-1, ::-1].copy()
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(c.bias.detach().numpy())}


def _lin(l):
    return {
        "kernel": jnp.asarray(l.weight.detach().numpy().T),
        "bias": jnp.asarray(l.bias.detach().numpy()),
    }


def _bn(b):
    return (
        {"scale": jnp.asarray(b.weight.detach().numpy()),
         "bias": jnp.asarray(b.bias.detach().numpy())},
        {"mean": jnp.asarray(b.running_mean.numpy()),
         "var": jnp.asarray(b.running_var.numpy())},
    )


def _res(block):
    p_b1, s_b1 = _bn(block.b1)
    p_b2, s_b2 = _bn(block.b2)
    params = {
        "Conv_0": _conv(block.c1), "BatchNorm_0": p_b1,
        "Conv_1": _conv(block.c2), "BatchNorm_1": p_b2,
    }
    if block.down is not None:
        params["Conv_2"] = _conv(block.down)
    stats = {"BatchNorm_0": s_b1, "BatchNorm_1": s_b2}
    return params, stats


def test_vae3d_large_matches_torch_oracle(rng):
    oracle = TorchVAEOracle()
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

    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    params["enc_in"] = _conv(oracle.enc_in)
    params["enc_down1"] = _conv(oracle.down1)
    params["enc_down2"] = _conv(oracle.down2)
    params["enc_down3"] = _conv(oracle.down3)
    params["enc_final"] = _conv(oracle.enc_final)
    params["fc_mu"] = _lin(oracle.fc_mu)
    params["fc_logvar"] = _lin(oracle.fc_logvar)
    # decoder_input: torch reshapes its output channel-FIRST (512, 4, 4, 4),
    # ours channel-LAST (4, 4, 4, 512) — permute the fc output columns so the
    # same flat weights land on the same (c, d, h, w) cells.
    perm = np.empty(512 * 64, np.int64)
    for d in range(4):
        for h in range(4):
            for w in range(4):
                for c in range(512):
                    flax_idx = ((d * 4 + h) * 4 + w) * 512 + c
                    torch_idx = c * 64 + d * 16 + h * 4 + w
                    perm[flax_idx] = torch_idx
    di = _lin(oracle.dec_in)
    params["decoder_input"] = {
        "kernel": di["kernel"][:, perm], "bias": di["bias"][perm]
    }
    params["dec_up1"] = _deconv(oracle.up1)
    params["dec_up2"] = _deconv(oracle.up2)
    params["dec_up3"] = _deconv(oracle.up3)
    params["dec_conv"] = _conv(oracle.dec_conv)
    params["dec_out"] = _conv(oracle.dec_out)
    for name, block in [
        ("enc_res1", oracle.res1), ("enc_res2", oracle.res2),
        ("enc_res3", oracle.res3), ("enc_res4", oracle.res4),
        ("dec_res1", oracle.dres1), ("dec_res2", oracle.dres2),
        ("dec_res3", oracle.dres3), ("dec_res4", oracle.dres4),
    ]:
        p, s = _res(block)
        params[name] = p
        stats[name] = s

    v = {"params": params, "batch_stats": stats}
    mu, lv = model.apply(v, jnp.asarray(x), train=False, method=model.encode)
    np.testing.assert_allclose(np.asarray(mu), mu_w.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv), lv_w.numpy(), rtol=1e-3, atol=1e-4)

    dec = model.apply(v, jnp.asarray(z), train=False, method=model.decode)
    # Torch decoder reshape is (C, D, H, W) channel-first; ours is
    # channel-last (D, H, W, C) — same learned function family but the fc
    # output ordering differs, so transplant the fc kernel permuted.
    np.testing.assert_allclose(np.asarray(dec), dec_w, rtol=1e-3, atol=1e-4)
