"""Reference-checkpoint importer tests (shapegen_tpu/train/torch_import.py).

Each test builds a torch module whose attribute layout matches the
REFERENCE's true module tree (networks.py / diffusion.py — nn.Sequential
containers and all, so state_dict keys are the real ones, e.g.
``model.time_mlp.0.weight``), fakes a Lightning .ckpt around its
state_dict, runs the importer, and checks the restored flax model
reproduces the torch forward.

Coverage by source architecture:
  * PointCloudDiffusion/UNetPointNetLarge — full forward parity via
    factory.load_task_checkpoint (the flagship path).
  * LatentDiffusion — denoiser forward parity + embedded-VAE split-out.
  * SimplePointNetVAE — encode/decode parity.
  * VAE3DLarge — full forward parity (reuses VAE3DOracle with its
    state_dict re-keyed to the reference Sequential layout).
  * PointNetVAE / VAE3D — import-structure validation only (the importer
    refuses to write a checkpoint whose trees don't match the flax model
    leaf-for-leaf, so a mapping error fails loudly); their layer
    primitives' numerics are covered by the transplant tests.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from transplant_utils import VAE3DOracle  # noqa: E402

from shapegen_tpu import models  # noqa: E402
from shapegen_tpu.train import factory, torch_import  # noqa: E402

nn = torch.nn


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            m.running_mean.data = torch.tensor(
                rng.standard_normal(m.num_features).astype(np.float32) * 0.1
            )
            m.running_var.data = torch.tensor(
                rng.random(m.num_features).astype(np.float32) + 0.5
            )


def _fake_lightning_ckpt(tmp_path, state_dict, hparams, epoch=7, name="ref.ckpt"):
    path = str(tmp_path / name)
    torch.save(
        {
            "state_dict": state_dict,
            "hyper_parameters": hparams,
            "epoch": epoch,
            "global_step": 123,
        },
        path,
    )
    return path


# ---------------------------------------------------------------------------
# Reference-keyed torch modules (attribute names == networks.py's)
# ---------------------------------------------------------------------------


class RefPointNetLayer(nn.Module):
    """networks.py:16-49 layout: conv1/bn1/conv2/bn2/conv3/bn3."""

    def __init__(self, in_dim, mid_dim, out_dim=None):
        super().__init__()
        out_dim = mid_dim if out_dim is None else out_dim
        self.conv1 = nn.Conv1d(in_dim, mid_dim, 1)
        self.bn1 = nn.BatchNorm1d(mid_dim)
        self.conv2 = nn.Conv1d(mid_dim, mid_dim, 1)
        self.bn2 = nn.BatchNorm1d(mid_dim)
        self.conv3 = nn.Conv1d(mid_dim, out_dim, 1)
        self.bn3 = nn.BatchNorm1d(out_dim)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        return torch.relu(self.bn3(self.conv3(x)))


def _t_embed(t, time_dim):
    half = time_dim // 2
    freqs = torch.exp(
        torch.arange(half, dtype=torch.float32)
        * -(math.log(10000.0) / (half - 1))
    )
    args = t[:, None] * freqs[None]
    return torch.cat([torch.sin(args), torch.cos(args)], dim=-1)


class RefUNetPointNetLarge(nn.Module):
    """networks.py:724-838 layout: time_mlp/global_feat/output Sequentials,
    enc1-4/dec4-1 PointNetLayers, refine1-4 Conv1ds."""

    def __init__(self, dim=32, time_dim=32):
        super().__init__()
        self.time_dim = time_dim
        self.time_mlp = nn.Sequential(
            nn.Linear(time_dim, dim), nn.SiLU(), nn.Linear(dim, dim)
        )
        self.enc1 = RefPointNetLayer(3 + time_dim, 64, 128)
        self.enc2 = RefPointNetLayer(128, 128, 256)
        self.enc3 = RefPointNetLayer(256, 256, 512)
        self.enc4 = RefPointNetLayer(512, 512, 1024)
        self.global_feat = nn.Sequential(
            nn.Conv1d(1024, 2048, 1), nn.BatchNorm1d(2048), nn.ReLU(),
            nn.Conv1d(2048, 4096, 1), nn.BatchNorm1d(4096), nn.ReLU(),
        )
        self.dec4 = RefPointNetLayer(4096 + 1024, 1024, 512)
        self.dec3 = RefPointNetLayer(512 + 512, 512, 256)
        self.dec2 = RefPointNetLayer(256 + 256, 256, 128)
        self.dec1 = RefPointNetLayer(128 + 128, 128, 64)
        self.output = nn.Sequential(
            nn.Conv1d(64, 64, 1), nn.BatchNorm1d(64), nn.ReLU(),
            nn.Conv1d(64, 3, 1),
        )
        self.refine1 = nn.Conv1d(128, 128, 1)
        self.refine2 = nn.Conv1d(256, 256, 1)
        self.refine3 = nn.Conv1d(512, 512, 1)
        self.refine4 = nn.Conv1d(1024, 1024, 1)

    def forward(self, x, t):
        t_emb = self.time_mlp(_t_embed(t, self.time_dim))
        x = x.transpose(2, 1)
        t_emb = t_emb.unsqueeze(2).expand(-1, -1, x.shape[2])
        x = torch.cat([x, t_emb], dim=1)
        x1 = self.enc1(x)
        x2 = self.enc2(x1)
        x3 = self.enc3(x2)
        x4 = self.enc4(x3)
        g = self.global_feat(x4)
        g = torch.max(g, 2, keepdim=True)[0].repeat(1, 1, x.shape[2])
        h = self.dec4(torch.cat([g, self.refine4(x4)], dim=1))
        h = self.dec3(torch.cat([h, self.refine3(x3)], dim=1))
        h = self.dec2(torch.cat([h, self.refine2(x2)], dim=1))
        h = self.dec1(torch.cat([h, self.refine1(x1)], dim=1))
        return self.output(h).transpose(2, 1)


class RefSimpleLatentUNet(nn.Module):
    """networks.py:962-1106 layout (Sequential rungs, refine Linears)."""

    def __init__(self, latent_dim=16, dim=32, time_dim=16):
        super().__init__()
        self.time_dim = time_dim

        def rung(cin, cout, extra=()):
            return nn.Sequential(
                nn.Linear(cin, cout), nn.GroupNorm(8, cout), nn.ReLU(), *extra
            )

        self.time_mlp = nn.Sequential(
            nn.Linear(time_dim, time_dim), nn.SiLU(),
            nn.Linear(time_dim, time_dim),
        )
        self.enc1 = rung(latent_dim + time_dim, dim // 4)
        self.enc2 = rung(dim // 4, dim // 2)
        self.enc3 = rung(dim // 2, dim)
        self.enc4 = rung(dim, dim * 2)
        self.global_feat = nn.Sequential(
            nn.Linear(dim * 2, dim * 4), nn.GroupNorm(8, dim * 4), nn.ReLU(),
            nn.Linear(dim * 4, dim * 8), nn.GroupNorm(8, dim * 8), nn.ReLU(),
        )
        self.dec4 = rung(dim * 8 + dim * 2, dim * 2)
        self.dec3 = rung(dim * 2 + dim, dim)
        self.dec2 = rung(dim + dim // 2, dim // 2)
        self.dec1 = rung(dim // 2 + dim // 4, dim // 4, extra=(nn.Dropout(0.1),))
        self.output = nn.Sequential(
            nn.Linear(dim // 4, dim // 4), nn.ReLU(),
            nn.Linear(dim // 4, latent_dim),
        )
        self.refine1 = nn.Linear(dim // 4, dim // 4)
        self.refine2 = nn.Linear(dim // 2, dim // 2)
        self.refine3 = nn.Linear(dim, dim)
        self.refine4 = nn.Linear(dim * 2, dim * 2)

    def forward(self, z, t):
        t_emb = self.time_mlp(_t_embed(t, self.time_dim))
        h = torch.cat([z, t_emb], dim=1)
        z1 = self.enc1(h)
        z2 = self.enc2(z1)
        z3 = self.enc3(z2)
        z4 = self.enc4(z3)
        g = self.global_feat(z4)
        h = self.dec4(torch.cat([g, self.refine4(z4)], dim=1))
        h = self.dec3(torch.cat([h, self.refine3(z3)], dim=1))
        h = self.dec2(torch.cat([h, self.refine2(z2)], dim=1))
        h = self.dec1(torch.cat([h, self.refine1(z1)], dim=1))
        return self.output(h)


class RefSimplePointNetVAE(nn.Module):
    """networks.py:1110-1410 layout (encoder/decoder/output_layer)."""

    def __init__(self, num_points=64, latent_dim=16, hidden_dim=512):
        super().__init__()
        self.num_points = num_points
        self.encoder = nn.Sequential(
            RefPointNetLayer(3, 64),
            RefPointNetLayer(64, 128),
            RefPointNetLayer(128, 256),
            RefPointNetLayer(256, hidden_dim),
            nn.AdaptiveMaxPool1d(1),
            nn.Flatten(),
            nn.Linear(hidden_dim, hidden_dim // 2),
            nn.ReLU(),
        )
        self.fc_mu = nn.Linear(hidden_dim // 2, latent_dim)
        self.fc_logvar = nn.Linear(hidden_dim // 2, latent_dim)
        self.decoder = nn.Sequential(
            nn.Linear(latent_dim, hidden_dim // 2), nn.ReLU(),
            nn.Linear(hidden_dim // 2, hidden_dim), nn.ReLU(),
            nn.Linear(hidden_dim, num_points * 3), nn.ReLU(),
            nn.Dropout(0.1),
        )
        self.output_layer = nn.Linear(num_points * 3, num_points * 3)

    def encode(self, x):
        h = self.encoder(x.transpose(2, 1))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z):
        return self.output_layer(self.decoder(z)).view(-1, self.num_points, 3)


def _ref_vae3d_state_dict(rng):
    """A reference-keyed VAE3D state_dict (networks.py:1984-2022 layout) with
    random weights; used for structure-level import validation."""
    def conv3d_keys(prefix, cin, cout):
        return {
            f"{prefix}.conv.weight": rng.standard_normal(
                (cout, cin, 3, 3, 3)).astype(np.float32) * 0.05,
            f"{prefix}.conv.bias": np.zeros(cout, np.float32),
            f"{prefix}.bn.weight": np.ones(cout, np.float32),
            f"{prefix}.bn.bias": np.zeros(cout, np.float32),
            f"{prefix}.bn.running_mean": np.zeros(cout, np.float32),
            f"{prefix}.bn.running_var": np.ones(cout, np.float32),
        }

    def deconv3d_keys(prefix, cin, cout, with_bn=True):
        d = {
            f"{prefix}.deconv.weight" if with_bn else f"{prefix}.weight":
                rng.standard_normal((cin, cout, 3, 3, 3)).astype(np.float32) * 0.05,
            f"{prefix}.deconv.bias" if with_bn else f"{prefix}.bias":
                np.zeros(cout, np.float32),
        }
        if with_bn:
            d.update({
                f"{prefix}.bn.weight": np.ones(cout, np.float32),
                f"{prefix}.bn.bias": np.zeros(cout, np.float32),
                f"{prefix}.bn.running_mean": np.zeros(cout, np.float32),
                f"{prefix}.bn.running_var": np.ones(cout, np.float32),
            })
        return d

    def linear_keys(prefix, cin, cout):
        return {
            f"{prefix}.weight": rng.standard_normal(
                (cout, cin)).astype(np.float32) * 0.05,
            f"{prefix}.bias": np.zeros(cout, np.float32),
        }

    latent = 16
    sd = {}
    for i, (cin, cout) in enumerate([(1, 32), (32, 64), (64, 128), (128, 256)]):
        sd.update(conv3d_keys(f"encoder.{i}", cin, cout))
    sd.update(linear_keys("encoder.5", 256 * 8, 512))
    sd.update(linear_keys("fc_mu", 512, latent))
    sd.update(linear_keys("fc_logvar", 512, latent))
    sd.update(linear_keys("decoder_input", latent, 256 * 8))
    for i, (cin, cout) in enumerate([(256, 128), (128, 64), (64, 32)]):
        sd.update(deconv3d_keys(f"decoder.{i}", cin, cout))
    sd.update(deconv3d_keys("decoder.3", 32, 1, with_bn=False))
    return sd, latent


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_point_diffusion_ckpt_import_end_to_end(tmp_path, rng):
    src = RefUNetPointNetLarge(dim=32, time_dim=32)
    _randomize_bn(src, rng)
    src.eval()

    # Lightning wraps the network as self.model (diffusion.py:28).
    ckpt = _fake_lightning_ckpt(
        tmp_path,
        {f"model.{k}": v for k, v in src.state_dict().items()},
        {"num_points": 64, "dim": 32, "time_dim": 32, "lr": 2e-4,
         "noise_schedule": "cosine"},
    )

    out = str(tmp_path / "imported.ckpt")
    written = torch_import.import_lightning_checkpoint(ckpt, out)
    assert written == {"main": out}

    task, state, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["task"] == "point_diffusion"
    assert meta["hparams"]["num_points"] == 64
    assert meta["hparams"]["lr"] == 2e-4
    assert meta["epoch"] == 7
    assert meta["extra"]["imported_from"] == ckpt

    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    t = np.array([0.2, 0.7], np.float32)
    with torch.no_grad():
        want = src(torch.tensor(x), torch.tensor(t)).numpy()
    got = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), jnp.asarray(t), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_imported_checkpoint_exports_to_serving(tmp_path, rng):
    """The full migration loop: a reference Lightning .ckpt imports, loads
    through factory, and exports to the AOT StableHLO serving artifact —
    which reproduces the live sampler from the imported weights exactly."""
    from shapegen_tpu import serving

    src = RefUNetPointNetLarge(dim=32, time_dim=32)
    _randomize_bn(src, rng)
    src.eval()
    ckpt = _fake_lightning_ckpt(
        tmp_path,
        {f"model.{k}": v for k, v in src.state_dict().items()},
        {"num_points": 64, "dim": 32, "time_dim": 32, "lr": 2e-4,
         "noise_schedule": "cosine"},
    )
    out = str(tmp_path / "serve_imported.ckpt")
    torch_import.import_lightning_checkpoint(ckpt, out)
    task, state, _ = factory.load_task_checkpoint(out)

    blob = serving.export_sampler(
        task, state, num_samples=2, num_points=16, num_steps=5
    )
    run = serving.load_sampler(blob)
    out = np.asarray(run(serving.key_data(24)))
    assert out.shape == (2, 16, 3) and np.isfinite(out).all()
    # Matches the live sampler from the imported state up to
    # compilation-order float noise (same bound as test_serving.py).
    live = task.sample(state, jax.random.PRNGKey(24), 2, 16, num_steps=5)
    np.testing.assert_allclose(out, np.asarray(live), rtol=1e-4, atol=1e-4)


def test_latent_diffusion_ckpt_import_splits_vae(tmp_path, rng):
    denoiser = RefSimpleLatentUNet(latent_dim=16, dim=32, time_dim=16)
    denoiser.eval()
    vae_sd, latent = _ref_vae3d_state_dict(rng)

    sd = {f"model.{k}": v for k, v in denoiser.state_dict().items()}
    sd.update({f"vae.{k}": torch.tensor(v) for k, v in vae_sd.items()})
    ckpt = _fake_lightning_ckpt(
        tmp_path, sd,
        {"latent_dim": 16, "dim": 32, "time_dim": 16, "lr": 1e-4,
         "noise_schedule": "cosine", "is_voxel_based": True},
        epoch=3, name="ldm.ckpt",
    )

    out = str(tmp_path / "ldm_imported.ckpt")
    vae_out = str(tmp_path / "vae_imported.ckpt")
    with pytest.raises(ValueError, match="vae_out_path"):
        torch_import.import_lightning_checkpoint(ckpt, out)
    written = torch_import.import_lightning_checkpoint(
        ckpt, out, vae_out_path=vae_out
    )
    assert set(written) == {"main", "vae"}

    # The split-out VAE restores standalone.
    vae_task, vae_state, vae_meta = factory.load_task_checkpoint(vae_out)
    assert vae_meta["hparams"]["task"] == "vae3d"
    assert vae_meta["hparams"]["latent_dim"] == latent

    # The LDM restores with the VAE injected (factory parity with
    # diffusion.py:375 ignore=['vae']).
    task, state, meta = factory.load_task_checkpoint(
        out,
        vae_model=vae_task.model,
        vae_variables={"params": vae_state.params,
                       "batch_stats": vae_state.batch_stats},
    )
    assert meta["hparams"]["task"] == "latent_diffusion"

    z = rng.standard_normal((4, 16)).astype(np.float32)
    t = np.array([0.1, 0.4, 0.6, 0.9], np.float32)
    with torch.no_grad():
        want = denoiser(torch.tensor(z), torch.tensor(t)).numpy()
    got = task.model.apply(
        {"params": state.params}, jnp.asarray(z), jnp.asarray(t), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_simple_pointnet_vae_ckpt_import(tmp_path, rng):
    src = RefSimplePointNetVAE(num_points=64, latent_dim=16)
    _randomize_bn(src, rng)
    src.eval()

    ckpt = _fake_lightning_ckpt(
        tmp_path, src.state_dict(),
        {"num_points": 64, "latent_dim": 16, "lr": 1e-4, "beta": 1e-1},
        epoch=2, name="spvae.ckpt",
    )
    out = str(tmp_path / "spvae_imported.ckpt")
    torch_import.import_lightning_checkpoint(ckpt, out)

    task, state, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["task"] == "simple_pointnet_vae"
    assert meta["hparams"]["num_points"] == 64

    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want_mu, want_logvar = src.encode(torch.tensor(x))
    got_mu, got_logvar = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False, method="encode",
    )
    np.testing.assert_allclose(np.asarray(got_mu), want_mu.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logvar), want_logvar.numpy(),
                               rtol=1e-3, atol=1e-5)

    z = rng.standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        want_dec = src.decode(torch.tensor(z)).numpy()
    got_dec = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(z), train=False, method="decode",
    )
    np.testing.assert_allclose(np.asarray(got_dec), want_dec,
                               rtol=1e-3, atol=1e-5)


def test_vae3d_large_ckpt_import_forward_parity(tmp_path, rng):
    """VAE3DOracle (proven by test_vae3d_transplant) re-keyed to the
    reference's Sequential state_dict layout (networks.py:2226-2266)."""
    oracle = VAE3DOracle(latent_dim=8)
    _randomize_bn(oracle, rng)
    oracle.eval()

    attr_to_ref = {
        "enc_in": "encoder.0", "res1": "encoder.2", "down1": "encoder.3",
        "res2": "encoder.5", "down2": "encoder.6", "res3": "encoder.8",
        "down3": "encoder.9", "res4": "encoder.11", "enc_final": "encoder.12",
        "fc_mu": "fc_mu", "fc_logvar": "fc_logvar", "dec_in": "decoder_input",
        "up1": "decoder.0", "dres1": "decoder.2", "up2": "decoder.3",
        "dres2": "decoder.5", "up3": "decoder.6", "dres3": "decoder.8",
        "dec_conv": "decoder.9", "dres4": "decoder.11", "dec_out": "decoder.12",
    }
    res_attr = {"c1": "conv1", "b1": "bn1", "c2": "conv2", "b2": "bn2",
                "down": "downsample"}
    sd = {}
    for k, v in oracle.state_dict().items():
        parts = k.split(".")
        head = attr_to_ref[parts[0]]
        if len(parts) == 3:  # residual block leaf: res1.c1.weight
            head = f"{head}.{res_attr[parts[1]]}"
        sd[f"{head}.{parts[-1]}"] = v

    ckpt = _fake_lightning_ckpt(
        tmp_path, sd, {"latent_dim": 8, "lr": 1e-4, "kl_warmup_epochs": 10,
                       "kl_warmup_max_beta": 0.1, "kl_annealing_epochs": 100},
        epoch=5, name="vae3dlarge.ckpt",
    )
    out = str(tmp_path / "vae3dlarge_imported.ckpt")
    torch_import.import_lightning_checkpoint(ckpt, out)

    task, state, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["task"] == "vae3d_large"

    x = (rng.random((2, 32, 32, 32)) > 0.7).astype(np.float32)
    with torch.no_grad():
        mu_w, logvar_w = oracle.encode(torch.tensor(x[:, None]))
        dec_w = oracle.decode(torch.tensor(mu_w)).numpy()[:, 0]
    mu_g, logvar_g = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x[..., None]), train=False, method="encode",
    )
    np.testing.assert_allclose(np.asarray(mu_g), mu_w.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_g), logvar_w.numpy(),
                               rtol=1e-3, atol=1e-4)
    dec_g = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(mu_w.numpy()), train=False, method="decode",
    )
    np.testing.assert_allclose(np.asarray(dec_g)[..., 0], dec_w,
                               rtol=1e-3, atol=1e-4)


def test_vae3d_import_structure_validated(tmp_path, rng):
    """VAE3D import round-trips through the structure validator and
    restores into a decodable task."""
    vae_sd, latent = _ref_vae3d_state_dict(rng)
    ckpt = _fake_lightning_ckpt(
        tmp_path, {k: torch.tensor(v) for k, v in vae_sd.items()},
        {"latent_dim": latent, "beta": 1e-1}, name="vae3d.ckpt",
    )
    out = str(tmp_path / "vae3d_imported.ckpt")
    torch_import.import_lightning_checkpoint(ckpt, out)
    task, state, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["task"] == "vae3d"
    dec = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.zeros((1, latent)), train=False, method="decode",
    )
    assert dec.shape == (1, 32, 32, 32, 1)


def test_pointnet_vae_import_structure_validated(tmp_path, rng):
    """PointNetVAE (PointNet++ + Folding) import passes the leaf-for-leaf
    structure check against models.PointNetVAE and restores."""
    def conv2d(prefix, cin, cout):
        return {
            f"{prefix}.weight": rng.standard_normal(
                (cout, cin, 1, 1)).astype(np.float32) * 0.05,
            f"{prefix}.bias": np.zeros(cout, np.float32),
        }

    def conv1d(prefix, cin, cout):
        return {
            f"{prefix}.weight": rng.standard_normal(
                (cout, cin, 1)).astype(np.float32) * 0.05,
            f"{prefix}.bias": np.zeros(cout, np.float32),
        }

    def bn(prefix, c):
        return {
            f"{prefix}.weight": np.ones(c, np.float32),
            f"{prefix}.bias": np.zeros(c, np.float32),
            f"{prefix}.running_mean": np.zeros(c, np.float32),
            f"{prefix}.running_var": np.ones(c, np.float32),
        }

    def linear(prefix, cin, cout):
        return {
            f"{prefix}.weight": rng.standard_normal(
                (cout, cin)).astype(np.float32) * 0.05,
            f"{prefix}.bias": np.zeros(cout, np.float32),
        }

    latent, num_points = 16, 64
    sd = {}
    # networks.py:1413-1415: sa mlps [64,64,128], [128,128,256], [256,512,1024]
    # with +3 xyz channels on every non-first SA input (networks.py:200).
    sa_specs = {
        "sa1": (3 + 3, [64, 64, 128]),
        "sa2": (128 + 3, [128, 128, 256]),
        "sa3": (256 + 3, [256, 512, 1024]),
    }
    for sa, (cin, mlp) in sa_specs.items():
        last = cin
        for i, cout in enumerate(mlp):
            sd.update(conv2d(f"encoder.{sa}.mlp_convs.{i}", last, cout))
            sd.update(bn(f"encoder.{sa}.mlp_bns.{i}", cout))
            last = cout
    sd.update(linear("encoder.fc1", 1024, 512))
    sd.update(bn("encoder.bn1", 512))
    sd.update(linear("encoder.fc_mu", 512, latent))
    sd.update(linear("encoder.fc_logvar", 512, latent))
    for fold, cin0 in (("fold1", latent + 2), ("fold2", latent + 3)):
        last = cin0
        for i, cout in enumerate([512, 512, 3]):
            sd.update(conv1d(f"decoder.{fold}.{i}.layer.0", last, cout))
            sd.update(conv1d(f"decoder.{fold}.{i}.layer.2", cout, cout))
            last = cout
    sd.update(linear("decoder.upsample", 1024, num_points))

    ckpt = _fake_lightning_ckpt(
        tmp_path, {k: torch.tensor(v) for k, v in sd.items()},
        {"num_points": num_points, "latent_dim": latent, "lr": 1e-4,
         "beta": 1e-1},
        name="pnvae.ckpt",
    )
    out = str(tmp_path / "pnvae_imported.ckpt")
    torch_import.import_lightning_checkpoint(ckpt, out)
    task, state, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["task"] == "pointnet_vae"
    assert meta["hparams"]["num_points"] == num_points
    dec = task.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.zeros((1, latent)), train=False, method="decode",
    )
    assert dec.shape == (1, num_points, 3)


def test_import_rejects_unknown_and_experimental(tmp_path, rng):
    with pytest.raises(ValueError, match="unrecognized checkpoint"):
        torch_import.detect_architecture({"foo.weight": np.zeros(1)})
    with pytest.raises(ValueError, match="Experimental"):
        torch_import.detect_architecture(
            {"sa1.mlp_convs.0.weight": np.zeros((32, 6, 1, 1))}
        )


def test_adam_moments_import_true_resume(tmp_path, rng):
    """optimizer_states in the Lightning ckpt carry into the optax state:
    mu/nu get the SAME layout transforms as the weights, count/step resume,
    and the live (possibly plateau-halved) lr lands in the injected
    hyperparams."""
    src = RefSimplePointNetVAE(num_points=32, latent_dim=8)
    _randomize_bn(src, rng)
    opt = torch.optim.Adam(src.parameters(), lr=1e-4)
    x = torch.tensor(rng.standard_normal((4, 32, 3)).astype(np.float32))
    src.train()
    for _ in range(3):
        opt.zero_grad()
        mu, logvar = src.encode(x)
        out = src.decode(mu)
        (out.abs().mean() + mu.square().mean() + logvar.abs().mean()).backward()
        opt.step()
    # Simulate a ReduceLROnPlateau halving so the live lr differs from hparams.
    opt.param_groups[0]["lr"] = 5e-5
    src.eval()

    path = str(tmp_path / "resume.ckpt")
    torch.save(
        {
            "state_dict": src.state_dict(),
            "hyper_parameters": {"num_points": 32, "latent_dim": 8,
                                 "lr": 1e-4, "beta": 1e-1},
            "epoch": 9,
            "global_step": 3,
            "optimizer_states": [opt.state_dict()],
        },
        path,
    )
    out_dir = str(tmp_path / "resume_imported.ckpt")
    torch_import.import_lightning_checkpoint(path, out_dir)

    task, state, meta = factory.load_task_checkpoint(out_dir)
    assert meta["extra"]["note"].startswith("weights+BN stats+Adam")
    assert int(state.step) == 3

    adam_state = next(
        s for s in state.opt_state.inner_state
        if hasattr(s, "mu") and hasattr(s, "nu")
    )
    assert int(adam_state.count) == 3
    lr = float(state.opt_state.hyperparams["learning_rate"])
    assert lr == pytest.approx(5e-5)

    # Spot-check the layout transform on the moments: fc_mu is a plain
    # Linear, so its exp_avg transposes exactly like the weight.
    sd_params = [k for k, _ in src.named_parameters()]
    idx = sd_params.index("fc_mu.weight")
    want_mu = opt.state_dict()["state"][idx]["exp_avg"].numpy().T
    np.testing.assert_allclose(
        np.asarray(adam_state.mu["fc_mu"]["kernel"]), want_mu, rtol=1e-6
    )
    want_nu = opt.state_dict()["state"][idx]["exp_avg_sq"].numpy().T
    np.testing.assert_allclose(
        np.asarray(adam_state.nu["fc_mu"]["kernel"]), want_nu, rtol=1e-6
    )
    # A PointNetLayer conv moment lands under the re-designed tree with the
    # Conv1d(k1)->Dense squeeze+transpose.
    idx_c = sd_params.index("encoder.2.conv3.weight")
    want_c = opt.state_dict()["state"][idx_c]["exp_avg"].numpy()[:, :, 0].T
    np.testing.assert_allclose(
        np.asarray(adam_state.mu["enc3"]["DenseBN_2"]["Dense_0"]["kernel"]),
        want_c, rtol=1e-6,
    )

    # --no-optimizer path: fresh moments, step 0.
    out_dir2 = str(tmp_path / "fresh_imported.ckpt")
    torch_import.import_lightning_checkpoint(path, out_dir2,
                                             import_optimizer=False)
    _, state2, meta2 = factory.load_task_checkpoint(out_dir2)
    assert "optimizer state fresh" in meta2["extra"]["note"]
    assert int(state2.step) == 0
    adam2 = next(
        s for s in state2.opt_state.inner_state
        if hasattr(s, "mu") and hasattr(s, "nu")
    )
    assert float(jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()), adam2.mu, 0.0)) == 0.0


def test_scheduler_state_carries_into_sidecar(tmp_path, rng):
    """Lightning's lr_schedulers entry lands in the sidecar's
    extra['scheduler'], so Trainer.fit(resume_from=imported) rebuilds the
    LIVE controller — without it the imported LR snaps back to base at the
    first epoch end (trainer.py builds a fresh scheduler from hparams)."""
    src = RefSimplePointNetVAE(num_points=32, latent_dim=8)
    src.eval()
    opt = torch.optim.Adam(src.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=40, eta_min=1e-6
    )
    for _ in range(4):  # mid-schedule: lr has decayed from base
        opt.step()
        sched.step()
    live_lr = opt.param_groups[0]["lr"]
    assert live_lr < 1e-3

    path = str(tmp_path / "sched.ckpt")
    torch.save(
        {
            "state_dict": src.state_dict(),
            "hyper_parameters": {"num_points": 32, "latent_dim": 8,
                                 "lr": 1e-3, "beta": 1e-1},
            "epoch": 3,
            "global_step": 4,
            "optimizer_states": [opt.state_dict()],
            "lr_schedulers": [sched.state_dict()],
        },
        path,
    )
    out = str(tmp_path / "sched_imported.ckpt")
    torch_import.import_lightning_checkpoint(path, out)

    task, state, meta = factory.load_task_checkpoint(out)
    saved = meta["extra"]["scheduler"]
    assert saved == {"epoch": 4, "lr": pytest.approx(live_lr, rel=1e-6),
                     "t_max": 40, "base_lr": pytest.approx(1e-3, rel=1e-9)}
    # Trainer-resume path: make_scheduler + load_state_dict restores the
    # live LR instead of the hparams base, and the source run's T_max and
    # base LR (torch restores base_lrs with T_max — the amplitude must
    # come from the SOURCE run even if the resuming hparams lr differs).
    ctrl = task.make_scheduler()
    ctrl.load_state_dict(saved)
    assert ctrl.lr == pytest.approx(live_lr, rel=1e-6)
    assert ctrl.epoch == 4
    assert ctrl.t_max == 40
    assert ctrl.base_lr == pytest.approx(1e-3, rel=1e-9)
    # The next framework step continues the TORCH trajectory exactly.
    sched.step()
    ctrl.step()
    assert ctrl.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-6)

    # --no-optimizer: warm start keeps the scheduler fresh too.
    out2 = str(tmp_path / "sched_fresh.ckpt")
    torch_import.import_lightning_checkpoint(path, out2,
                                             import_optimizer=False)
    _, _, meta2 = factory.load_task_checkpoint(out2)
    assert meta2["extra"]["scheduler"] is None


_PL_MODNAMES = ("pytorch_lightning", "pytorch_lightning.utilities",
                "pytorch_lightning.utilities.parsing")


def _save_forged_lightning_ckpt(path):
    """Save a .ckpt whose hyper_parameters pickle references the GENUINE
    Lightning import path ``pytorch_lightning.utilities.parsing
    .AttributeDict`` (a dict subclass forged under that name), restoring
    sys.modules afterwards — the real on-disk format without the package."""
    import types

    fake_cls = type("AttributeDict", (dict,), {})
    fake_cls.__module__ = _PL_MODNAMES[-1]
    forged = {name: types.ModuleType(name) for name in _PL_MODNAMES}
    forged[_PL_MODNAMES[-1]].AttributeDict = fake_cls
    prev = {name: sys.modules.get(name) for name in forged}
    sys.modules.update(forged)
    try:
        src = RefSimplePointNetVAE(num_points=32, latent_dim=8)
        src.eval()
        hp = fake_cls(
            {"num_points": 32, "latent_dim": 8, "lr": 1e-4, "beta": 1e-1}
        )
        torch.save({"state_dict": src.state_dict(), "hyper_parameters": hp,
                    "epoch": 1, "global_step": 10}, path)
    finally:
        for name, old in prev.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def test_import_survives_lightning_attributedict(tmp_path, rng):
    """hyper_parameters pickled as pytorch_lightning AttributeDict (the real
    Lightning on-disk format) unpickle through the scoped stub without the
    package — and the stubs do not leak into sys.modules afterwards."""
    import importlib.util

    path = str(tmp_path / "attr.ckpt")
    _save_forged_lightning_ckpt(path)

    # On THIS image pytorch_lightning is absent (CLAUDE.md) so the scoping
    # assertions apply; on a host with the real package installed the real
    # modules legitimately stay imported and only the round-trip matters.
    pl_absent = (importlib.util.find_spec("pytorch_lightning") is None
                 and "pytorch_lightning" not in sys.modules)

    sd, hparams, meta = torch_import.load_lightning_checkpoint(path)
    assert hparams["num_points"] == 32
    if pl_absent:
        # Scoped: no stub may shadow a future real install.
        assert "pytorch_lightning" not in sys.modules
    out = str(tmp_path / "attr_imported.ckpt")
    torch_import.import_lightning_checkpoint(path, out)
    if pl_absent:
        assert "pytorch_lightning" not in sys.modules
    _, _, meta2 = factory.load_task_checkpoint(out)
    assert meta2["hparams"]["num_points"] == 32


def test_unpickle_patches_attrless_preexisting_module(tmp_path, rng):
    """A module already sitting in sys.modules under a lightning name but
    LACKING AttributeDict (e.g. a shim, or a partially-imported install) is
    patched for the duration of the load and un-patched afterwards — not
    skipped (that would AttributeError during unpickling) and not deleted."""
    import types

    path = str(tmp_path / "attr.ckpt")
    _save_forged_lightning_ckpt(path)

    shims = {name: types.ModuleType(name) for name in _PL_MODNAMES}
    prev = {name: sys.modules.get(name) for name in shims}
    sys.modules.update(shims)
    try:
        sd, hparams, meta = torch_import.load_lightning_checkpoint(path)
        assert hparams["num_points"] == 32
        for name, mod in shims.items():
            assert sys.modules[name] is mod  # still the caller's module...
            assert not hasattr(mod, "AttributeDict")  # ...and un-patched
    finally:
        for name, old in prev.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def test_convert_scheduler_state_translations():
    """torch scheduler state (Lightning 'lr_schedulers' payloads) maps onto
    the framework host controllers' state_dict formats."""
    # ReduceLROnPlateau: drive a REAL torch scheduler so the saved keys are
    # authentic (best/num_bad_epochs semantics match the framework's).
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(lin.parameters(), lr=1e-4)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=5
    )
    for metric in (1.0, 0.5, 0.6, 0.7):  # best=0.5, then 2 bad epochs
        sched.step(metric)
    got = torch_import.convert_scheduler_state(
        "point_diffusion", [sched.state_dict()], opt.param_groups[0]["lr"]
    )
    assert got == {"lr": pytest.approx(1e-4), "best": pytest.approx(0.5),
                   "num_bad_epochs": 2}
    # Round-trips into the framework controller.
    from shapegen_tpu.train.schedulers import ReduceLROnPlateau

    ctrl = ReduceLROnPlateau(1e-4, factor=0.5, patience=5)
    ctrl.load_state_dict(got)
    assert ctrl.best == pytest.approx(0.5)

    # CosineAnnealingLR: real torch scheduler, mid-schedule.
    opt2 = torch.optim.Adam(lin.parameters(), lr=1e-3)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt2, T_max=100, eta_min=1e-6
    )
    for _ in range(10):
        opt2.step()
        cos.step()
    got2 = torch_import.convert_scheduler_state(
        "simple_pointnet_vae", [cos.state_dict()], opt2.param_groups[0]["lr"]
    )
    assert got2["epoch"] == 10
    assert got2["lr"] == pytest.approx(opt2.param_groups[0]["lr"], rel=1e-6)
    assert got2["t_max"] == 100  # annealing horizon pinned to the source run

    # Cosine without _last_lr (older torch): recomputed from the closed form.
    stripped = {k: v for k, v in cos.state_dict().items() if k != "_last_lr"}
    got3 = torch_import.convert_scheduler_state(
        "simple_pointnet_vae", [stripped], None
    )
    assert got3["lr"] == pytest.approx(got2["lr"], rel=1e-6)

    # Plateau with no saved scheduler: optimizer live lr is authoritative.
    got4 = torch_import.convert_scheduler_state("point_diffusion", [], 5e-5)
    assert got4["lr"] == pytest.approx(5e-5)
    assert got4["best"] == math.inf and got4["num_bad_epochs"] == 0

    # Scheduler-less task / nothing usable -> None.
    assert torch_import.convert_scheduler_state("vae3d", [cos.state_dict()],
                                                1e-3) is None
    assert torch_import.convert_scheduler_state("point_diffusion", [],
                                                None) is None


def test_import_refuses_to_overwrite_non_checkpoint(tmp_path, rng):
    """--out pointing at an existing directory that is NOT a framework
    checkpoint (no sidecar) must raise, not rmtree the user's data."""
    src = RefSimplePointNetVAE(num_points=32, latent_dim=8)
    src.eval()
    path = str(tmp_path / "src.ckpt")
    torch.save({"state_dict": src.state_dict(),
                "hyper_parameters": {"num_points": 32, "latent_dim": 8,
                                     "lr": 1e-4, "beta": 1e-1},
                "epoch": 0, "global_step": 0}, path)
    precious = tmp_path / "precious"
    precious.mkdir()
    (precious / "data.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        torch_import.import_lightning_checkpoint(path, str(precious))
    assert (precious / "data.txt").read_text() == "do not delete"

    # A real framework checkpoint at --out IS replaced (idempotent re-import).
    out = str(tmp_path / "imported.ckpt")
    torch_import.import_lightning_checkpoint(path, out)
    torch_import.import_lightning_checkpoint(path, out)
    _, _, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["num_points"] == 32

    # Crash-orphan: an interrupted save leaves the orbax payload WITHOUT its
    # sidecar (atomic_save removes the old sidecar before the rename, never
    # leaving a mismatched pair). The orphan must stay replaceable.
    os.remove(out + ".json")
    torch_import.import_lightning_checkpoint(path, out)
    _, _, meta = factory.load_task_checkpoint(out)
    assert meta["hparams"]["num_points"] == 32
