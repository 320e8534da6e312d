"""Shared torch-oracle architectures + torch->flax tree extraction.

Used by the forward transplant tests (test_full_model_transplant.py,
test_vae3d_transplant.py) and the gradient/train-step parity tests
(test_grad_parity.py). Every extraction helper takes a ``get`` accessor
mapping a torch Parameter to a numpy array, so the SAME structural mapping
produces either a weight tree (``get=lambda p: p.detach().numpy()``) or a
gradient tree (``get=lambda p: p.grad.numpy()``) — guaranteeing the grads
compared in the parity tests line up leaf-for-leaf with the weights.
"""

import math

import numpy as np
import torch

import jax.numpy as jnp


def get_weights(p):
    # .copy() is load-bearing: .numpy() returns a VIEW of torch storage and
    # jax's CPU backend zero-copies numpy arrays, so without it a later
    # in-place optimizer.step() would silently mutate the extracted tree.
    return p.detach().numpy().copy()


def get_grads(p):
    return p.grad.detach().numpy().copy()


def dense_from_conv(conv, get=get_weights):
    """torch Conv1d(k=1) (O, I, 1) -> flax Dense (I, O)."""
    return {
        "kernel": jnp.asarray(get(conv.weight)[:, :, 0].T),
        "bias": jnp.asarray(get(conv.bias)),
    }


def dense_from_linear(lin, get=get_weights):
    return {
        "kernel": jnp.asarray(get(lin.weight).T),
        "bias": jnp.asarray(get(lin.bias)),
    }


def bn_params(bn, get=get_weights):
    return {
        "scale": jnp.asarray(get(bn.weight)),
        "bias": jnp.asarray(get(bn.bias)),
    }


def bn_stats(bn):
    # .copy(): train-mode forwards update running stats in place (see
    # get_weights).
    return {
        "mean": jnp.asarray(bn.running_mean.detach().numpy().copy()),
        "var": jnp.asarray(bn.running_var.detach().numpy().copy()),
    }


def conv3d(c, get=get_weights):
    """torch Conv3d (O, I, kd, kh, kw) -> flax Conv (kd, kh, kw, I, O)."""
    return {
        "kernel": jnp.asarray(get(c.weight).transpose(2, 3, 4, 1, 0)),
        "bias": jnp.asarray(get(c.bias)),
    }


def deconv3d(c, get=get_weights):
    """torch ConvTranspose3d (I, O, k...) -> flax ConvTranspose
    (k..., I, O) with spatial flip (transpose_kernel=False mapping)."""
    w = get(c.weight).transpose(2, 3, 4, 0, 1)
    w = w[::-1, ::-1, ::-1].copy()
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(get(c.bias))}


# ---------------------------------------------------------------------------
# PointUNetLarge oracle (reference networks.py:724-838) and its tree mapping.
# ---------------------------------------------------------------------------


class PointUNetOracle(torch.nn.Module):
    """Reference-architecture oracle, written independently from the spec."""

    def __init__(self, dim=32, time_dim=32):
        super().__init__()
        self.time_dim = time_dim
        self.time_fc1 = torch.nn.Linear(time_dim, dim)
        self.time_fc2 = torch.nn.Linear(dim, dim)

        def shared_mlp(cin, cmid, cout):
            return torch.nn.ModuleList([
                torch.nn.Conv1d(cin, cmid, 1), torch.nn.BatchNorm1d(cmid),
                torch.nn.Conv1d(cmid, cmid, 1), torch.nn.BatchNorm1d(cmid),
                torch.nn.Conv1d(cmid, cout, 1), torch.nn.BatchNorm1d(cout),
            ])

        self.enc1 = shared_mlp(3 + time_dim, 64, 128)
        self.enc2 = shared_mlp(128, 128, 256)
        self.enc3 = shared_mlp(256, 256, 512)
        self.enc4 = shared_mlp(512, 512, 1024)
        self.g1 = torch.nn.Conv1d(1024, 2048, 1)
        self.gbn1 = torch.nn.BatchNorm1d(2048)
        self.g2 = torch.nn.Conv1d(2048, 4096, 1)
        self.gbn2 = torch.nn.BatchNorm1d(4096)
        self.refine4 = torch.nn.Conv1d(1024, 1024, 1)
        self.refine3 = torch.nn.Conv1d(512, 512, 1)
        self.refine2 = torch.nn.Conv1d(256, 256, 1)
        self.refine1 = torch.nn.Conv1d(128, 128, 1)
        self.dec4 = shared_mlp(4096 + 1024, 1024, 512)
        self.dec3 = shared_mlp(512 + 512, 512, 256)
        self.dec2 = shared_mlp(256 + 256, 256, 128)
        self.dec1 = shared_mlp(128 + 128, 128, 64)
        self.out1 = torch.nn.Conv1d(64, 64, 1)
        self.outbn = torch.nn.BatchNorm1d(64)
        self.out2 = torch.nn.Conv1d(64, 3, 1)

    @staticmethod
    def _run_mlp(mlp, x):
        for conv, bn in zip(mlp[0::2], mlp[1::2]):
            x = torch.relu(bn(conv(x)))
        return x

    def _t_embed(self, t):
        half = self.time_dim // 2
        freqs = torch.exp(
            torch.arange(half, dtype=torch.float32)
            * -(math.log(10000.0) / (half - 1))
        )
        args = t[:, None] * freqs[None]
        emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
        emb = self.time_fc2(torch.nn.functional.silu(self.time_fc1(emb)))
        return emb

    def forward(self, x, t):
        # x: (B, N, 3) -> channel-first internally
        B, N, _ = x.shape
        emb = self._t_embed(t)[:, :, None].expand(-1, -1, N)
        h = torch.cat([x.transpose(1, 2), emb], dim=1)
        x1 = self._run_mlp(self.enc1, h)
        x2 = self._run_mlp(self.enc2, x1)
        x3 = self._run_mlp(self.enc3, x2)
        x4 = self._run_mlp(self.enc4, x3)
        g = torch.relu(self.gbn2(self.g2(torch.relu(self.gbn1(self.g1(x4))))))
        g = g.max(dim=2, keepdim=True)[0].expand(-1, -1, N)
        d = self._run_mlp(self.dec4, torch.cat([g, self.refine4(x4)], dim=1))
        d = self._run_mlp(self.dec3, torch.cat([d, self.refine3(x3)], dim=1))
        d = self._run_mlp(self.dec2, torch.cat([d, self.refine2(x2)], dim=1))
        d = self._run_mlp(self.dec1, torch.cat([d, self.refine1(x1)], dim=1))
        d = self.out2(torch.relu(self.outbn(self.out1(d))))
        return d.transpose(1, 2)


def _shared_mlp_trees(mlp, get):
    params, stats = {}, {}
    for i, (conv, bn) in enumerate(zip(mlp[0::2], mlp[1::2])):
        params[f"DenseBN_{i}"] = {
            "Dense_0": dense_from_conv(conv, get),
            "BatchNorm_0": bn_params(bn, get),
        }
        stats[f"DenseBN_{i}"] = {"BatchNorm_0": bn_stats(bn)}
    return params, stats


def pointunet_trees(oracle, get=get_weights):
    """(params, batch_stats) flax trees for models.PointUNetLarge extracted
    from a PointUNetOracle via ``get``. The mapping (incl. the split dec4
    first rung) matches the model's submodule auto-naming, pinned by
    tests/test_param_structure.py."""
    params, stats = {}, {}
    params["TimeMLP_0"] = {
        "Dense_0": dense_from_linear(oracle.time_fc1, get),
        "Dense_1": dense_from_linear(oracle.time_fc2, get),
    }
    for i, mlp in enumerate([oracle.enc1, oracle.enc2, oracle.enc3, oracle.enc4]):
        p, s = _shared_mlp_trees(mlp, get)
        params[f"PointNetLayer_{i}"] = p
        stats[f"PointNetLayer_{i}"] = s
    # global feature stack: DenseBN_0 (2048), DenseBN_1 (4096)
    params["DenseBN_0"] = {"Dense_0": dense_from_conv(oracle.g1, get),
                           "BatchNorm_0": bn_params(oracle.gbn1, get)}
    stats["DenseBN_0"] = {"BatchNorm_0": bn_stats(oracle.gbn1)}
    params["DenseBN_1"] = {"Dense_0": dense_from_conv(oracle.g2, get),
                           "BatchNorm_0": bn_params(oracle.gbn2, get)}
    stats["DenseBN_1"] = {"BatchNorm_0": bn_stats(oracle.gbn2)}
    # refines (Dense_0..3 = refine4..1 in declaration order)
    params["Dense_0"] = dense_from_conv(oracle.refine4, get)
    params["Dense_1"] = dense_from_conv(oracle.refine3, get)
    params["Dense_2"] = dense_from_conv(oracle.refine2, get)
    params["Dense_3"] = dense_from_conv(oracle.refine1, get)
    # dec4's first rung is SPLIT in the flax model: Dense(concat([g, r4]))
    # with kernel W (5120, 1024) becomes Dense_4 (g rows, no bias) +
    # Dense_5 (r4 rows, bias).
    w4 = get(oracle.dec4[0].weight)[:, :, 0].T  # (5120, 1024)
    b4 = get(oracle.dec4[0].bias)
    g_rows = oracle.g2.out_channels
    params["Dense_4"] = {"kernel": jnp.asarray(w4[:g_rows])}
    params["Dense_5"] = {"kernel": jnp.asarray(w4[g_rows:]),
                         "bias": jnp.asarray(b4)}
    params["BatchNorm_0"] = bn_params(oracle.dec4[1], get)
    stats["BatchNorm_0"] = bn_stats(oracle.dec4[1])
    # dec4 rungs 2+3 -> standalone DenseBN_2, DenseBN_3
    params["DenseBN_2"] = {"Dense_0": dense_from_conv(oracle.dec4[2], get),
                           "BatchNorm_0": bn_params(oracle.dec4[3], get)}
    stats["DenseBN_2"] = {"BatchNorm_0": bn_stats(oracle.dec4[3])}
    params["DenseBN_3"] = {"Dense_0": dense_from_conv(oracle.dec4[4], get),
                           "BatchNorm_0": bn_params(oracle.dec4[5], get)}
    stats["DenseBN_3"] = {"BatchNorm_0": bn_stats(oracle.dec4[5])}
    # dec3..dec1 -> PointNetLayer_4..6
    for i, mlp in enumerate([oracle.dec3, oracle.dec2, oracle.dec1], start=4):
        p, s = _shared_mlp_trees(mlp, get)
        params[f"PointNetLayer_{i}"] = p
        stats[f"PointNetLayer_{i}"] = s
    # output head: DenseBN_4 + Dense_6
    params["DenseBN_4"] = {"Dense_0": dense_from_conv(oracle.out1, get),
                           "BatchNorm_0": bn_params(oracle.outbn, get)}
    stats["DenseBN_4"] = {"BatchNorm_0": bn_stats(oracle.outbn)}
    params["Dense_6"] = dense_from_conv(oracle.out2, get)
    return params, stats


# ---------------------------------------------------------------------------
# VAE3DLarge oracle (reference networks.py:2208-2490) and its tree mapping.
# ---------------------------------------------------------------------------


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


class VAE3DOracle(torch.nn.Module):
    """VAE3DLarge oracle: residual conv encoder 32^3 -> 16^3 -> 8^3 -> 4^3
    -> k4-valid -> 512, latent heads, decoder fc -> 512x4^3 ->
    3x(ConvT k4s2p1 + ResBlock) -> convs -> sigmoid."""

    def __init__(self, latent_dim=8):
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
        self.fc_mu = torch.nn.Linear(512, latent_dim)
        self.fc_logvar = torch.nn.Linear(512, latent_dim)
        self.dec_in = torch.nn.Linear(latent_dim, 512 * 64)
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

    def decode_logits(self, z):
        h = self.dec_in(z).reshape(-1, 512, 4, 4, 4)
        h = self.dres1(torch.relu(self.up1(h)))
        h = self.dres2(torch.relu(self.up2(h)))
        h = self.dres3(torch.relu(self.up3(h)))
        h = self.dres4(torch.relu(self.dec_conv(h)))
        return self.dec_out(h)

    def decode(self, z):
        return torch.sigmoid(self.decode_logits(z))


def _res_trees(block, get):
    params = {
        "Conv_0": conv3d(block.c1, get), "BatchNorm_0": bn_params(block.b1, get),
        "Conv_1": conv3d(block.c2, get), "BatchNorm_1": bn_params(block.b2, get),
    }
    if block.down is not None:
        params["Conv_2"] = conv3d(block.down, get)
    stats = {"BatchNorm_0": bn_stats(block.b1), "BatchNorm_1": bn_stats(block.b2)}
    return params, stats


def _decoder_input_perm():
    """Column permutation aligning torch's channel-first fc->reshape
    (512, 4, 4, 4) with flax's channel-last (4, 4, 4, 512)."""
    perm = np.empty(512 * 64, np.int64)
    for d in range(4):
        for h in range(4):
            for w in range(4):
                for c in range(512):
                    flax_idx = ((d * 4 + h) * 4 + w) * 512 + c
                    torch_idx = c * 64 + d * 16 + h * 4 + w
                    perm[flax_idx] = torch_idx
    return perm


def vae3d_trees(oracle, get=get_weights):
    """(params, batch_stats) flax trees for models.VAE3DLarge."""
    params, stats = {}, {}
    params["enc_in"] = conv3d(oracle.enc_in, get)
    params["enc_down1"] = conv3d(oracle.down1, get)
    params["enc_down2"] = conv3d(oracle.down2, get)
    params["enc_down3"] = conv3d(oracle.down3, get)
    params["enc_final"] = conv3d(oracle.enc_final, get)
    params["fc_mu"] = dense_from_linear(oracle.fc_mu, get)
    params["fc_logvar"] = dense_from_linear(oracle.fc_logvar, get)
    perm = _decoder_input_perm()
    di = dense_from_linear(oracle.dec_in, get)
    params["decoder_input"] = {
        "kernel": di["kernel"][:, perm], "bias": di["bias"][perm]
    }
    params["dec_up1"] = deconv3d(oracle.up1, get)
    params["dec_up2"] = deconv3d(oracle.up2, get)
    params["dec_up3"] = deconv3d(oracle.up3, get)
    params["dec_conv"] = conv3d(oracle.dec_conv, get)
    params["dec_out"] = conv3d(oracle.dec_out, get)
    for name, block in [
        ("enc_res1", oracle.res1), ("enc_res2", oracle.res2),
        ("enc_res3", oracle.res3), ("enc_res4", oracle.res4),
        ("dec_res1", oracle.dres1), ("dec_res2", oracle.dres2),
        ("dec_res3", oracle.dres3), ("dec_res4", oracle.dres4),
    ]:
        p, s = _res_trees(block, get)
        params[name] = p
        stats[name] = s
    return params, stats
