"""End-to-end denoiser fidelity: transplant torch weights into the flax
PointUNetLarge and compare full forward outputs.

The per-layer parity tests (test_torch_parity.py) pin each block's
semantics; this pins the *wiring*: a plain-torch oracle of the reference
architecture (networks.py:724-838, rebuilt here channel-first from the spec)
is evaluated against our channel-last flax model carrying the same weights.
Any mismatch in layer order, skip routing, time-embedding plumbing, or the
split-global-kernel rewrite would show up as a numerical difference.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shapegen_tpu import models  # noqa: E402

DIM = 32  # small but structurally identical (dim == time_dim as in the ref)


class TorchOracle(torch.nn.Module):
    """Reference-architecture oracle, written independently from the math."""

    def __init__(self, dim=DIM, time_dim=DIM):
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


def _dense(conv):
    return {
        "kernel": jnp.asarray(conv.weight.detach().numpy()[:, :, 0].T),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }


def _dense_lin(lin):
    return {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy()),
    }


def _bn_params(bn):
    return {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
    }


def _bn_stats(bn):
    return {
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }


def _shared_mlp_params(mlp):
    params, stats = {}, {}
    for i, (conv, bn) in enumerate(zip(mlp[0::2], mlp[1::2])):
        params[f"DenseBN_{i}"] = {
            "Dense_0": _dense(conv), "BatchNorm_0": _bn_params(bn)
        }
        stats[f"DenseBN_{i}"] = {"BatchNorm_0": _bn_stats(bn)}
    return params, stats


def test_full_forward_matches_torch_oracle(rng):
    oracle = TorchOracle()
    # Randomize BN running stats so eval-mode normalization is non-trivial.
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.data = torch.tensor(
                rng.standard_normal(m.num_features).astype(np.float32) * 0.1
            )
            m.running_var.data = torch.tensor(
                rng.random(m.num_features).astype(np.float32) + 0.5
            )
    oracle.eval()

    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    t = np.array([0.2, 0.7], np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x), torch.tensor(t)).numpy()

    model = models.PointUNetLarge(dim=DIM, time_dim=DIM)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), train=False
    )

    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])

    params["TimeMLP_0"] = {
        "Dense_0": _dense_lin(oracle.time_fc1),
        "Dense_1": _dense_lin(oracle.time_fc2),
    }
    for i, mlp in enumerate([oracle.enc1, oracle.enc2, oracle.enc3, oracle.enc4]):
        p, s = _shared_mlp_params(mlp)
        params[f"PointNetLayer_{i}"] = p
        stats[f"PointNetLayer_{i}"] = s
    # global feature stack: DenseBN_0 (2048), DenseBN_1 (4096)
    params["DenseBN_0"] = {"Dense_0": _dense(oracle.g1),
                           "BatchNorm_0": _bn_params(oracle.gbn1)}
    stats["DenseBN_0"] = {"BatchNorm_0": _bn_stats(oracle.gbn1)}
    params["DenseBN_1"] = {"Dense_0": _dense(oracle.g2),
                           "BatchNorm_0": _bn_params(oracle.gbn2)}
    stats["DenseBN_1"] = {"BatchNorm_0": _bn_stats(oracle.gbn2)}
    # refines (Dense_0..3 = refine4..1 in declaration order)
    params["Dense_0"] = _dense(oracle.refine4)
    params["Dense_1"] = _dense(oracle.refine3)
    params["Dense_2"] = _dense(oracle.refine2)
    params["Dense_3"] = _dense(oracle.refine1)
    # dec4's first rung is SPLIT here: Dense(concat([g, r4])) with kernel
    # W (5120, 1024) becomes Dense_4 (g rows, no bias) + Dense_5 (r4 rows).
    w4 = oracle.dec4[0].weight.detach().numpy()[:, :, 0].T  # (5120, 1024)
    b4 = oracle.dec4[0].bias.detach().numpy()
    params["Dense_4"] = {"kernel": jnp.asarray(w4[:4096])}      # g branch
    params["Dense_5"] = {"kernel": jnp.asarray(w4[4096:]),      # r4 branch
                         "bias": jnp.asarray(b4)}
    params["BatchNorm_0"] = _bn_params(oracle.dec4[1])
    stats["BatchNorm_0"] = _bn_stats(oracle.dec4[1])
    # dec4 rungs 2+3 -> standalone DenseBN_2, DenseBN_3
    params["DenseBN_2"] = {"Dense_0": _dense(oracle.dec4[2]),
                           "BatchNorm_0": _bn_params(oracle.dec4[3])}
    stats["DenseBN_2"] = {"BatchNorm_0": _bn_stats(oracle.dec4[3])}
    params["DenseBN_3"] = {"Dense_0": _dense(oracle.dec4[4]),
                           "BatchNorm_0": _bn_params(oracle.dec4[5])}
    stats["DenseBN_3"] = {"BatchNorm_0": _bn_stats(oracle.dec4[5])}
    # dec3..dec1 -> PointNetLayer_4..6
    for i, mlp in enumerate([oracle.dec3, oracle.dec2, oracle.dec1], start=4):
        p, s = _shared_mlp_params(mlp)
        params[f"PointNetLayer_{i}"] = p
        stats[f"PointNetLayer_{i}"] = s
    # output head: DenseBN_4 + Dense_6
    params["DenseBN_4"] = {"Dense_0": _dense(oracle.out1),
                           "BatchNorm_0": _bn_params(oracle.outbn)}
    stats["DenseBN_4"] = {"BatchNorm_0": _bn_stats(oracle.outbn)}
    params["Dense_6"] = _dense(oracle.out2)

    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(t), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
