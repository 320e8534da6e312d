"""End-to-end LDM-denoiser fidelity via torch weight transplant.

Oracle of SimpleLatentUNetPointNet (networks.py:962-1106): Linear+GroupNorm(8)
encoder dim/4..2dim, 8dim global feature, refine-skip decoder, MLP head.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shapegen_tpu import models  # noqa: E402

LATENT = 16
DIM = 32
TDIM = 16


class TorchLatentOracle(torch.nn.Module):
    def __init__(self):
        super().__init__()
        d = DIM
        self.t1 = torch.nn.Linear(TDIM, TDIM)
        self.t2 = torch.nn.Linear(TDIM, TDIM)

        def rung(cin, cout):
            return torch.nn.ModuleList(
                [torch.nn.Linear(cin, cout), torch.nn.GroupNorm(8, cout)]
            )

        self.enc1 = rung(LATENT + TDIM, d // 4)
        self.enc2 = rung(d // 4, d // 2)
        self.enc3 = rung(d // 2, d)
        self.enc4 = rung(d, d * 2)
        self.gf1 = rung(d * 2, d * 4)
        self.gf2 = rung(d * 4, d * 8)
        self.r1 = torch.nn.Linear(d // 4, d // 4)
        self.r2 = torch.nn.Linear(d // 2, d // 2)
        self.r3 = torch.nn.Linear(d, d)
        self.r4 = torch.nn.Linear(d * 2, d * 2)
        self.dec4 = rung(d * 8 + d * 2, d * 2)
        self.dec3 = rung(d * 2 + d, d)
        self.dec2 = rung(d + d // 2, d // 2)
        self.dec1 = rung(d // 2 + d // 4, d // 4)
        self.o1 = torch.nn.Linear(d // 4, d // 4)
        self.o2 = torch.nn.Linear(d // 4, LATENT)

    @staticmethod
    def _rung(r, x):
        return torch.relu(r[1](r[0](x)))

    def forward(self, z, t):
        half = TDIM // 2
        freqs = torch.exp(
            torch.arange(half, dtype=torch.float32)
            * -(math.log(10000.0) / (half - 1))
        )
        args = t[:, None] * freqs[None]
        emb = torch.cat([torch.sin(args), torch.cos(args)], -1)
        emb = self.t2(torch.nn.functional.silu(self.t1(emb)))

        h = torch.cat([z, emb], dim=1)
        z1 = self._rung(self.enc1, h)
        z2 = self._rung(self.enc2, z1)
        z3 = self._rung(self.enc3, z2)
        z4 = self._rung(self.enc4, z3)
        g = self._rung(self.gf2, self._rung(self.gf1, z4))
        h = self._rung(self.dec4, torch.cat([g, self.r4(z4)], 1))
        h = self._rung(self.dec3, torch.cat([h, self.r3(z3)], 1))
        h = self._rung(self.dec2, torch.cat([h, self.r2(z2)], 1))
        h = self._rung(self.dec1, torch.cat([h, self.r1(z1)], 1))
        return self.o2(torch.relu(self.o1(h)))


def _lin(l):
    return {
        "kernel": jnp.asarray(l.weight.detach().numpy().T),
        "bias": jnp.asarray(l.bias.detach().numpy()),
    }


def _gn(g):
    return {
        "scale": jnp.asarray(g.weight.detach().numpy()),
        "bias": jnp.asarray(g.bias.detach().numpy()),
    }


def test_latent_unet_matches_torch_oracle(rng):
    oracle = TorchLatentOracle()
    oracle.eval()
    z = rng.standard_normal((4, LATENT)).astype(np.float32)
    t = np.array([0.1, 0.4, 0.6, 0.9], np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(z), torch.tensor(t)).numpy()

    model = models.SimpleLatentUNet(latent_dim=LATENT, dim=DIM, time_dim=TDIM)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(t), train=False
    )
    params = dict(variables["params"])
    params["Dense_0"] = _lin(oracle.t1)
    params["Dense_1"] = _lin(oracle.t2)
    rungs = [oracle.enc1, oracle.enc2, oracle.enc3, oracle.enc4,
             oracle.gf1, oracle.gf2, oracle.dec4, oracle.dec3, oracle.dec2,
             oracle.dec1]
    for i, r in enumerate(rungs):
        params[f"DenseGN_{i}"] = {
            "Dense_0": _lin(r[0]), "GroupNorm_0": _gn(r[1])
        }
    params["Dense_2"] = _lin(oracle.r1)
    params["Dense_3"] = _lin(oracle.r2)
    params["Dense_4"] = _lin(oracle.r3)
    params["Dense_5"] = _lin(oracle.r4)
    params["Dense_6"] = _lin(oracle.o1)
    params["Dense_7"] = _lin(oracle.o2)

    got = model.apply({"params": params}, jnp.asarray(z), jnp.asarray(t),
                      train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)
