"""End-to-end denoiser fidelity: transplant torch weights into the flax
PointUNetLarge and compare full forward outputs.

The per-layer parity tests (test_torch_parity.py) pin each block's
semantics; this pins the *wiring*: a plain-torch oracle of the reference
architecture (networks.py:724-838, rebuilt channel-first from the spec in
transplant_utils.py) is evaluated against our channel-last flax model
carrying the same weights. Any mismatch in layer order, skip routing,
time-embedding plumbing, or the split-global-kernel rewrite would show up
as a numerical difference.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shapegen_tpu import models  # noqa: E402
from transplant_utils import PointUNetOracle, pointunet_trees  # noqa: E402

DIM = 32  # small but structurally identical (dim == time_dim as in the ref)


def test_full_forward_matches_torch_oracle(rng):
    oracle = PointUNetOracle(dim=DIM, time_dim=DIM)
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

    params, stats = pointunet_trees(oracle)
    # The extraction must cover the full parameter structure.
    assert set(params) == set(variables["params"])
    assert set(stats) == set(variables["batch_stats"])

    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(t), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
