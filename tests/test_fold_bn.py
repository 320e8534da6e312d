"""BatchNorm-folding correctness: folded inference == unfolded inference."""

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import models
from shapegen_tpu.train.fold_bn import fold_batchnorm


def test_folded_pointunet_matches(rng):
    model = models.PointUNetLarge(dim=32, time_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    t = jnp.array([0.3, 0.8])
    variables = model.init(jax.random.PRNGKey(0), x, t, train=False)

    # Make running stats non-trivial by taking a few train steps' worth of
    # stat updates.
    v = variables
    for i in range(3):
        _, mutated = model.apply(
            v, x + 0.1 * i, t, train=True, mutable=["batch_stats"]
        )
        v = {"params": v["params"], "batch_stats": mutated["batch_stats"]}

    want = model.apply(v, x, t, train=False)
    fp, fs = fold_batchnorm(v["params"], v["batch_stats"])
    got = model.apply({"params": fp, "batch_stats": fs}, x, t, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-4)


def test_folded_simple_unet_matches(rng):
    model = models.SimplePointUNet(dim=32, time_dim=32)
    x = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
    t = jnp.array([0.5])
    v = model.init(jax.random.PRNGKey(1), x, t, train=False)
    want = model.apply(v, x, t, train=False)
    fp, fs = fold_batchnorm(v["params"], v["batch_stats"])
    got = model.apply({"params": fp, "batch_stats": fs}, x, t, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
