#!/usr/bin/env python
"""Train-step throughput on the chip: full fwd+bwd+AdamW over the flagship
PointUNetLarge (dim=256) at 2048 points.

Prints one JSON line per batch size with ms/step and effective TFLOP/s
(FLOPs counted as 3x the forward matmul FLOPs: fwd + 2 bwd passes — the
standard rule of thumb for MLP-dominated models).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import models
from shapegen_tpu.train import tasks

NUM_POINTS = 2048
# Forward MACs/point for PointUNetLarge dim=256 (sum of cin*cout over the
# point-wise rungs; the 4096-wide global branch runs once per cloud and is
# negligible per point): ~21.2e6.
MACS_PER_POINT = 21.2e6


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def measure(batch, steps=20, dtype=jnp.float32):
    model = models.PointUNetLarge(dim=256, time_dim=256, dtype=dtype)
    task = tasks.PointDiffusionTask(model, num_points=NUM_POINTS)
    key = jax.random.PRNGKey(24)
    x = jax.random.normal(key, (batch, NUM_POINTS, 3))
    state = task.init_state(jax.random.PRNGKey(0), x)
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))

    state, m = step_fn(state, x, jax.random.fold_in(key, 0), jnp.int32(0))
    sync(m["train_loss"])  # compile + settle
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, m = step_fn(state, x, jax.random.fold_in(key, i), jnp.int32(0))
    sync(m["train_loss"])
    dt = (time.perf_counter() - t0) / steps
    flops = 3 * 2 * MACS_PER_POINT * NUM_POINTS * batch
    return {
        "batch": batch,
        "compute_dtype": jnp.dtype(dtype).name,
        "ms_per_step": round(dt * 1e3, 2),
        "steps_per_sec": round(1.0 / dt, 2),
        "eff_tflops": round(flops / dt / 1e12, 1),
    }


if __name__ == "__main__":
    for batch, dtype in ((16, jnp.float32), (32, jnp.float32),
                         (16, jnp.bfloat16)):
        print(json.dumps(measure(batch, dtype=dtype)))
