#!/usr/bin/env python
"""Sampling precision ladder on the chip: 1000-step DDIM throughput for the
flagship PointUNetLarge (dim=256, 2048 points) at f32 vs bf16 compute, plus
a direct quality A/B.

The headline bench (bench.py) stays f32 — the reference samples in f32
(diffusion.py:261-289) and round-over-round comparability matters. This
records what bf16 buys on the MXU and what it costs in output fidelity:
THE SAME weights and PRNG key drive both samplers (the model's `dtype` is
compute-only; params stay f32), so the per-sample Chamfer distance between
the two output sets isolates the precision effect. The noise floor printed
alongside is the f32-vs-f32 CD across *different* keys — the scale of
"actually different shapes".

Prints one JSON line per dtype plus one summary line.
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
from shapegen_tpu.core import samplers
from shapegen_tpu.metrics import metrics

NUM_SAMPLES = 16
NUM_POINTS = 2048
NUM_STEPS = 1000


def build(dtype, variables):
    model = models.PointUNetLarge(dim=256, time_dim=256, dtype=dtype)

    def denoise(x, t):
        return model.apply(variables, x, t, train=False)

    def run(key):
        return samplers.ddim_sample(
            key, denoise, (NUM_SAMPLES, NUM_POINTS, 3), num_steps=NUM_STEPS
        )

    return jax.jit(run)


def sync(out):
    np.asarray(jax.device_get(out[0, 0]))


def measure(run, key, repeats=3):
    sync(run(key))  # compile
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        sync(run(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    return best


def per_sample_cd(a, b):
    """Mean/max Chamfer distance between corresponding clouds (diagonal of
    the pairwise matrix — cube-normalized Euclidean CD, metrics semantics)."""
    m = np.asarray(jax.device_get(metrics.pairwise_chamfer_matrix(a, b)))
    d = np.diag(m)
    return float(d.mean()), float(d.max())


if __name__ == "__main__":
    # One f32 init; both precisions share it (dtype is compute-only).
    f32 = models.PointUNetLarge(dim=256, time_dim=256)
    x0 = jnp.zeros((1, NUM_POINTS, 3))
    variables = f32.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)), train=False)

    key = jax.random.PRNGKey(24)
    results = {}
    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        run = build(dtype, variables)
        dt = measure(run, key)
        name = jnp.dtype(dtype).name
        results[name] = dt
        outs[name] = run(key)  # same key for the quality A/B
        print(json.dumps({
            "compute_dtype": name,
            "sec_per_1000step_batch16": round(dt, 3),
            "samples_per_sec": round(NUM_SAMPLES / dt, 4),
        }), flush=True)

    mean_cd, max_cd = per_sample_cd(outs["float32"], outs["bfloat16"])
    # Noise floor: f32 sampling under a different key = genuinely different
    # shapes; precision error should sit far below this.
    other = build(jnp.float32, variables)(jax.random.fold_in(key, 123))
    floor_cd, _ = per_sample_cd(outs["float32"], other)
    print(json.dumps({
        "speedup_bf16_over_f32": round(results["float32"] / results["bfloat16"], 3),
        "per_sample_cd_f32_vs_bf16_mean": round(mean_cd, 4),
        "per_sample_cd_f32_vs_bf16_max": round(max_cd, 4),
        "cd_noise_floor_f32_diff_keys_mean": round(floor_cd, 4),
    }), flush=True)
