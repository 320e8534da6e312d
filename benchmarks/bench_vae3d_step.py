#!/usr/bin/env python
"""VAE3DLarge train-step throughput — completes the per-family perf story.

The point-denoiser family is decomposed in bench_train_step_breakdown.py
(matmul core at ~96% of bf16 peak); this measures the 3D-conv family:
VAE3DLarge (reference networks.py:2208-2490) full train step — forward +
backward + Adam + BN batch stats, BCE(mean)+beta*KL loss — at batch 16 x
32^3 voxels, f32 vs bf16 compute.

FLOPs come from XLA's own cost model (`compiled.cost_analysis()["flops"]`,
computed in a CPU subprocess so the single-client TPU tunnel only runs the
timed steps), not a hand-derived MAC constant. Effective TFLOP/s =
cost-model FLOPs / measured step time; the same convention both dtypes, so
the f32/bf16 ratio is meaningful even where XLA's count differs from the
hardware's true op count.

Prints one JSON line per dtype plus a combined `derived` line.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import models
from shapegen_tpu.train import tasks

VOX = 32


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def flops_from_cpu_cost_model(batch: int, dtype_name: str) -> float:
    """XLA cost-model FLOPs for one full train step, from a CPU subprocess
    (lowering on the axon backend would pay a multi-minute remote compile
    and occupy the single-client tunnel)."""
    code = (
        "import jax, jax.numpy as jnp, json\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from shapegen_tpu import models\n"
        "from shapegen_tpu.train import tasks\n"
        f"model = models.VAE3DLarge(latent_dim=256, dtype=jnp.dtype('{dtype_name}'))\n"
        "task = tasks.VAE3DLargeTask(model)\n"
        f"vox = jnp.zeros(({batch}, {VOX}, {VOX}, {VOX}, 1))\n"
        "state = task.init_state(jax.random.PRNGKey(0), vox[:2])\n"
        "low = jax.jit(task.train_step).lower("
        "state, vox, jax.random.PRNGKey(1), jnp.int32(50))\n"
        "ca = low.compile().cost_analysis()\n"
        "if isinstance(ca, list): ca = ca[0]\n"
        "print(json.dumps({'flops': float(ca.get('flops', 0.0))}))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("cost-model subprocess failed")
    return json.loads(out.stdout.strip().splitlines()[-1])["flops"]


def measure(batch: int, steps: int, dtype_name: str) -> float:
    model = models.VAE3DLarge(latent_dim=256, dtype=jnp.dtype(dtype_name))
    task = tasks.VAE3DLargeTask(model)
    key = jax.random.PRNGKey(24)
    vox = (jax.random.uniform(key, (batch, VOX, VOX, VOX, 1)) > 0.7).astype(
        jnp.float32
    )
    state = task.init_state(jax.random.PRNGKey(0), vox[:2])
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))

    state, _ = step_fn(state, vox, jax.random.fold_in(key, 0), jnp.int32(50))
    sync(state.step)  # compile + settle (data-fetch sync: see bench.py)
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        state, _ = step_fn(
            state, vox, jax.random.fold_in(key, i), jnp.int32(50)
        )
    sync(state.step)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    args = ap.parse_args()

    results = {}
    for dtype_name in args.dtypes:
        flops = flops_from_cpu_cost_model(args.batch, dtype_name)
        dt = measure(args.batch, args.steps, dtype_name)
        results[dtype_name] = (dt, flops)
        print(json.dumps({
            "model": "vae3d_large",
            "dtype": dtype_name,
            "batch": args.batch,
            "ms_per_step": round(dt * 1e3, 2),
            "cost_model_gflops_per_step": round(flops / 1e9, 1),
            "eff_tflops": round(flops / dt / 1e12, 1),
            "samples_per_sec": round(args.batch / dt, 1),
        }))

    if len(results) == 2 and "float32" in results and "bfloat16" in results:
        print(json.dumps({
            "derived": {
                "bf16_speedup": round(
                    results["float32"][0] / results["bfloat16"][0], 2
                ),
            }
        }))


if __name__ == "__main__":
    main()
