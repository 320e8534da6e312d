#!/usr/bin/env python
"""Headline benchmark: DDIM sampling throughput (samples/sec/chip).

Config matches the reference's north-star path (BASELINE.json): the
production PointUNetLarge denoiser (dim=256), 2048-point clouds, 1000
DDIM steps (diffusion.py:261-289), run as one compiled lax.scan with
HBM-resident latents.

Prints ONE JSON line:
  {"metric": "samples/sec/chip (2048-pt DDPM, 1000-step DDIM)",
   "value": <tpu samples/sec/chip>, "unit": "samples/sec/chip",
   "vs_baseline": <speedup vs the CPU reference-equivalent path>}

vs_baseline is measured against the same sampler executed on CPU (the
reference-equivalent path — the reference publishes no numbers and runs
single-device, BASELINE.md). The CPU number is measured once with a short
scan and extrapolated linearly in steps (the scan body dominates), then
cached in cpu_baseline.json. Target from BASELINE.json: >=10x.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_SAMPLES = 16
NUM_POINTS = 2048
NUM_STEPS = 1000
CPU_STEPS = 4  # extrapolated to NUM_STEPS
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpu_baseline.json")


def _build():
    import jax
    import jax.numpy as jnp

    from shapegen_tpu import models
    from shapegen_tpu.core import samplers

    model = models.PointUNetLarge(dim=256, time_dim=256)
    x0 = jnp.zeros((1, NUM_POINTS, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)), train=False)

    def denoise(x, t):
        return model.apply(variables, x, t, train=False)

    def make_sampler(num_steps):
        def run(key):
            return samplers.ddim_sample(
                key, denoise, (NUM_SAMPLES, NUM_POINTS, 3), num_steps=num_steps
            )

        return jax.jit(run)

    return jax, make_sampler


def measure(num_steps, repeats=2):
    import numpy as np

    jax, make_sampler = _build()
    run = make_sampler(num_steps)
    key = jax.random.PRNGKey(24)

    def sync(out):
        # Force completion via a data fetch: on the axon tunnel,
        # block_until_ready can return before remote execution finishes;
        # fetching a scalar slice is a reliable barrier (costs <1 ms).
        np.asarray(jax.device_get(out[0, 0]))

    sync(run(key))  # compile
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        sync(run(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    return best


def cpu_baseline_sps():
    """samples/sec for the CPU reference-equivalent path (cached)."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["cpu_samples_per_sec"]
    # PALLAS_AXON_POOL_IPS must be cleared: the image's sitecustomize
    # otherwise forces the axon TPU platform over JAX_PLATFORMS.
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    code = (
        "import bench, json; t = bench.measure(bench.CPU_STEPS, repeats=1); "
        "full = t * bench.NUM_STEPS / bench.CPU_STEPS; "
        "print(json.dumps({'cpu_samples_per_sec': bench.NUM_SAMPLES / full}))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    with open(CACHE, "w") as f:
        json.dump(data, f)
    return data["cpu_samples_per_sec"]


def main():
    t = measure(NUM_STEPS)
    tpu_sps = NUM_SAMPLES / t
    try:
        cpu_sps = cpu_baseline_sps()
        vs = tpu_sps / cpu_sps
    except Exception:
        vs = None
    print(
        json.dumps(
            {
                "metric": "samples/sec/chip (2048-pt DDPM, 1000-step DDIM)",
                "value": round(tpu_sps, 4),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
