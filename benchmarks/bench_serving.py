#!/usr/bin/env python
"""Measure the serving artifact on the current platform (VERDICT r2 #8).

Exports the flagship sampler (PointUNetLarge dim=256, weights baked in,
`num-steps`-step DDIM scan) to a serialized StableHLO blob via
shapegen_tpu.serving, then measures what a serving binary pays:

  export_sec      trace + lower + serialize
  artifact_mb     size of the blob on disk (weights are constants in it)
  load_sec        deserialize
  first_call_sec  first execution (compile)
  run_sec         steady-state execution (best of --repeats, data-fetch sync)
  match           exported output == live `task.sample` output (allclose)

Prints one JSON line. Run on the TPU (default platform) or CPU
(PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu). Reference: extension — the
reference has no serving story (checkpoints must be loaded back into the
full Lightning/model codebase to sample).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu import models, serving
from shapegen_tpu.train import tasks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-samples", type=int, default=16)
    ap.add_argument("--num-points", type=int, default=2048)
    ap.add_argument("--num-steps", type=int, default=1000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None, help="also write the blob here")
    args = ap.parse_args()

    model = models.PointUNetLarge(dim=args.dim, time_dim=args.dim)
    task = tasks.PointDiffusionTask(model, num_points=args.num_points)
    state = task.init_state(
        jax.random.PRNGKey(0), jnp.zeros((2, args.num_points, 3))
    )

    t0 = time.perf_counter()
    blob = serving.export_sampler(
        task, state, num_samples=args.num_samples,
        num_points=args.num_points, num_steps=args.num_steps,
    )
    export_sec = time.perf_counter() - t0
    if args.out:
        with open(args.out, "wb") as f:
            f.write(blob)

    t0 = time.perf_counter()
    fn = serving.load_sampler(blob)
    load_sec = time.perf_counter() - t0

    key = serving.key_data(7)
    t0 = time.perf_counter()
    out = np.asarray(jax.device_get(fn(key)))
    first_call_sec = time.perf_counter() - t0

    run_sec = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = np.asarray(jax.device_get(fn(key)))
        run_sec = min(run_sec, time.perf_counter() - t0)

    live = np.asarray(jax.device_get(task.sample(
        state, jax.random.wrap_key_data(jnp.asarray(key)),
        args.num_samples, args.num_points, args.num_steps,
    )))
    match = bool(np.allclose(out, live, rtol=1e-4, atol=1e-5))

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "num_samples": args.num_samples,
        "num_points": args.num_points,
        "num_steps": args.num_steps,
        "export_sec": round(export_sec, 2),
        "artifact_mb": round(len(blob) / 1e6, 1),
        "load_sec": round(load_sec, 3),
        "first_call_sec": round(first_call_sec, 2),
        "run_sec": round(run_sec, 3),
        "samples_per_sec": round(args.num_samples / run_sec, 3),
        "matches_live_sampler": match,
    }))


if __name__ == "__main__":
    main()
