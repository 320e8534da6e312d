#!/usr/bin/env python
"""Time the eval-metric choreography: sequential vs batched/overlapped.

VERDICT r2 #2 "done" criterion: on-chip eval of 16 pairs timed before/after.

  sequential   the reference's pair-by-pair loop
               (/root/reference/test_point_ddpm.py:85-97): each pair syncs
               the device CD, blocks on the host Hungarian O(n^3), then the
               voxel-BCE — device and host strictly serialized.
  overlapped   metrics.compute_metrics_batched: ONE jitted device program
               for all pairs' CD+voxel-BCE, dispatched asynchronously; the
               host Hungarian runs while the device drains.

Prints one JSON line per mode plus a speedup summary. Run with the real TPU
(default platform) or CPU (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from shapegen_tpu.metrics import compute_metrics, compute_metrics_batched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--num-points", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(24)
    x = rng.standard_normal((args.pairs, args.num_points, 3)).astype(np.float32)
    y = (rng.standard_normal((args.pairs, args.num_points, 3)) * 0.9).astype(
        np.float32
    )

    def run_sequential():
        cds, emds, recons = [], [], []
        for i in range(args.pairs):
            cd, emd, rec = compute_metrics(x[i], y[i])
            cds.append(float(cd))
            emds.append(float(emd))
            recons.append(float(rec))
        return np.asarray(cds), np.asarray(emds), np.asarray(recons)

    def run_overlapped():
        return compute_metrics_batched(x, y)

    results = {}
    for name, fn in (("sequential", run_sequential), ("overlapped", run_overlapped)):
        out = fn()  # compile + warm caches
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        results[name] = {"sec": best, "out": out}
        print(json.dumps({
            "mode": name,
            "pairs": args.pairs,
            "num_points": args.num_points,
            "sec": round(best, 3),
            "sec_per_pair": round(best / args.pairs, 4),
            "platform": jax.devices()[0].platform,
        }))

    for a, b in zip(results["sequential"]["out"], results["overlapped"]["out"]):
        np.testing.assert_allclose(a, b, rtol=1e-4)
    print(json.dumps({
        "speedup": round(
            results["sequential"]["sec"] / results["overlapped"]["sec"], 2
        ),
        "values_match": True,
    }))


if __name__ == "__main__":
    main()
