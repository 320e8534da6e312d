#!/usr/bin/env python
"""Benchmark the device auction exact-EMD against the host Hungarian floor.

The round-4 eval floor was the host-side exact EMD: 16 pairs of 2048-pt
clouds cost 18.5 s end-to-end even with the native C++ solver, because the
O(n³) assignment is serial host work on a single-core machine
(BASELINE.md "Eval-metric overlap"). The auction solver (ops/auction.py)
moves the assignment onto the TPU, batched over pairs. This benchmark:

  1. times `compute_metrics_batched` with the host backend (the round-4
     choreography: device CD/BCE overlapping host Hungarian);
  2. times it with `exact_emd_backend='device'` (CD/BCE and the auction
     EMD all on chip);
  3. asserts the per-pair EMDs agree (|Δ| ≤ n·ε + f32 noise).

Prints one JSON line per path + a summary. Run on the TPU (no JAX_PLATFORMS
override); safe on CPU too, just slow.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--num-points", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--skip-host", action="store_true", default=False)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from shapegen_tpu.metrics import metrics

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(24)

    def cube(p):
        c = (p.max(0) + p.min(0)) / 2.0
        p = p - c
        return p / np.abs(p).max()

    B, n = args.pairs, args.num_points
    gen = np.stack([cube(rng.standard_normal((n, 3)).astype(np.float32))
                    for _ in range(B)])
    ref = np.stack([cube(rng.standard_normal((n, 3)).astype(np.float32))
                    for _ in range(B)])

    results = {}
    values = {}
    for backend in (["device"] if args.skip_host else ["host", "device"]):
        best = float("inf")
        for r in range(args.repeats + 1):
            t0 = time.perf_counter()
            cds, emds, recons = metrics.compute_metrics_batched(
                gen, ref, exact_emd_backend=backend
            )
            dt = time.perf_counter() - t0
            if r == 0:
                print(json.dumps({"backend": backend, "first_call_s":
                                  round(dt, 2)}), flush=True)
                continue  # first call pays compile
            best = min(best, dt)
        results[backend] = best
        values[backend] = np.asarray(emds)
        print(json.dumps({
            "backend": backend, "pairs": B, "num_points": n,
            "steady_s": round(best, 2),
            "s_per_pair": round(best / B, 3),
        }), flush=True)

    summary = {"pairs": B, "num_points": n, **{
        f"{k}_s": round(v, 2) for k, v in results.items()
    }}
    if not args.skip_host:
        diff = np.abs(values["device"] - values["host"])
        summary["max_abs_emd_diff"] = float(diff.max())
        summary["speedup_device_vs_host"] = round(
            results["host"] / results["device"], 2
        )
        np.testing.assert_allclose(
            values["device"], values["host"], rtol=1e-3, atol=n * 1e-5
        )
        summary["values_match"] = True
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
