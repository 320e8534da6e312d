#!/usr/bin/env python
"""Benchmark the exact Hungarian-EMD pair solvers (host-side).

Three per-pair paths over the same clouds (the reference's exact-EMD
semantics, /root/reference/metrics.py:49-92):

  reference   numpy broadcast cost build ((N, M, 3) temp) + scipy
              linear_sum_assignment — the as-written reference inner loop.
  scipy+mm    matmul-form cost build (|x|^2+|y|^2-2xy; ~1e-5 per-element
              cancellation vs direct form) + scipy — the cheap-cost control
              that isolates the solver cost.
  native      native/shapegen_native.cpp::emd_pair_f32 — fused exact
              direct-form cost build + JV-initialized shortest augmenting
              paths on f32 costs / f64 duals.

All three produce the same EMD (asserted, rtol 1e-5). Prints one JSON line
per path plus a speedup summary. Pure host — safe to run alongside TPU jobs.
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
    ap.add_argument("--num-points", type=int, default=2048)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from scipy.optimize import linear_sum_assignment

    from shapegen_tpu import native

    rng = np.random.default_rng(24)
    n = args.num_points
    # The eval benchmark's cloud shapes: two independent unit-normal draws,
    # each cube-normalized (harder for the solver than raw iid-normal
    # pairs; any pre-scale of a draw would be erased by cube()'s max-abs
    # normalization, so none is applied).
    def cube(p):
        c = (p.max(0) + p.min(0)) / 2.0
        p = p - c
        return p / np.abs(p).max()

    pairs = [
        (cube(rng.standard_normal((n, 3)).astype(np.float32)),
         cube(rng.standard_normal((n, 3)).astype(np.float32)))
        for _ in range(args.pairs)
    ]

    def ref_pair(x, y):
        d = np.linalg.norm(x[:, None] - y[None, :], axis=-1)
        r, c = linear_sum_assignment(d)
        return d[r, c].sum() / n

    def scipy_mm_pair(x, y):
        d2 = (x * x).sum(1)[:, None] + (y * y).sum(1)[None, :] - 2.0 * (x @ y.T)
        np.maximum(d2, 0, out=d2)
        d = np.sqrt(d2, out=d2)
        r, c = linear_sum_assignment(d)
        return d[r, c].sum() / n

    paths = {"reference": ref_pair, "scipy+mm": scipy_mm_pair}
    # available() can be true with a stale .so that lacks the assignment
    # solver (emd_pair would return None for every pair); register the
    # native path only when the solver symbol is actually present.
    if native.has_lsa():
        paths["native"] = native.emd_pair

    results = {}
    values = {}
    for name, fn in paths.items():
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            vals = [fn(x, y) for x, y in pairs]
            best = min(best, (time.perf_counter() - t0) / args.pairs)
        results[name] = best
        values[name] = vals
        print(json.dumps({
            "path": name, "num_points": n, "pairs": args.pairs,
            "sec_per_pair": round(best, 4),
        }))

    base = values["reference"]
    for name, vals in values.items():
        np.testing.assert_allclose(vals, base, rtol=1e-5)
    summary = {
        f"speedup_{k}_vs_reference": round(results["reference"] / v, 2)
        for k, v in results.items() if k != "reference"
    }
    summary["values_match"] = True
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
