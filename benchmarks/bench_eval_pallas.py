#!/usr/bin/env python
"""On-chip benchmark of the coverage/MMD eval hot path: the pairwise
Chamfer matrix via the XLA formulation vs the streaming Pallas kernel.

The coverage/MMD/1-NNA extensions reduce a (G, R) matrix of pairwise CDs
over 2048-point clouds (reference CD: metrics.py:23-47). The XLA path
materializes (block, R, N, M) distance tensors in HBM; the Pallas kernel
streams y-tiles through VMEM and writes only O(N+M) per pair.

Prints one JSON line: {"xla_s": ..., "pallas_s": ..., "speedup": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from shapegen_tpu.metrics import metrics

G, R, N = 32, 32, 2048


def sync(x):
    # data-fetch barrier (block_until_ready can return early on the tunnel)
    np.asarray(jax.device_get(x))


def time_path(fn, repeats=2):
    sync(fn())  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(24)
    gen = jax.random.normal(key, (G, N, 3), jax.numpy.float32)
    ref = jax.random.normal(jax.random.fold_in(key, 1), (R, N, 3))

    t_xla = time_path(
        lambda: metrics.pairwise_chamfer_matrix(gen, ref, use_pallas=False)
    )
    t_pallas = time_path(
        lambda: metrics.pairwise_chamfer_matrix(gen, ref, use_pallas=True)
    )
    # sanity: both paths agree
    a = np.asarray(jax.device_get(
        metrics.pairwise_chamfer_matrix(gen, ref, use_pallas=False)))
    b = np.asarray(jax.device_get(
        metrics.pairwise_chamfer_matrix(gen, ref, use_pallas=True)))
    max_diff = float(np.abs(a - b).max())
    print(json.dumps({
        "pairs": G * R, "points": N,
        "xla_s": round(t_xla, 4), "pallas_s": round(t_pallas, 4),
        "speedup": round(t_xla / t_pallas, 2),
        "max_abs_diff": max_diff,
    }))


if __name__ == "__main__":
    main()
