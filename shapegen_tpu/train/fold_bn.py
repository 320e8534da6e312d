"""Inference-time BatchNorm folding.

For eval/sampling, BatchNorm with running stats is an affine map that can be
folded into the preceding Dense kernel:

    BN(Wx + b) = s*(Wx + b - mu)/sqrt(v + eps) + c  ==  W'x + b'
    W' = W * (s / sqrt(v + eps)),  b' = (b - mu) * s / sqrt(v + eps) + c

This transform rewrites every ``DenseBN``-shaped subtree (Dense_0 +
BatchNorm_0 siblings — the Conv1d(k1)+BN rungs of all point models) to the
folded kernel and *neutralizes* the BN (scale=1, bias=0, mean=0,
var=1-eps), so the same model code applies an exact identity normalization
that XLA folds away. Pure-eval optimization: do NOT train on folded params.

Measured on the v5e chip: folding is throughput-neutral for the 1000-step
sampler (6.18 vs 6.19 ms/step) — the denoiser runs at ~97% MXU utilization
and XLA fully hides the BN elementwise work under the matmuls. Kept as a
serving/export utility (simpler exported graphs, fewer constants), not a
perf lever.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

EPS = 1e-5


def _fold_pair(dense: Dict, bn_params: Dict, bn_stats: Dict):
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + EPS)
    new_kernel = dense["kernel"] * inv[None, :]
    bias = dense.get("bias", 0.0)
    new_bias = (bias - bn_stats["mean"]) * inv + bn_params["bias"]
    folded_dense = dict(dense, kernel=new_kernel, bias=new_bias)
    neutral_params = {
        "scale": jnp.ones_like(bn_params["scale"]),
        "bias": jnp.zeros_like(bn_params["bias"]),
    }
    neutral_stats = {
        "mean": jnp.zeros_like(bn_stats["mean"]),
        "var": jnp.full_like(bn_stats["var"], 1.0 - EPS),
    }
    return folded_dense, neutral_params, neutral_stats


def fold_batchnorm(params: Any, batch_stats: Any) -> Tuple[Any, Any]:
    """Return (folded_params, neutralized_batch_stats) for inference.

    Recursively folds every {Dense_0, BatchNorm_0} sibling pair (the DenseBN
    rung pattern). Other BN instances (e.g. following convs or the split
    first rung where two Denses feed one BN) are left untouched.
    """

    def walk(p: Any, s: Any, name: str = ""):
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else s
        # Only true DenseBN submodules — a bare {Dense_0, BatchNorm_0} sibling
        # pattern also occurs spuriously at model top level (split-rung BN
        # next to refine Denses), where folding would be wrong.
        if (
            name.split("/")[-1].startswith("DenseBN")
            and isinstance(s, dict)
            and "Dense_0" in p
            and "BatchNorm_0" in p
            and "BatchNorm_0" in s
        ):
            folded, nparams, nstats = _fold_pair(
                p["Dense_0"], p["BatchNorm_0"], s["BatchNorm_0"]
            )
            p["Dense_0"] = folded
            p["BatchNorm_0"] = nparams
            s["BatchNorm_0"] = nstats
        for k in p:
            child_s = s.get(k, {}) if isinstance(s, dict) else {}
            p[k], new_child_s = walk(p[k], child_s, f"{name}/{k}")
            if isinstance(s, dict) and k in s:
                s[k] = new_child_s
        return p, s

    return walk(params, batch_stats)
