#!/usr/bin/env python
"""On-chip A/B: VAE train-step with the XLA chamfer vs the Pallas custom-VJP.

The chamfer reconstruction loss is differentiated inside SimplePointNetVAE
and PointNetVAE training (reference networks.py:1300, 1631). The XLA path
materializes the (B, N, M) distance tensor through fwd AND bwd (B=16,
N=M=2048 -> 268 MB of f32 HBM traffic each way); the streaming Pallas
kernel with its custom VJP (ops/pallas_kernels.py) keeps O(B(N+M)) HBM and
scatters gradients to the matched pairs. This measures the full jitted
train step (fwd+bwd+AdamW) both ways on the real chip.

Run on TPU: PYTHONPATH=... python benchmarks/bench_vae_chamfer_vjp.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shapegen_tpu import models  # noqa: E402
from shapegen_tpu.metrics import metrics as M  # noqa: E402
from shapegen_tpu.train import tasks  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--latent-dim", type=int, default=256)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--task", default="simple_pointnet",
                   choices=["simple_pointnet", "pointnet"])
    p.add_argument("--loss-only", action="store_true", default=False,
                   help="measure value_and_grad of the chamfer loss alone "
                        "(isolates the kernel from the model-dominated "
                        "train step; also the regime where the XLA path's "
                        "(B,N,M) tensor can exceed HBM at large N)")
    p.add_argument("--loss-iters", type=int, default=16,
                   help="chamfer-grad steps chained inside one program "
                        "(amortizes the ~30 ms per-dispatch tunnel cost)")
    p.add_argument("--out", default=None)
    return p.parse_args()


def sync(tree):
    # Data-fetch barrier (block_until_ready can return early on the axon
    # tunnel; see bench.py).
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def measure(args, use_pallas: bool) -> float:
    M._PALLAS_OVERRIDE = use_pallas  # routes chamfer_distance in the loss
    if args.task == "simple_pointnet":
        task = tasks.SimplePointNetVAETask(
            models.SimplePointNetVAE(
                num_points=args.num_points, latent_dim=args.latent_dim
            )
        )
    else:
        task = tasks.PointNetVAETask(
            models.PointNetVAE(
                num_points=args.num_points, latent_dim=args.latent_dim
            )
        )
    batch = jax.random.normal(
        jax.random.PRNGKey(0), (args.batch, args.num_points, 3)
    )
    state = task.init_state(jax.random.PRNGKey(1), batch)
    step = jax.jit(task.train_step, donate_argnums=(0,))
    epoch = jnp.asarray(0, jnp.int32)

    state, m = step(state, batch, jax.random.PRNGKey(2), epoch)  # compile
    sync(m)
    best = float("inf")
    for i in range(args.repeats):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(3), i), epoch)
        sync(m)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_loss_only(args, use_pallas: bool) -> float:
    """Per-iteration time of value_and_grad of the chamfer loss alone.

    Chains --loss-iters gradient steps inside ONE jitted lax.scan (each
    step feeds the next through a tiny update, so nothing is dead-code
    eliminated) and divides by the count: per-program dispatch through the
    axon tunnel costs ~30 ms, which would otherwise swamp the kernel
    difference at small N."""
    K = args.loss_iters
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (args.batch, args.num_points, 3))
    y = jax.random.normal(
        jax.random.fold_in(key, 1), (args.batch, args.num_points, 3)
    )

    @jax.jit
    def loop(x, y):
        def body(x, _):
            v, g = jax.value_and_grad(
                lambda x: M.chamfer_distance(x, y, use_pallas=use_pallas)
            )(x)
            return x - 1e-6 * g, v
        return jax.lax.scan(body, x, None, length=K)

    xo, vs = loop(x, y)  # compile
    sync(vs)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        xo, vs = loop(x, y)
        sync(vs)
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    args = parse_args()
    fn = measure_loss_only if args.loss_only else measure
    ms_xla = fn(args, use_pallas=False) * 1e3
    ms_pallas = fn(args, use_pallas=True) * 1e3
    key = "chamfer_grad_ms" if args.loss_only else "train_step_ms"
    result = {
        "task": "loss_only" if args.loss_only else args.task,
        "batch": args.batch,
        "num_points": args.num_points,
        f"{key}_xla_chamfer": round(ms_xla, 2),
        f"{key}_pallas_vjp_chamfer": round(ms_pallas, 2),
        "speedup": round(ms_xla / ms_pallas, 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
