#!/usr/bin/env python
"""Attribute the train-step MFU gap (VERDICT r2 #5).

The 1000-step DDIM sampler runs at ~190 TFLOP/s effective (~96% of the v5e
bf16 MXU peak) while the bf16 train step measured 159 TFLOP/s (~81%). This
harness decomposes the step to locate the missing ~19%:

  fwd_eval      forward only, eval mode (no BN batch stats)
  fwd_train     forward only, train mode (BN batch-stat reductions mutate)
  fwd_bwd       value_and_grad, no optimizer
  full_step     fwd+bwd + AdamW + BN running-stat update (the real step)

plus isolated costs inferred by subtraction (bwd = fwd_bwd - fwd_train,
optimizer = full_step - fwd_bwd) and a control with BatchNorm folded out of
training mode (GroupNorm-free model variant is not available, so the control
replaces train=True with train=False inside the grad — removing the
batch-stat reduction AND its backward while keeping all matmuls).

Each phase prints one JSON line with ms/step and effective TFLOP/s, using
the same 3x-forward FLOP convention and the same data-fetch sync as
benchmarks/bench_train_step.py (block_until_ready can return early through
the axon tunnel).

Optionally captures a jax.profiler trace of the full step
(--trace-dir <dir>) for Perfetto/TensorBoard inspection.
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

from shapegen_tpu import models
from shapegen_tpu.train import tasks

NUM_POINTS = 2048
MACS_PER_POINT = 21.2e6  # see bench_train_step.py


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, carry, steps, result_of):
    """Run fn steps times threading `carry`; sync on result_of(last)."""
    out = fn(carry, 0)
    sync(result_of(out))  # compile + settle
    carry2 = out
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        carry2 = fn(carry2, i)
    sync(result_of(carry2))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    dtype = jnp.dtype(args.compute_dtype)
    batch = args.batch
    model = models.PointUNetLarge(dim=256, time_dim=256, dtype=dtype)
    task = tasks.PointDiffusionTask(model, num_points=NUM_POINTS)
    key = jax.random.PRNGKey(24)
    x = jax.random.normal(key, (batch, NUM_POINTS, 3))
    state0 = task.init_state(jax.random.PRNGKey(0), x)

    fwd_flops = 2 * MACS_PER_POINT * NUM_POINTS * batch
    step_flops = 3 * fwd_flops

    def report(name, dt, flops):
        print(json.dumps({
            "phase": name,
            "ms_per_step": round(dt * 1e3, 2),
            "eff_tflops": round(flops / dt / 1e12, 1),
            "pct_of_full": None,
        }))
        return dt

    # --- fwd, eval mode -----------------------------------------------------
    # The carry is an x-shaped array on EVERY call (including the warmup), so
    # the jit signature never changes — a None->array carry would force a
    # retrace/recompile inside the timed loop and dwarf the steps.
    @jax.jit
    def fwd_eval(prev, i):
        rng = jax.random.fold_in(key, i)
        t = jax.random.uniform(rng, (batch,))
        return model.apply(
            {"params": state0.params, "batch_stats": state0.batch_stats},
            x + 0.0 * prev[:, :1, :1], t, train=False,
        )

    dt_fwd_eval = timeit(fwd_eval, jnp.zeros_like(x), args.steps, lambda o: o)
    report("fwd_eval", dt_fwd_eval, fwd_flops)

    # --- fwd, train mode (BN batch stats computed + returned) ---------------
    @jax.jit
    def fwd_train(prev, i):
        rng = jax.random.fold_in(key, i)
        t = jax.random.uniform(rng, (batch,))
        pred, mutated = model.apply(
            {"params": state0.params, "batch_stats": state0.batch_stats},
            x + 0.0 * prev[:, :1, :1], t, train=True, mutable=["batch_stats"],
        )
        return pred

    dt_fwd_train = timeit(fwd_train, jnp.zeros_like(x), args.steps, lambda o: o)
    report("fwd_train", dt_fwd_train, fwd_flops)

    # --- fwd + bwd (no optimizer) -------------------------------------------
    @jax.jit
    def fwd_bwd(params, i):
        rng = jax.random.fold_in(key, i)
        t = jax.random.uniform(rng, (batch,))
        eps = jax.random.normal(rng, x.shape)

        def loss_fn(p):
            pred, mutated = model.apply(
                {"params": p, "batch_stats": state0.batch_stats},
                x, t, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.abs(eps - pred))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Thread grads back as the carry so steps are not dead code, scaled
        # to keep params numerically unchanged.
        return jax.tree_util.tree_map(lambda p, g: p + 0.0 * g, params, grads)

    dt_fwd_bwd = timeit(fwd_bwd, state0.params, args.steps, lambda o: o)
    report("fwd_bwd", dt_fwd_bwd, step_flops)

    # --- control: fwd+bwd with eval-mode BN (no batch-stat reduction or its
    # backward; running stats are constants) ---------------------------------
    @jax.jit
    def fwd_bwd_frozen_bn(params, i):
        rng = jax.random.fold_in(key, i)
        t = jax.random.uniform(rng, (batch,))
        eps = jax.random.normal(rng, x.shape)

        def loss_fn(p):
            pred = model.apply(
                {"params": p, "batch_stats": state0.batch_stats},
                x, t, train=False,
            )
            return jnp.mean(jnp.abs(eps - pred))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree_util.tree_map(lambda p, g: p + 0.0 * g, params, grads)

    dt_frozen = timeit(
        fwd_bwd_frozen_bn, state0.params, args.steps, lambda o: o
    )
    report("fwd_bwd_frozen_bn", dt_frozen, step_flops)

    # --- the full real step ---------------------------------------------------
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))
    # Donation consumes state0's buffers; keep a live copy for later phases.
    state_copy = jax.tree_util.tree_map(lambda a: a + 0, state0)

    def full(state, i):
        state, m = step_fn(state, x, jax.random.fold_in(key, i), jnp.int32(0))
        return state

    dt_full = timeit(
        full, state0, args.steps, lambda s: s.step
    )
    report("full_step", dt_full, step_flops)

    # --- host->device input transfer per step (the trainer's real loop
    # feeds numpy batches). Synced per call, so this INCLUDES one tunnel RTT;
    # the rtt phase below isolates that so transfer = xfer - rtt. ------------
    x_host = np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        sync(jnp.asarray(x_host))
    dt_xfer = (time.perf_counter() - t0) / args.steps

    tiny = jnp.zeros((1,))
    sync(tiny)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        sync(tiny)
    dt_rtt = (time.perf_counter() - t0) / args.steps

    # --- the real trainer loop shape: a FRESH numpy batch fed every step,
    # nothing fetched until the end. If async dispatch overlaps the
    # host->device copies with compute, this approaches full_step; if the
    # tunnel serializes copy and compute, it approaches full_step + xfer. ----
    batches = [
        np.asarray(x_host + np.float32(i % 7) * 1e-6) for i in range(8)
    ]
    state = state_copy
    state, _ = step_fn(state, batches[0], jax.random.fold_in(key, 0), jnp.int32(0))
    sync(state.step)
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        state, _ = step_fn(
            state, batches[i % 8], jax.random.fold_in(key, i), jnp.int32(0)
        )
    sync(state.step)
    dt_feed = (time.perf_counter() - t0) / args.steps
    report("full_step_numpy_feed", dt_feed, step_flops)

    print(json.dumps({
        "derived": {
            "bwd_ms": round((dt_fwd_bwd - dt_fwd_train) * 1e3, 2),
            "optimizer_ms": round((dt_full - dt_fwd_bwd) * 1e3, 2),
            "bn_train_fwd_ms": round((dt_fwd_train - dt_fwd_eval) * 1e3, 2),
            "bn_total_ms": round((dt_fwd_bwd - dt_frozen) * 1e3, 2),
            "input_transfer_synced_ms": round(dt_xfer * 1e3, 2),
            "tunnel_rtt_ms": round(dt_rtt * 1e3, 2),
            "input_transfer_ms": round((dt_xfer - dt_rtt) * 1e3, 2),
            "numpy_feed_overhead_ms": round((dt_feed - dt_full) * 1e3, 2),
            "fwd_eval_tflops": round(fwd_flops / dt_fwd_eval / 1e12, 1),
            "full_step_tflops": round(step_flops / dt_full / 1e12, 1),
            "numpy_feed_tflops": round(step_flops / dt_feed / 1e12, 1),
        }
    }))

    if args.trace_dir:
        from shapegen_tpu.utils.profiling import trace

        with trace(args.trace_dir):
            for i in range(3):
                state = full(state, i)
            sync(state.step)
        print(json.dumps({"trace_dir": args.trace_dir}))


if __name__ == "__main__":
    main()
