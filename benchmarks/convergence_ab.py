#!/usr/bin/env python
"""Full-pipeline convergence A/B: reference-equivalent torch vs framework.

The f64 lockstep test (tests/test_grad_parity.py) proves single-step
equivalence; this proves nothing diverges over a realistic horizon with the
data pipeline in the loop. Both sides train the same architecture from the
SAME initial weights (torch init transplanted into flax) on the same
synthetic dataset and split (seed 24), each with its own shuffling and
noise draws — the trajectories must agree to within run-to-run noise.

torch side = reference training semantics (train_point_ddpm.py:25-99 /
diffusion.py:56-86): PointUNet forward, t ~ U(0,1), offset-cosine rates,
L1 eps-loss, AdamW(1e-4, wd 1e-5), ReduceLROnPlateau(0.5, 5) on val_loss.
framework side = the real Trainer.fit + PointCloudDataDirectoryModule.

Writes a JSON artifact with both per-epoch {train,val} curves and prints a
comparison summary. CPU-only (torch has no TPU here); run with
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--num-points", type=int, default=256)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=24)
    p.add_argument("--legs", default="both",
                   choices=["both", "torch", "framework"],
                   help="run one leg only (partial history saved to "
                        "<out>.<leg>.json; the second run merges them). "
                        "Lets the framework leg run on the TPU without the "
                        "torch leg holding the single-client tunnel for "
                        "its hour-long CPU grind.")
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "artifacts", "convergence_ab_r4.json"))
    return p.parse_args()


def torch_cosine_rates(t):
    """Offset-cosine rates (core/schedules.py:36-48; diffusion.py:207-223)."""
    import torch

    min_rate, max_rate = 0.02, 0.95
    start = torch.acos(torch.tensor(max_rate, dtype=t.dtype))
    end = torch.acos(torch.tensor(min_rate, dtype=t.dtype))
    angles = start + t * (end - start)
    return torch.sin(angles), torch.cos(angles)  # noise, signal


def run_torch(oracle, ds, train_idx, val_idx, args):
    """Reference-equivalent training loop (diffusion.py:56-136 semantics)."""
    import torch

    g = torch.Generator().manual_seed(args.seed)
    opt = torch.optim.AdamW(oracle.parameters(), lr=1e-4, weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.5, patience=5
    )

    def batch_points(idx):
        return torch.tensor(
            np.stack([ds[i] for i in idx]), dtype=torch.float32
        )

    def eps_loss(points):
        t = torch.rand(points.shape[0], generator=g)
        eps = torch.randn(points.shape, generator=g)
        nr, sr = torch_cosine_rates(t)
        x_t = sr[:, None, None] * points + nr[:, None, None] * eps
        pred = oracle(x_t, t)
        return torch.nn.functional.l1_loss(eps, pred)

    history = []
    B = args.batch_size
    for epoch in range(args.epochs):
        oracle.train()
        perm = torch.randperm(len(train_idx), generator=g).numpy()
        tr_losses = []
        for s in range(0, len(train_idx), B):
            batch = batch_points(train_idx[perm[s : s + B]])
            loss = eps_loss(batch)
            opt.zero_grad()
            loss.backward()
            opt.step()
            tr_losses.append(float(loss.detach()))
        oracle.eval()
        va_losses = []
        with torch.no_grad():
            for s in range(0, len(val_idx), B):
                batch = batch_points(val_idx[s : s + B])
                va_losses.append(float(eps_loss(batch)))
        entry = {
            "train_loss": float(np.mean(tr_losses)),
            "val_loss": float(np.mean(va_losses)),
            "lr": opt.param_groups[0]["lr"],
        }
        sched.step(entry["val_loss"])
        history.append(entry)
        print(f"[torch] epoch {epoch}: {entry}")
        # Crash-safe partial: the torch leg costs minutes/epoch at flagship
        # scale — persist after every epoch so an interrupted run still
        # leaves a mergeable history.
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(f"{args.out}.torch.partial.json", "w") as f:
                json.dump(history, f)
    return history


def main():
    args = parse_args()
    import torch

    from transplant_utils import PointUNetOracle, pointunet_trees

    torch.manual_seed(args.seed)
    oracle = PointUNetOracle(dim=args.dim, time_dim=args.dim)
    params0, stats0 = pointunet_trees(oracle)

    # ---- framework side: real Trainer.fit over the real data pipeline ----
    import jax
    import jax.numpy as jnp

    from shapegen_tpu import models
    from shapegen_tpu.data import PointCloudDataDirectoryModule
    from shapegen_tpu.train import Trainer, TrainerConfig, tasks

    dm = PointCloudDataDirectoryModule(
        args.data_dir, num_points=args.num_points,
        batch_size=args.batch_size, num_workers=1,
        output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"], seed=args.seed,
    )
    dm.setup()
    hist_jax = hist_torch = None
    if args.legs in ("both", "framework"):
        task = tasks.PointDiffusionTask(
            models.PointUNetLarge(dim=args.dim, time_dim=args.dim),
            num_points=args.num_points, lr=1e-4,
        )
        first = np.stack(
            [dm.dataset[i] for i in dm.val_indices[: args.batch_size]]
        )
        state = task.init_state(jax.random.PRNGKey(0), jnp.asarray(first))
        # Identical starting point: transplant the torch init into the state.
        state = state.replace(
            params=jax.device_put(params0), batch_stats=jax.device_put(stats0)
        )
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            cfg = TrainerConfig(
                max_epochs=args.epochs, ckpt_dir=os.path.join(tmp, "ck"),
                tb_dir=None, save_top_k=0, save_last_every=10**6,
                seed=args.seed,
            )
            trainer = Trainer(task, cfg)
            trainer.fit(dm, state=state)
        hist_jax = trainer.history

    # ---- torch side: same split, reference loop --------------------------
    if args.legs in ("both", "torch"):
        hist_torch = run_torch(oracle, dm.dataset, dm.train_indices,
                               dm.val_indices, args)

    # Single-leg runs: persist the partial history and merge with the other
    # leg's file when it already exists (both runs are deterministic in
    # (seed, config), so split/init/shuffle streams match across processes).
    if args.legs != "both":
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        part = f"{args.out}.{args.legs}.json"
        with open(part, "w") as f:
            json.dump(hist_jax if args.legs == "framework" else hist_torch, f)
        print(f"wrote {part}")
        other = (
            f"{args.out}.torch.json" if args.legs == "framework"
            else f"{args.out}.framework.json"
        )
        if not os.path.exists(other):
            print(f"waiting for the other leg ({other}) before summarizing")
            return
        with open(other) as f:
            if args.legs == "framework":
                hist_torch = json.load(f)
            else:
                hist_jax = json.load(f)

    val_j = np.array([h["val_loss"] for h in hist_jax])
    val_t = np.array([h["val_loss"] for h in hist_torch])
    tail = slice(-5, None)  # late-trajectory agreement (past the initial
    # transient, where per-run noise dominates)
    tail_gap = float(np.abs(val_j[tail].mean() - val_t[tail].mean())
                     / val_t[tail].mean())
    summary = {
        "epochs": args.epochs,
        "num_points": args.num_points,
        "dim": args.dim,
        "batch_size": args.batch_size,
        "dataset": {
            "train": int(len(dm.train_indices)),
            "val": int(len(dm.val_indices)),
        },
        "framework_history": hist_jax,
        "torch_history": hist_torch,
        "final_val": {"framework": float(val_j[-1]), "torch": float(val_t[-1])},
        "tail5_mean_val": {
            "framework": float(val_j[tail].mean()),
            "torch": float(val_t[tail].mean()),
        },
        "tail5_relative_gap": tail_gap,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nfinal val: framework {val_j[-1]:.4f} vs torch {val_t[-1]:.4f}; "
          f"tail-5 mean gap {tail_gap:.2%}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
