"""Subprocess worker for the REAL multi-process (pod) integration test.

Launched by tests/test_distributed.py, once per simulated host. Each process
owns `--devices-per-process` virtual CPU devices and joins a
``jax.distributed`` job over Gloo — the same code path a TPU pod runs over
DCN (initialize -> per-host dataset shards -> global batch assembly via
``make_array_from_process_local_data`` -> data-sharded jitted steps with
cross-process collectives).

Phases (run order A, C, [D, D2 with --tp-phase], B), results in ``--out``
(npz; the tp_* keys only exist when --tp-phase is given):

  A. *Exact-step parity*: every process slices its rows of one canonical
     global batch, so the assembled global batch is identical to what a
     single-process run sees; 3 train steps from an identical init must then
     produce the same losses/params regardless of process topology.
  C. *Partial (tail) global batch*: a 6-row global batch exercises the
     process_allgather+replicate tail path — no padding, no row
     over-weighting (tail_loss/tail_params).
  D. *Tensor parallelism on the pod's production layout*: flagship TP rules
     on a C-order (data, model) mesh — 'model' pairs are process-LOCAL
     (TP over intra-host ICI, DP across hosts over DCN, the layout the
     Trainer's per-host data shards require) — one exact step + a 1-epoch
     Trainer.fit with pod-safe figure hooks (tp_loss/tp_params/
     tp_fit_params/tp_history).
  D2. *Cross-process TP collectives*: the same exact step on a TRANSPOSED
     mesh whose 'model' pairs straddle the two processes, batch fully
     replicated — the activation psum over 'model' really rides Gloo
     (tpx_loss/tpx_params).
  B. *Real Trainer.fit*: 2 epochs through PointCloudDataDirectoryModule
     (per-host equalized shards, prefetch loaders) on a full global mesh —
     the end-to-end pod training path.

This file is NOT collected by pytest (no test_ prefix in its functions).
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="127.0.0.1:29871")
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--local-batch", type=int, default=4)
    ap.add_argument("--resume-from", default=None,
                    help="checkpoint path for the phase-B fit (pod resume: "
                    "every process restores process-0's last.ckpt)")
    ap.add_argument("--tp-phase", action="store_true",
                    help="also run phase D (tensor parallelism on a 2-D "
                    "global mesh; costs a flagship-model step + mini-fit)")
    args = ap.parse_args()

    # Platform setup must precede the first jax import (conftest.py pattern).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices_per_process}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes * args.devices_per_process

    import hashlib

    import jax.numpy as jnp
    import numpy as np

    from shapegen_tpu import models
    from shapegen_tpu.data import PointCloudDataDirectoryModule
    from shapegen_tpu.parallel import make_mesh, replicate_state, shard_batch
    from shapegen_tpu.train import Trainer, TrainerConfig, tasks

    mesh = make_mesh()  # full global mesh — mandatory on pods

    def flat_params(params):
        leaves = jax.tree_util.tree_leaves(jax.device_get(params))
        return np.concatenate(
            [np.asarray(l, np.float64).ravel() for l in leaves]
        )

    # ---- Phase A: exact-step parity on a canonical global batch ----------
    NUM_POINTS, G = 32, 16
    canonical = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (G, NUM_POINTS, 3)),
        np.float32,
    )
    task = tasks.PointDiffusionTask(
        models.SimplePointUNet(dim=32, time_dim=32),
        num_points=NUM_POINTS, lr=1e-3,
    )
    state = task.init_state(jax.random.PRNGKey(1), jnp.asarray(canonical[:2]))
    state = replicate_state(state, mesh)
    per = G // args.num_processes
    local = canonical[args.process_id * per : (args.process_id + 1) * per]
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))
    step_losses = []
    step1_params = None
    for i in range(3):
        batch = shard_batch(jnp.asarray(local), mesh)
        state, metrics = step_fn(
            state, batch,
            jax.random.fold_in(jax.random.PRNGKey(5), i),
            jnp.asarray(0, jnp.int32),
        )
        step_losses.append(float(metrics["train_loss"]))
        if i == 0:
            # After ONE step the only cross-topology difference is the
            # reduction order of the gradient psum (~1e-7 relative); later
            # steps let Adam's eps-normalized updates amplify that noise
            # chaotically, so exact comparisons only make sense here.
            step1_params = flat_params(state.params)
    step_params = flat_params(state.params)

    # ---- Phase C: partial (tail) global batch ----------------------------
    # 6 global rows: single-process 6 % 8 devices != 0 -> replicated path;
    # 2-process 3 local % 4 local devices != 0 -> process_allgather +
    # replicate. Both compute the identical global tail batch on every
    # device, so losses/params must agree across topologies (the pod pad
    # path this replaced over-weighted repeated rows).
    G_TAIL = 6
    per_t = G_TAIL // args.num_processes
    local_t = canonical[args.process_id * per_t : (args.process_id + 1) * per_t]
    state_c = task.init_state(jax.random.PRNGKey(1), jnp.asarray(canonical[:2]))
    state_c = replicate_state(state_c, mesh)
    placer = Trainer(
        task,
        TrainerConfig(max_epochs=1, tb_dir=None, save_top_k=0,
                      ckpt_dir=os.path.join(args.workdir, f"tail{args.process_id}")),
        mesh=mesh,
    )
    batch_c = placer._device_batch(jnp.asarray(local_t))
    assert batch_c.shape[0] == G_TAIL, batch_c.shape  # real rows, no padding
    state_c, metrics_c = jax.jit(task.train_step, donate_argnums=(0,))(
        state_c, batch_c,
        jax.random.fold_in(jax.random.PRNGKey(6), 0),
        jnp.asarray(0, jnp.int32),
    )
    tail_loss = float(metrics_c["train_loss"])
    tail_params = flat_params(state_c.params)

    # ---- Phase D: tensor parallelism on the pod (2-D global mesh) --------
    # One exact train step of the flagship denoiser on the production
    # (data, model) layout: make_mesh's C-order reshape keeps each 'model'
    # pair process-local (TP over intra-host ICI; the DATA axis is what
    # crosses Gloo), which is also the only layout compatible with per-host
    # dataset shards. Params/BN-stats/moments are rules-sharded over
    # 'model'; plus a 1-epoch Trainer.fit with sharding_rules and the
    # pod-safe figure hooks (the hook state must arrive re-replicated —
    # full-width leaves — on process 0 only). Phase D2 below covers the
    # cross-process 'model' collective.
    tp_extra = {}
    if args.tp_phase:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from shapegen_tpu.models.point_unet import POINT_UNET_LARGE_TP_RULES
        from shapegen_tpu.parallel import shard_state

        mesh_tp = make_mesh(
            axis_names=("data", "model"),
            mesh_shape=(jax.device_count() // 2, 2),
        )
        task_tp = tasks.PointDiffusionTask(
            models.PointUNetLarge(dim=32, time_dim=32),
            num_points=NUM_POINTS, lr=1e-3,
        )
        canon_tp = np.asarray(
            jax.random.normal(jax.random.PRNGKey(11), (8, NUM_POINTS, 3)),
            np.float32,
        )
        state_tp = task_tp.init_state(
            jax.random.PRNGKey(3), jnp.asarray(canon_tp[:2])
        )
        state_tp = shard_state(state_tp, mesh_tp, POINT_UNET_LARGE_TP_RULES)
        # The column-parallel kernel is REALLY distributed: each device
        # holds half the 2048 output columns.
        kern = state_tp.params["DenseBN_0"]["Dense_0"]["kernel"]
        assert kern.addressable_shards[0].data.shape == (1024, 1024), (
            kern.addressable_shards[0].data.shape
        )
        per_tp = 8 // args.num_processes
        local_tp = canon_tp[
            args.process_id * per_tp:(args.process_id + 1) * per_tp
        ]
        batch_tp = shard_batch(jnp.asarray(local_tp), mesh_tp)
        state_tp, m_tp = jax.jit(task_tp.train_step, donate_argnums=(0,))(
            state_tp, batch_tp,
            jax.random.fold_in(jax.random.PRNGKey(12), 0),
            jnp.asarray(0, jnp.int32),
        )
        tp_loss = float(m_tp["train_loss"])
        # Model-sharded leaves are not fully addressable on a pod; gather
        # to replicated inside jit (an SPMD collective every process
        # executes) before the host fetch.
        gather = jax.jit(
            lambda t: t, out_shardings=NamedSharding(mesh_tp, P())
        )
        tp_params = flat_params(gather(state_tp.params))

        # ---- Phase D2: the 'model' axis REALLY crossing the boundary ----
        # Transposed device layout: model pairs are (i, i + n/2), i.e. one
        # device from each process, so the TP activation/gradient psums over
        # 'model' execute over Gloo. The batch is fully replicated (every
        # process holds all 8 canonical rows — a per-host-shard input is
        # impossible on this layout, which is why phase D uses the C-order
        # mesh), so the global step is identical math to phase D and must
        # reproduce its loss/params up to reduction-order noise.
        devs_x = np.asarray(jax.devices()).reshape(2, -1).T
        mesh_x = Mesh(devs_x, ("data", "model"))
        if args.num_processes > 1:
            for row in mesh_x.devices:
                assert {d.process_index for d in row} == {0, 1}, row
        state_x = task_tp.init_state(
            jax.random.PRNGKey(3), jnp.asarray(canon_tp[:2])
        )
        state_x = shard_state(state_x, mesh_x, POINT_UNET_LARGE_TP_RULES)
        kern_x = state_x.params["DenseBN_0"]["Dense_0"]["kernel"]
        assert kern_x.addressable_shards[0].data.shape == (1024, 1024)
        batch_x = jax.make_array_from_process_local_data(
            NamedSharding(mesh_x, P()), canon_tp
        )
        state_x, m_x = jax.jit(task_tp.train_step, donate_argnums=(0,))(
            state_x, batch_x,
            jax.random.fold_in(jax.random.PRNGKey(12), 0),
            jnp.asarray(0, jnp.int32),
        )
        tpx_loss = float(m_x["train_loss"])
        gather_x = jax.jit(
            lambda t: t, out_shardings=NamedSharding(mesh_x, P())
        )
        tpx_params = flat_params(gather_x(state_x.params))

        # TP mini-fit with the pod-safe figure hooks.
        tp_hook = {"val": 0, "epoch": 0, "kernel_shape": (0, 0)}

        def tp_val_hook(tr, h_state, epoch, batch_idx, num_val_batches,
                        batch):
            k = np.asarray(jax.device_get(
                h_state.params["DenseBN_0"]["Dense_0"]["kernel"]
            ))
            tp_hook["kernel_shape"] = tuple(k.shape)
            assert np.isfinite(k).all()
            tp_hook["val"] += 1

        def tp_epoch_hook(tr, h_state, epoch):
            tp_hook["epoch"] += 1

        dm_tp = PointCloudDataDirectoryModule(
            args.data_dir, num_points=NUM_POINTS,
            batch_size=args.local_batch, num_workers=1,
            output_mode="point_clouds", augmentations=False,
            relevant_object_categories=["all"],
        )
        trainer_tp = Trainer(
            task_tp,  # stateless pure-function holder — safe to reuse
            TrainerConfig(
                max_epochs=1,
                ckpt_dir=os.path.join(args.workdir, f"cktp{args.process_id}"),
                ckpt_prefix="tp", tb_dir=None, save_top_k=0,
            ),
            mesh=mesh_tp, sharding_rules=POINT_UNET_LARGE_TP_RULES,
            epoch_end_hooks=[tp_epoch_hook], val_batch_hooks=[tp_val_hook],
        )
        tp_fit_state = trainer_tp.fit(dm_tp)
        if args.num_processes > 1 and args.process_id != 0:
            assert tp_hook == {
                "val": 0, "epoch": 0, "kernel_shape": (0, 0)
            }, tp_hook
        else:
            assert tp_hook["val"] >= 1 and tp_hook["epoch"] >= 1, tp_hook
            # The hook state arrived FULL-width (re-replicated on pods).
            assert tp_hook["kernel_shape"] == (1024, 2048), tp_hook
        tp_extra = {
            "tp_loss": np.asarray(tp_loss),
            "tp_params": tp_params,
            "tpx_loss": np.asarray(tpx_loss),
            "tpx_params": tpx_params,
            "tp_fit_params": flat_params(gather(tp_fit_state.params)),
            "tp_history": json.dumps(trainer_tp.history),
        }

    # ---- Phase B: real Trainer.fit over per-host dataset shards ----------
    dm = PointCloudDataDirectoryModule(
        args.data_dir, num_points=NUM_POINTS, batch_size=args.local_batch,
        num_workers=1, output_mode="point_clouds", augmentations=False,
        relevant_object_categories=["all"],
    )
    task2 = tasks.PointDiffusionTask(
        models.SimplePointUNet(dim=32, time_dim=32),
        num_points=NUM_POINTS, lr=1e-3,
    )
    cfg = TrainerConfig(
        max_epochs=args.epochs,
        ckpt_dir=os.path.join(args.workdir, f"ck{args.process_id}"),
        ckpt_prefix="pod", tb_dir=None, save_top_k=1,
    )

    # Figure-hook pod-safety probe: hooks must fire on process 0 only, and
    # what they receive must survive the exact ops the real figure hooks do
    # (eager slicing + device_get of the batch, a hook-state forward —
    # train_point_ddpm.py's reconstruction figures). On a pod the raw global
    # batch/state would raise here; Trainer._hook_view localizes both.
    hook_calls = {"val": 0, "epoch": 0}

    def probe_val_hook(tr, h_state, epoch, batch_idx, num_val_batches, batch):
        pts = batch[0] if isinstance(batch, (tuple, list)) else batch
        mid = pts.shape[0] // 2
        x = np.asarray(jax.device_get(pts[mid : mid + 1]))
        assert x.shape[1:] == (NUM_POINTS, 3), x.shape
        out = task2.sample3(
            h_state, jnp.asarray(x), jnp.full((1,), 0.01), num_steps=2
        )
        assert np.isfinite(np.asarray(jax.device_get(out))).all()
        hook_calls["val"] += 1

    def probe_epoch_hook(tr, h_state, epoch):
        hook_calls["epoch"] += 1

    trainer = Trainer(
        task2, cfg, mesh=mesh,
        epoch_end_hooks=[probe_epoch_hook], val_batch_hooks=[probe_val_hook],
    )
    final_state = trainer.fit(dm, resume_from=args.resume_from)
    if args.num_processes > 1 and args.process_id != 0:
        assert hook_calls == {"val": 0, "epoch": 0}, hook_calls
    else:
        # >=1, not ==epochs: a resumed fit runs only the remaining epochs.
        assert hook_calls["val"] >= 1, hook_calls
        assert hook_calls["epoch"] >= 1, hook_calls
    fit_params = flat_params(final_state.params)

    np.savez(
        args.out,
        step_losses=np.asarray(step_losses),
        step1_params=step1_params,
        step_params=step_params,
        tail_loss=np.asarray(tail_loss),
        tail_params=tail_params,
        fit_params=fit_params,
        fit_step=np.asarray(int(jax.device_get(final_state.step))),
        history=json.dumps(trainer.history),
        train_shard=np.asarray(dm.train_indices),
        val_shard=np.asarray(dm.val_indices),
        process_count=args.num_processes,
        device_count=jax.device_count(),
        **tp_extra,
    )
    print(
        f"[worker {args.process_id}/{args.num_processes}] OK "
        f"devices={jax.device_count()} "
        f"step_losses={step_losses} "
        f"fit_sha={hashlib.sha256(fit_params.tobytes()).hexdigest()[:12]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
