"""Generic training loop: jitted steps, epoch eval, LR control, top-k
checkpoints, TensorBoard + file logging.

This is the TPU-native replacement for PyTorch Lightning's Trainer as the
reference uses it (train_point_ddpm.py:80-89): fit(model, data_module) with
per-epoch validation, two ModelCheckpoint monitors (val_loss + train_loss,
save_top_k=10), TensorBoardLogger scalars/figures, and epoch-stepped LR
schedulers monitoring val_loss.

TPU design points:
  * train/eval steps are jitted once with donated state — the loop body is a
    single XLA program per batch shape; the epoch counter and LR ride in as
    device scalars so schedule changes never recompile.
  * With a Mesh, batches are sharded over the 'data' axis and the state is
    replicated; XLA inserts gradient/batch-stat psums over ICI. The same
    Trainer runs unchanged on 1 chip or a slice.
  * Host<->device traffic per step: one async batch transfer in, one scalar
    metric fetch out (fetched lazily per epoch).
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu.parallel.mesh import shard_batch, shard_state
from shapegen_tpu.train.checkpoints import (
    TopKCheckpointer,
    load_checkpoint,
    save_last_checkpoint,
)
from shapegen_tpu.train.state import get_learning_rate, set_learning_rate


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 500
    ckpt_dir: str = "checkpoints"
    ckpt_prefix: str = "model"
    save_top_k: int = 10
    # Override for the train_loss monitor only (None = same as save_top_k;
    # 0 disables it). On this image the device->host state fetch per
    # admitted save costs ~minutes-worth of epochs over the tunnel
    # (~9 MB/s), and the train monitor admits on every noisy improvement —
    # long runs that only need the best-val checkpoint can turn it off.
    save_top_k_train: Optional[int] = None
    tb_dir: Optional[str] = "lightning_logs"
    tb_name: str = "run"
    seed: int = 24
    log_every_steps: int = 50
    val_every_epochs: int = 1
    save_last_every: int = 1  # rolling last.ckpt cadence (epochs)
    # EXTENSION (no reference equivalent): exponential moving average of the
    # params, updated after every train step on device. None/0 = off (the
    # reference-parity default). When on, every checkpoint payload gets a
    # sibling ``<path>.ema`` orbax directory holding the EMA param tree;
    # eval can swap it in (scripts/eval_conditional.py --use-ema).
    ema_decay: Optional[float] = None
    # Device-trace capture (utils/profiling.py): when profile_dir is set,
    # the first profile_epochs epochs of this fit() are recorded as a
    # jax.profiler trace viewable in TensorBoard/Perfetto.
    profile_dir: Optional[str] = None
    profile_epochs: int = 1


class Trainer:
    def __init__(
        self,
        task,
        config: TrainerConfig,
        mesh=None,
        logger=None,
        epoch_end_hooks: Optional[List[Callable]] = None,
        val_batch_hooks: Optional[List[Callable]] = None,
        sharding_rules: Optional[List] = None,
    ):
        self.task = task
        self.config = config
        self.mesh = mesh
        self.logger = logger
        # Optional (path-regex, PartitionSpec) parameter-sharding rules for
        # N-D meshes (tensor parallelism); None = replicated state, the
        # data-parallel default (parallel.mesh.shard_state).
        self.sharding_rules = sharding_rules
        self.epoch_end_hooks = epoch_end_hooks or []
        # Called per validation batch as hook(trainer, state, epoch,
        # batch_idx, num_val_batches, batch) — the Lightning validation_step
        # side-channel the reference uses for its every-N-batches
        # reconstruction figures (diffusion.py:114-136).
        self.val_batch_hooks = val_batch_hooks or []

        self._train_step = jax.jit(task.train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(task.eval_step)

        # EMA of params (extension, see TrainerConfig.ema_decay). The update
        # is one jitted elementwise pass; donating the old EMA tree keeps it
        # a pure in-place lerp on device.
        self.ema_params = None
        self._ema_update = None
        if config.ema_decay:
            d = float(config.ema_decay)
            assert 0.0 < d < 1.0, f"ema_decay must be in (0, 1), got {d}"
            self._ema_update = jax.jit(
                lambda ema, p: jax.tree_util.tree_map(
                    lambda e, q: d * e + (1.0 - d) * q, ema, p
                ),
                donate_argnums=(0,),
            )

        self.val_ckpt = TopKCheckpointer(
            config.ckpt_dir, "val_loss", config.ckpt_prefix, config.save_top_k
        )
        self.train_ckpt = TopKCheckpointer(
            config.ckpt_dir, "train_loss", config.ckpt_prefix,
            config.save_top_k
            if config.save_top_k_train is None else config.save_top_k_train,
        )

        # Per-epoch metric dicts appended during fit() — programmatic access
        # to what the log lines / TensorBoard scalars carry (used by the
        # multi-process integration harness and available to library users).
        self.history: List[Dict[str, float]] = []

        self.tb = None
        if config.tb_dir is not None:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(
                    os.path.join(config.tb_dir, config.tb_name)
                )
            except ImportError:
                pass

    # ------------------------------------------------------------------ utils
    def _log(self, msg: str):
        if self.logger is not None:
            self.logger.info(msg)

    def _tb_scalars(self, metrics: Dict[str, float], epoch: int):
        if self.tb is None:
            return
        for k, v in metrics.items():
            self.tb.add_scalar(k, v, epoch)

    def add_figure(self, tag: str, fig, epoch: int):
        if self.tb is not None:
            self.tb.add_figure(tag, fig, global_step=epoch)

    def _hook_view(self, state, batch=None, host_batch=None):
        """What figure hooks may safely touch, as (state, batch).

        Single-process: the live (possibly locally-sharded) state and the
        device batch — everything is addressable, behavior unchanged.
        Multi-process: figure hooks run on process 0 only (Lightning logs
        rank-0 figures) and must never dispatch on non-fully-addressable
        arrays (eager slicing/device_get of a pod-sharded global batch
        raises, and a process-0-only jit over the pod-replicated state
        would violate SPMD), so they get the host-local loader batch plus
        a host-local copy of the state. Replication means every process's
        local shard IS the full value, so the copy is a local device read
        — no DCN traffic. Returns (None, None) on non-primary processes.
        """
        if jax.process_count() == 1:
            return state, batch
        if self.sharding_rules:
            # Tensor parallelism breaks the "every local shard IS the full
            # value" premise below: 'model'-axis-sharded leaves hold only a
            # slice per device. Re-replicate first — a collective, so ALL
            # processes execute it (this runs before the process-0 gate);
            # only process 0 then reads its now-full local shards.
            from shapegen_tpu.parallel.mesh import shard_state

            state = shard_state(state, self.mesh, None)
        if jax.process_index() != 0:
            return None, None

        def local(a):
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                return np.asarray(a.addressable_data(0))
            return a

        return jax.tree_util.tree_map(local, state), host_batch

    def _device_batch(self, batch):
        """Host batch -> device(s); exact numerics on partial tail batches.

        Sharding needs the batch dim divisible by the mesh. For a partial
        final batch (len(split) % batch != 0) on a single-process mesh, the
        batch is REPLICATED across the mesh instead of padded: every device
        runs the identical unsharded computation (losses, gradients, and
        BatchNorm batch stats bitwise match the mesh-less/reference path),
        and the output state stays mesh-replicated so the next full batch
        hits the same compiled program. Costs one extra compile for the tail
        shape, nothing else.

        On a multi-process run the tail data is split across hosts; the
        local tails are all-gathered over DCN into the true global tail
        batch and replicated exactly like the single-process path — every
        device computes the real rows once, no padding, no row
        over-weighting (Lightning also processes tail batches unpadded,
        data.py:362-372). Equalized per-host shards (shard_for_host)
        guarantee all hosts reach the tail together with equal shapes, so
        the gather cannot deadlock. Costs one host gather per tail batch.
        """
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        if self.mesh is None:
            return shard_batch(batch, None)
        # Batches shard over the 'data' axis only; model/other axes
        # replicate them, so divisibility is by the data-axis size.
        from shapegen_tpu.parallel.mesh import data_axis_size

        n = data_axis_size(self.mesh)
        local_rows = jax.tree_util.tree_leaves(batch)[0].shape[0]

        if jax.process_count() > 1:
            # Local rows must divide the local device count so the
            # assembled global batch divides the full mesh.
            n_local = max(n // jax.process_count(), 1)
            if local_rows % n_local == 0:
                return shard_batch(batch, self.mesh)
            from jax.experimental import multihost_utils

            from shapegen_tpu.parallel.mesh import replicated_sharding

            batch = multihost_utils.process_allgather(batch, tiled=True)
            return jax.device_put(batch, replicated_sharding(self.mesh))

        if local_rows % n:
            from shapegen_tpu.parallel.mesh import replicated_sharding

            return jax.device_put(batch, replicated_sharding(self.mesh))
        return shard_batch(batch, self.mesh)

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        data_module,
        state=None,
        resume_from: Optional[str] = None,
        start_epoch: int = 0,
    ):
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)

        if data_module.dataset is None:
            data_module.setup()
        train_loader = data_module.train_dataloader()
        val_loader = data_module.val_dataloader()

        if state is None:
            first = next(iter(val_loader if len(val_loader) else train_loader))
            init_rng, rng = jax.random.split(rng)
            state = self.task.init_state(
                init_rng, jax.tree_util.tree_map(jnp.asarray, first)
            )

        scheduler = self.task.make_scheduler()
        if resume_from:
            target = jax.device_get(
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step,
                }
            )
            restored, meta = load_checkpoint(resume_from, target)
            state = state.replace(
                params=jax.device_put(restored["params"]),
                batch_stats=jax.device_put(restored["batch_stats"]),
                opt_state=jax.device_put(restored["opt_state"]),
                step=jnp.asarray(restored["step"]),
            )
            start_epoch = int(meta.get("epoch", -1)) + 1
            sched_state = (meta.get("extra") or {}).get("scheduler")
            if scheduler is not None and sched_state:
                scheduler.load_state_dict(sched_state)
                state = set_learning_rate(state, scheduler.lr)
            self._log(f"Resumed from {resume_from} at epoch {start_epoch}")

        state = shard_state(state, self.mesh, self.sharding_rules)
        # Tasks that close over frozen variables (LatentDiffusionTask's VAE)
        # pin them to the mesh once here — replicated, device-resident for
        # the whole run rather than re-captured per compile.
        if self.mesh is not None and hasattr(self.task, "place_on_mesh"):
            self.task.place_on_mesh(self.mesh)

        if self._ema_update is not None:
            # Resume the EMA tree from the checkpoint's sibling payload when
            # present; otherwise seed it with the current params.
            ema_host = None
            if resume_from:
                from shapegen_tpu.train.checkpoints import (
                    recover_interrupted_save,
                )

                recover_interrupted_save(resume_from + ".ema")
            if resume_from and os.path.isdir(resume_from + ".ema"):
                ema_host, _ = load_checkpoint(
                    resume_from + ".ema", jax.device_get(state.params)
                )
                self._log(f"Resumed EMA params from {resume_from}.ema")
            # Seed with a genuine COPY placed like the live params
            # (replicated or TP-sharded): _ema_update donates its first
            # argument, so aliasing state.params here would delete the live
            # param buffers on the first update.
            self.ema_params = jax.tree_util.tree_map(
                lambda p, s: jax.device_put(
                    jnp.array(p, copy=True),
                    s.sharding if isinstance(s, jax.Array) else None,
                ),
                ema_host if ema_host is not None else state.params,
                state.params,
            )

        # Continue the per-step RNG stream across resumes (fold_in by global
        # step) instead of replaying the first run's noise sequence.
        step = int(jax.device_get(state.step))
        profiling = False
        for epoch in range(start_epoch, cfg.max_epochs):
            if cfg.profile_dir and epoch == start_epoch:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
                self._log(f"profiler trace -> {cfg.profile_dir}")
            t0 = time.time()
            epoch_dev = jnp.asarray(epoch, jnp.int32)

            # ---- train
            train_metrics = defaultdict(list)
            for batch in train_loader:
                batch = self._device_batch(batch)
                step_rng = jax.random.fold_in(rng, step)
                state, metrics = self._train_step(state, batch, step_rng, epoch_dev)
                if self._ema_update is not None:
                    self.ema_params = self._ema_update(
                        self.ema_params, state.params
                    )
                for k, v in metrics.items():
                    train_metrics[k].append(v)
                step += 1

            # ---- validate
            val_metrics = defaultdict(list)
            if (epoch + 1) % cfg.val_every_epochs == 0:
                num_val_batches = len(val_loader)
                # The state is constant across the whole validation loop, so
                # the (pod-only) host-local copy is made ONCE per epoch here
                # — not per batch, where it would read ~3-4x model size off
                # the devices for every batch the hooks then skip.
                hook_state = None
                if self.val_batch_hooks:
                    hook_state, _ = self._hook_view(state)
                for i, batch in enumerate(val_loader):
                    host_batch = batch
                    batch = self._device_batch(batch)
                    v_rng = jax.random.fold_in(rng, 10_000_000 + epoch * 10_000 + i)
                    metrics = self._eval_step(state, batch, v_rng, epoch_dev)
                    for k, v in metrics.items():
                        val_metrics[k].append(v)
                    if hook_state is not None:
                        # Batch view mirrors _hook_view: the device batch is
                        # fully addressable single-process; on a pod, hooks
                        # get the host-local loader batch.
                        h_batch = (
                            batch if jax.process_count() == 1 else host_batch
                        )
                        for hook in self.val_batch_hooks:
                            hook(self, hook_state, epoch, i, num_val_batches,
                                 h_batch)

            # ---- reduce + log (single host sync per epoch)
            epoch_metrics = {
                k: float(np.mean(jax.device_get(v)))
                for k, v in list(train_metrics.items()) + list(val_metrics.items())
            }
            epoch_metrics["lr"] = get_learning_rate(state)
            self.history.append(dict(epoch_metrics))
            self._tb_scalars(epoch_metrics, epoch)
            dt = time.time() - t0
            self._log(
                f"epoch {epoch}: "
                + ", ".join(f"{k}={v:.4f}" for k, v in sorted(epoch_metrics.items()))
                + f" ({dt:.1f}s)"
            )

            # ---- LR schedule (epoch-stepped, monitoring val_loss)
            val_loss = epoch_metrics.get("val_loss")
            if scheduler is not None and val_loss is not None:
                new_lr = scheduler.step(val_loss)
                if abs(new_lr - epoch_metrics["lr"]) > 1e-12:
                    self._log(f"lr -> {new_lr:.3e}")
                state = set_learning_rate(state, new_lr)

            # ---- checkpoints (two monitors, Lightning parity)
            # Decide admission FIRST: the device->host state fetch is the
            # expensive part (the whole params+optimizer tree), so skip it
            # entirely on epochs where nothing would be written.
            train_loss = epoch_metrics.get("train_loss")
            want_val = val_loss is not None and self.val_ckpt.would_save(val_loss)
            want_train = train_loss is not None and self.train_ckpt.would_save(
                train_loss
            )
            want_last = (epoch + 1) % max(cfg.save_last_every, 1) == 0
            # Pod: process 0 owns all checkpoint I/O (checkpoints.py), so
            # other hosts skip the device->host state fetch entirely.
            if jax.process_index() != 0:
                want_val = want_train = want_last = False
            if want_val or want_train or want_last:
                host_state = jax.device_get(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "step": state.step,
                    }
                )
                host_ema = (
                    jax.device_get(self.ema_params)
                    if self.ema_params is not None else None
                )
                extra = {
                    "scheduler": scheduler.state_dict() if scheduler else None,
                }
                if self._ema_update is not None:
                    extra["ema_decay"] = float(cfg.ema_decay)
                if want_val:
                    self.val_ckpt.maybe_save(
                        host_state, epoch, val_loss, self.task.hparams, extra,
                        ema=host_ema,
                    )
                if want_train:
                    self.train_ckpt.maybe_save(
                        host_state, epoch, train_loss, self.task.hparams, extra,
                        ema=host_ema,
                    )
                if want_last:
                    save_last_checkpoint(
                        cfg.ckpt_dir, host_state, epoch, self.task.hparams,
                        extra, ema=host_ema,
                    )

            # ---- user hooks (sample generation figures etc.)
            if self.epoch_end_hooks:
                h_state, _ = self._hook_view(state)
                if h_state is not None:
                    for hook in self.epoch_end_hooks:
                        hook(self, h_state, epoch)

            if profiling and epoch - start_epoch + 1 >= cfg.profile_epochs:
                # Sync so the trace covers real device work, not just the
                # async dispatch stream.
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                self._log(f"profiler trace closed ({cfg.profile_epochs} epochs)")

        if profiling:  # max_epochs < profile_epochs
            jax.profiler.stop_trace()
        if self.tb is not None:
            self.tb.flush()
        return state
