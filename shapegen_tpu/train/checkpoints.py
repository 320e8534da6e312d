"""Top-k checkpointing with Lightning-compatible naming.

The reference keeps two ModelCheckpoint callbacks per run — one per monitored
metric (val_loss and train_loss), each save_top_k=10, mode=min, with
metric-templated filenames (train_point_ddpm.py:63-77). This is the Orbax
equivalent: each TopKCheckpointer owns one monitor; checkpoints carry
(state pytree + hparams json) so ``load_checkpoint`` can rebuild a model
argument-free, mirroring Lightning's hyperparams-in-checkpoint
(diffusion.py:27 save_hyperparameters).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _is_primary() -> bool:
    return jax.process_index() == 0


def _make_checkpointer() -> Optional[ocp.StandardCheckpointer]:
    """On a pod, only process 0 performs checkpoint I/O: the train state is
    fully data-parallel-replicated, so its copy is complete, and restricting
    Orbax's active processes to {0} keeps its commit barriers from spanning
    hosts that never write (a global barrier there DEADLINE_EXCEEDs —
    observed with 2 Gloo processes in tests/test_distributed.py). Non-primary
    hosts get None — Orbax refuses to even construct a checkpointer whose
    active set excludes the current process."""
    if jax.process_count() > 1:
        if not _is_primary():
            return None
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            )
        )
    return ocp.StandardCheckpointer()


class TopKCheckpointer:
    def __init__(
        self,
        dirpath: str,
        monitor: str,
        filename_prefix: str,
        save_top_k: int = 10,
        mode: str = "min",
    ):
        self.dirpath = os.path.abspath(dirpath)
        self.monitor = monitor
        self.prefix = filename_prefix
        self.save_top_k = save_top_k
        self.mode = mode
        self._ckpt = _make_checkpointer()
        os.makedirs(self.dirpath, exist_ok=True)
        # Rehydrate the top-k ledger from sidecar metadata so a resumed run
        # admits/evicts against pre-crash checkpoints — Lightning persists
        # ModelCheckpoint state in the ckpt and restores it on
        # trainer.fit(ckpt_path=...) (train_point_ldm.py:84,144); here the
        # directory itself is the durable ledger.
        self._kept: List[Tuple[float, str]] = self._scan_existing()

    def _scan_existing(self) -> List[Tuple[float, str]]:
        kept: List[Tuple[float, str]] = []
        for name in os.listdir(self.dirpath):
            if not name.endswith(".ckpt.json"):
                continue
            path = os.path.join(self.dirpath, name[: -len(".json")])
            if not os.path.isdir(path):
                continue  # stale sidecar
            try:
                with open(os.path.join(self.dirpath, name)) as f:
                    meta = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if meta.get("monitor") != self.monitor or meta.get("value") is None:
                continue
            kept.append((float(meta["value"]), path))
        kept.sort(key=lambda kv: kv[0], reverse=(self.mode != "min"))
        if self.save_top_k < 0:  # -1: keep everything
            return kept
        return kept[: self.save_top_k]

    def _is_better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def would_save(self, value: float) -> bool:
        """Admission check without touching the state (lets the trainer skip
        the device->host state fetch when nothing would be written)."""
        if self.save_top_k < 0:
            return True  # save_top_k=-1: keep every checkpoint (Lightning)
        if self.save_top_k == 0:
            return False  # monitor disabled (Lightning save_top_k=0 parity)
        if len(self._kept) < self.save_top_k:
            return True
        worst = max(self._kept)[0] if self.mode == "min" else min(self._kept)[0]
        return self._is_better(value, worst)

    def maybe_save(
        self,
        state: Any,
        epoch: int,
        value: float,
        hparams: Optional[Dict] = None,
        extra: Optional[Dict] = None,
        ema: Optional[Any] = None,
    ) -> Optional[str]:
        """Save if `value` ranks in the top k for this monitor. Returns path.

        ``ema`` (extension): an EMA param tree saved as a sibling orbax
        payload at ``path + ".ema"``, evicted together with its checkpoint.

        Multi-process: only process 0 writes (see _make_checkpointer); other
        hosts return None and keep their (unused) ledgers empty."""
        if not _is_primary():
            return None
        if not self.would_save(value):
            return None

        name = f"{self.prefix}-epoch={epoch:02d}-{self.monitor}={value:.2f}.ckpt"
        path = os.path.join(self.dirpath, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(state))
        self._ckpt.wait_until_finished()
        if ema is not None:
            shutil.rmtree(path + ".ema", ignore_errors=True)
            self._ckpt.save(path + ".ema", jax.device_get(ema))
            self._ckpt.wait_until_finished()
        meta = {
            "epoch": epoch,
            "monitor": self.monitor,
            "value": value,
            "hparams": hparams or {},
            "extra": extra or {},
        }
        with open(path + ".json", "w") as f:
            json.dump(meta, f)

        # Dedupe by path: a resumed run that re-earns an existing
        # (epoch, value) name rewrites the same directory — a second ledger
        # tuple for it would let a later eviction delete the directory while
        # the surviving tuple (possibly best_path) still references it.
        self._kept = [kv for kv in self._kept if kv[1] != path]
        self._kept.append((value, path))
        self._kept.sort(key=lambda kv: kv[0], reverse=(self.mode != "min"))
        while self.save_top_k > 0 and len(self._kept) > self.save_top_k:
            _, evict = self._kept.pop()
            shutil.rmtree(evict, ignore_errors=True)
            shutil.rmtree(evict + ".ema", ignore_errors=True)
            try:
                os.remove(evict + ".json")
            except OSError:
                pass
        return path

    @property
    def best_path(self) -> Optional[str]:
        return self._kept[0][1] if self._kept else None


def atomic_save(path: str, host_state: Any, meta: Dict) -> str:
    """Write an orbax checkpoint + ``.json`` sidecar via tmp+rename.

    Atomicity contract: a failed or interrupted save can never destroy an
    existing checkpoint at ``path``, and no crash window pairs a NEW payload
    with a STALE sidecar. The swap is rename-only (no multi-second rmtree
    between the old payload disappearing and the new one landing): the old
    directory is renamed aside to ``path + ".old"`` and only deleted after
    the new payload + sidecar are in place. The worst interruption leaves
    either (a) a payload without a sidecar (recognizable, safely
    re-writable), or (b) ``path`` briefly absent with the COMPLETE new
    payload at ``path + ".tmp"`` and the old one at ``path + ".old"`` —
    ``recover_interrupted_save`` (called by ``find_latest_checkpoint``)
    finishes that swap at read time.
    """
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    old = path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.rmtree(old, ignore_errors=True)
    ckpt = _make_checkpointer()
    ckpt.save(tmp, host_state)
    ckpt.wait_until_finished()
    sidecar_tmp = tmp + ".json"
    with open(sidecar_tmp, "w") as f:
        json.dump(meta, f)
    # Old sidecar goes first so no window pairs the new payload with it.
    try:
        os.remove(path + ".json")
    except OSError:
        pass
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    os.replace(sidecar_tmp, path + ".json")
    shutil.rmtree(old, ignore_errors=True)
    return path


def recover_interrupted_save(path: str) -> None:
    """Finish an ``atomic_save`` swap interrupted between its renames.

    When ``path`` exists, the only repairable state is an orphaned sidecar: a
    crash between ``os.rename(tmp, path)`` and the sidecar ``os.replace``
    leaves the NEW payload at ``path`` with its complete sidecar still at
    ``tmp + ".json"`` (distinguishable: the tmp directory is gone) — adopt
    it rather than silently losing the epoch/scheduler metadata. Otherwise
    prefers the complete NEW payload (``path + ".tmp"`` with its sidecar —
    everything after the payload write finished), falling back to the
    renamed-aside OLD payload.

    Concurrency-safe: on a pod every process may call this on a shared
    checkpoint directory (``find_latest_checkpoint`` with a common
    ``--auto-resume-dir``); the loser of a rename race must resume from the
    winner's repair, not crash. Each rename tolerates OSError as long as the
    target it was producing exists afterwards.
    """
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    if os.path.exists(path):
        if (not os.path.exists(path + ".json") and not os.path.isdir(tmp)
                and os.path.exists(tmp + ".json")):
            try:
                os.replace(tmp + ".json", path + ".json")
            except OSError:
                if not os.path.exists(path + ".json"):
                    raise  # not a concurrent-repair race — surface it
            shutil.rmtree(old, ignore_errors=True)
        return
    if os.path.isdir(tmp) and os.path.exists(tmp + ".json"):
        try:
            os.rename(tmp, path)
            os.replace(tmp + ".json", path + ".json")
        except OSError:
            if not os.path.exists(path):
                raise
            # A concurrent caller won the payload rename; the sidecar may
            # still be ours to finish (or already theirs — both fine).
            if (not os.path.exists(path + ".json")
                    and os.path.exists(tmp + ".json")):
                try:
                    os.replace(tmp + ".json", path + ".json")
                except OSError:
                    if not os.path.exists(path + ".json"):
                        raise
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.isdir(old):
        try:
            os.rename(old, path)
        except OSError:
            if not os.path.exists(path):
                raise


def save_last_checkpoint(
    dirpath: str, state: Any, epoch: int, hparams: Optional[Dict] = None,
    extra: Optional[Dict] = None, ema: Optional[Any] = None,
) -> str:
    """Overwrite a rolling 'last.ckpt' for crash recovery (an extension over
    the reference, whose only recovery is manually pointing at a top-k file,
    SURVEY.md §5). ``ema``: sibling EMA payload at 'last.ckpt.ema' (its own
    atomic swap, written before the main payload so a crash between the two
    can only pair a new EMA with an old state — never a missing EMA)."""
    path = os.path.join(os.path.abspath(dirpath), "last.ckpt")
    if not _is_primary():
        return path  # pod: process 0 owns all checkpoint I/O
    meta = {"epoch": epoch, "monitor": "last", "value": None,
            "hparams": hparams or {}, "extra": extra or {}}
    if ema is not None:
        atomic_save(path + ".ema", jax.device_get(ema), {"epoch": epoch})
    return atomic_save(path, jax.device_get(state), meta)


def find_latest_checkpoint(dirpath: str) -> Optional[str]:
    """Most recently written .ckpt in a directory (prefers last.ckpt)."""
    if not os.path.isdir(dirpath):
        return None
    last = os.path.join(dirpath, "last.ckpt")
    recover_interrupted_save(last)
    if os.path.exists(last):
        return last
    ckpts = [
        os.path.join(dirpath, f)
        for f in os.listdir(dirpath)
        if f.endswith(".ckpt")
    ]
    if not ckpts:
        return None
    return max(ckpts, key=os.path.getmtime)


def load_checkpoint_meta(path: str) -> Dict:
    """Read only the sidecar metadata JSON — no state restore. Use this when
    just the hparams/extra are needed (a full restore of a big state tree
    through the axon tunnel is ~9 MB/s; the sidecar is a few KB)."""
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return meta


def load_checkpoint(path: str, target: Any = None) -> Tuple[Any, Dict]:
    """Restore (state, metadata). With `target`, restores into its structure."""
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(os.path.abspath(path), target) if target is not None else ckpt.restore(os.path.abspath(path))
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta
