"""Import reference PyTorch-Lightning checkpoints into framework checkpoints.

A user of the reference (dhillon24/3d-shape-generation) switching to this
framework brings trained ``.ckpt`` files produced by Lightning's
ModelCheckpoint. This module converts them: it reads the Lightning
checkpoint's ``state_dict`` (true reference key layout, e.g.
``model.enc1.conv1.weight``) and emits the corresponding flax
``(params, batch_stats)`` trees plus a framework checkpoint directory
loadable by ``factory.load_task_checkpoint``.

Supported source modules (reference file:line):
  * PointCloudDiffusion / UNetPointNetLarge   diffusion.py:14-28, networks.py:724-838
  * LatentDiffusion / SimpleLatentUNetPointNet diffusion.py:361-380, networks.py:962-1106
    (the embedded ``vae.*`` weights are split out into a second checkpoint,
    since this framework keeps the LDM's VAE external — factory.py parity
    with diffusion.py:375 ``save_hyperparameters(ignore=['vae'])``)
  * SimplePointNetVAE                         networks.py:1110-1410
  * PointNetVAE (PointNet++ enc + Folding dec) networks.py:1511-1725
  * VAE3D                                     networks.py:1984-2206
  * VAE3DLarge                                networks.py:2208-2490

Not supported: PointNetVAEExperimental (marked "not used currently" in the
reference and unreachable from its entry points — no real checkpoints exist)
and the experimental denoisers (never instantiated by PointCloudDiffusion).

Weights, BN running stats, AND Adam/AdamW moments are imported: torch Adam
state is keyed by parameter *index* in registration order, which equals the
state_dict key order restricted to parameters (buffers excluded), and Adam
moments are per-element — so every weight-layout transform (transpose,
slice, flip, permutation, the dec4 kernel split) applies to ``exp_avg`` /
``exp_avg_sq`` verbatim. The converters are simply re-run on moment dicts
and the results grafted into the optax ``ScaleByAdamState`` (whose update
math matches torch Adam's bias correction leaf-for-leaf — proven by the f64
lockstep trajectory tests). The optimizer's live learning rate
(param_groups[0].lr — e.g. after ReduceLROnPlateau halvings) carries into
the injected hyperparams, and Lightning's saved ``lr_schedulers`` state is
translated into the matching framework scheduler state (sidecar
``extra.scheduler``) so Trainer.fit resumes with the live controller instead
of a fresh one. A checkpoint without optimizer_states imports weights-only
with a fresh optimizer.

Weight-layout transforms mirror tests/transplant_utils.py, which proves them
against live torch modules; here they operate on raw state_dict arrays so
importing needs no torch model classes (and no pytorch_lightning install —
pickled Lightning container types are stubbed out at load time).
"""

from __future__ import annotations

import contextlib
import importlib
import math
import os
import sys
import types
from typing import Any, Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Lightning checkpoint loading (torch only needed here)
# ---------------------------------------------------------------------------


class _AttributeDict(dict):
    """dict-subclass stub for Lightning's AttributeDict pickle payloads."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover - mirrors Lightning
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@contextlib.contextmanager
def _lightning_unpickle_stubs():
    """Temporarily register stub modules so Lightning container types inside
    the pickle (hyper_parameters is an AttributeDict) unpickle without
    pytorch_lightning installed. The stubs subclass dict, preserving the
    stored values.

    Per module name, in order: an importable REAL module is used as-is
    (patched with an AttributeDict only if it lacks one — some versions
    don't export it from every path); anything absent, or present on disk
    but failing to import (a broken/partial install), gets a stub. Scoped on
    purpose: every stub and every patched attribute is removed on exit, so
    an environment with the real pytorch_lightning is never left shadowed or
    mutated process-wide."""
    added, patched = [], []
    for modname in (
        "pytorch_lightning",
        "pytorch_lightning.utilities",
        "pytorch_lightning.utilities.parsing",
        "lightning",
        "lightning.pytorch",
        "lightning.pytorch.utilities",
        "lightning.pytorch.utilities.parsing",
        "lightning_fabric",
        "lightning_fabric.utilities",
        "lightning_fabric.utilities.data",
    ):
        mod = sys.modules.get(modname)
        if mod is None:
            try:
                mod = importlib.import_module(modname)
            except Exception:  # absent OR broken — stub it
                mod = types.ModuleType(modname)
                mod.AttributeDict = _AttributeDict
                sys.modules[modname] = mod
                added.append(modname)
                continue
        if not hasattr(mod, "AttributeDict"):
            mod.AttributeDict = _AttributeDict
            patched.append(mod)
    try:
        yield
    finally:
        for mod in patched:
            try:
                del mod.AttributeDict
            except AttributeError:
                pass
        for modname in added:
            sys.modules.pop(modname, None)


def load_lightning_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict, Dict]:
    """Read a Lightning .ckpt (or a bare torch.save'd state_dict).

    Returns (state_dict as {key: float numpy array}, hyper_parameters dict,
    misc metadata {epoch, global_step}). ``num_batches_tracked`` entries are
    dropped (flax BN has no equivalent; momentum is constant here and in the
    reference)."""
    import torch

    with _lightning_unpickle_stubs():
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except TypeError:  # older torch without weights_only
            ckpt = torch.load(path, map_location="cpu")

    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        raw_sd = ckpt["state_dict"]
        hparams = dict(ckpt.get("hyper_parameters") or {})
        meta = {
            "epoch": int(ckpt.get("epoch", 0) or 0),
            "global_step": int(ckpt.get("global_step", 0) or 0),
            "optimizer_states": ckpt.get("optimizer_states") or [],
            "lr_schedulers": ckpt.get("lr_schedulers") or [],
        }
    else:  # bare state_dict
        raw_sd, hparams, meta = ckpt, {}, {
            "epoch": 0, "global_step": 0, "optimizer_states": [],
            "lr_schedulers": [],
        }

    sd: Dict[str, np.ndarray] = {}
    for k, v in raw_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        sd[k] = np.asarray(v.detach().cpu().numpy(), dtype=np.float32)
    return sd, hparams, meta


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def extract_adam_moments(
    sd: Dict[str, np.ndarray],
    optimizer_states: list,
    key_filter=None,
) -> Optional[Dict[str, Any]]:
    """Re-key torch Adam/AdamW state from parameter indices to state_dict
    keys, shaped exactly like the weights.

    torch optimizers key their per-parameter state by index into the
    param_groups' parameter list, which for Lightning's single
    ``self.parameters()`` group is the module's parameter registration
    order — identical to state_dict key order with buffers removed.
    Parameters that never received a gradient (e.g. a frozen VAE inside
    LatentDiffusion) have no state entry and get zero moments (Adam's own
    initialization).

    Returns {"mu": {key: arr}, "nu": {key: arr}, "count": int, "lr": float}
    or None when the checkpoint carries no optimizer state."""
    if not optimizer_states:
        return None
    opt = optimizer_states[0]
    state = opt.get("state") or {}
    groups = opt.get("param_groups") or []
    if not groups:
        return None

    param_keys = [
        k for k in sd if not k.endswith(_BUFFER_SUFFIXES)
    ]
    if key_filter is not None:
        indexed = [(i, k) for i, k in enumerate(param_keys) if key_filter(k)]
    else:
        indexed = list(enumerate(param_keys))

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    mu: Dict[str, np.ndarray] = {}
    nu: Dict[str, np.ndarray] = {}
    count = 0
    for i, key in indexed:
        entry = state.get(i)
        if entry is None:
            mu[key] = np.zeros_like(sd[key])
            nu[key] = np.zeros_like(sd[key])
            continue
        m, v = to_np(entry["exp_avg"]), to_np(entry["exp_avg_sq"])
        if m.shape != sd[key].shape:
            raise ValueError(
                f"optimizer state {i} shape {m.shape} does not match "
                f"parameter {key!r} {sd[key].shape} — index mapping broke "
                "(unsupported optimizer layout)"
            )
        mu[key], nu[key] = m, v
        count = max(count, int(to_np(entry.get("step", 0)).item()))
    # Moment dicts must satisfy the converters' full key walk: BN running
    # stats are buffers (no optimizer state) — synthesize zeros so _bn()
    # resolves; the resulting stats trees are discarded.
    for k, w in sd.items():
        if k.endswith(("running_mean", "running_var")):
            mu[k] = np.zeros_like(w)
            nu[k] = np.zeros_like(w)
    return {
        "mu": mu, "nu": nu, "count": count,
        "lr": float(groups[0].get("lr", 0.0) or 0.0),
    }


# Which host LR controller each task resumes with (tasks.make_scheduler):
#   plateau = ReduceLROnPlateau(0.5, 5)   reference diffusion.py:56-68,
#                                         networks.py:2285-2297
#   cosine  = CosineAnnealingLR(eta_min=1e-6)  diffusion.py:410-423,
#                                         networks.py:1175-1188, 1551-1564
#   None    = bare Adam, no scheduler     networks.py:2041-2045
_SCHEDULER_KINDS = {
    "point_diffusion": "plateau",
    "vae3d_large": "plateau",
    "latent_diffusion": "cosine",
    "simple_pointnet_vae": "cosine",
    "pointnet_vae": "cosine",
    "vae3d": None,
}


def convert_scheduler_state(
    kind: str,
    lr_schedulers: list,
    live_lr: Optional[float],
) -> Optional[Dict[str, Any]]:
    """Translate Lightning's saved torch scheduler state into the matching
    framework scheduler's ``state_dict()``.

    Without this, a resumed ``Trainer.fit`` builds a FRESH scheduler from
    hparams: the imported live LR snaps back to base at the first epoch end
    and the plateau best/num_bad_epochs history is lost. torch state:
      * ReduceLROnPlateau -> {best, num_bad_epochs, _last_lr} maps onto the
        framework's {lr, best, num_bad_epochs} (same rel-threshold update).
        torch's plateau mutates param_groups' lr directly, so the optimizer
        ``live_lr`` is the authoritative fallback when _last_lr is absent
        (it only exists on newer torch).
      * CosineAnnealingLR -> {last_epoch, _last_lr}; when _last_lr is
        missing the LR is recomputed from the saved (base_lrs, T_max,
        eta_min) closed form.

    Returns None when the task has no scheduler or nothing usable is saved.
    """
    family = _SCHEDULER_KINDS.get(kind)
    if family is None:
        return None
    entry = dict(lr_schedulers[0]) if lr_schedulers else {}

    def first_lr():
        last = entry.get("_last_lr")
        if last:
            return float(last[0])
        return None

    if family == "plateau":
        lr = first_lr()
        if lr is None:
            lr = live_lr
        if not lr or lr <= 0:
            return None
        return {
            "lr": float(lr),
            "best": float(entry.get("best", math.inf)),
            "num_bad_epochs": int(entry.get("num_bad_epochs", 0)),
        }

    # family == "cosine"
    epoch = int(entry.get("last_epoch", 0))
    lr = first_lr()
    if lr is None and entry.get("base_lrs") and entry.get("T_max"):
        base = float(entry["base_lrs"][0])
        t_max = float(entry["T_max"])
        eta_min = float(entry.get("eta_min", 0.0))
        lr = eta_min + (base - eta_min) * (
            1 + math.cos(math.pi * epoch / t_max)
        ) / 2
    if lr is None:
        lr = live_lr
    if not lr or lr <= 0:
        return None
    state = {"epoch": epoch, "lr": float(lr)}
    if entry.get("T_max"):
        # Pin the annealing horizon to the source run's (torch restores
        # T_max from scheduler state; the framework controller honors it).
        state["t_max"] = int(entry["T_max"])
    if entry.get("base_lrs"):
        # Likewise the annealing amplitude: torch restores base_lrs, so
        # post-resume steps recompute from the SOURCE run's base LR even
        # if the resuming trainer's hparams lr differs.
        state["base_lr"] = float(entry["base_lrs"][0])
    return state


# ---------------------------------------------------------------------------
# Per-layer weight transforms (numpy; layouts proven by transplant_utils.py)
# ---------------------------------------------------------------------------


class _SD:
    """State-dict view that tracks consumed keys and gives readable errors."""

    def __init__(self, sd: Dict[str, np.ndarray], arch: str):
        self._sd = sd
        self._arch = arch
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"{self._arch}: expected state_dict key {key!r} — not a "
                f"{self._arch} checkpoint, or an unsupported variant"
            )
        self.used.add(key)
        return self._sd[key]

    def has(self, key: str) -> bool:
        return key in self._sd

    def leftovers(self, prefix: str = "") -> list:
        return sorted(
            k for k in self._sd
            if k.startswith(prefix) and k not in self.used
        )


def _linear(sd: _SD, k: str) -> Dict[str, np.ndarray]:
    """torch Linear (O, I) -> flax Dense {kernel (I, O), bias}."""
    return {"kernel": sd.take(f"{k}.weight").T, "bias": sd.take(f"{k}.bias")}


def _conv1d_as_dense(sd: _SD, k: str) -> Dict[str, np.ndarray]:
    """torch Conv1d(k=1) (O, I, 1) -> flax Dense {kernel (I, O), bias}."""
    return {
        "kernel": sd.take(f"{k}.weight")[:, :, 0].T,
        "bias": sd.take(f"{k}.bias"),
    }


def _conv2d_as_dense(sd: _SD, k: str) -> Dict[str, np.ndarray]:
    """torch Conv2d(k=1) (O, I, 1, 1) -> flax Dense (PointNet++ shared MLP)."""
    return {
        "kernel": sd.take(f"{k}.weight")[:, :, 0, 0].T,
        "bias": sd.take(f"{k}.bias"),
    }


def _bn(sd: _SD, k: str) -> Tuple[Dict, Dict]:
    """torch BatchNorm -> (flax params {scale, bias}, stats {mean, var})."""
    params = {"scale": sd.take(f"{k}.weight"), "bias": sd.take(f"{k}.bias")}
    stats = {
        "mean": sd.take(f"{k}.running_mean"),
        "var": sd.take(f"{k}.running_var"),
    }
    return params, stats


def _gn(sd: _SD, k: str) -> Dict[str, np.ndarray]:
    return {"scale": sd.take(f"{k}.weight"), "bias": sd.take(f"{k}.bias")}


def _conv3d(sd: _SD, k: str) -> Dict[str, np.ndarray]:
    """torch Conv3d (O, I, kd, kh, kw) -> flax Conv (kd, kh, kw, I, O)."""
    return {
        "kernel": sd.take(f"{k}.weight").transpose(2, 3, 4, 1, 0),
        "bias": sd.take(f"{k}.bias"),
    }


def _deconv3d(sd: _SD, k: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose3d (I, O, k...) -> flax ConvTranspose (k..., I, O)
    with spatial flip (transpose_kernel=False mapping)."""
    w = sd.take(f"{k}.weight").transpose(2, 3, 4, 0, 1)
    return {"kernel": w[::-1, ::-1, ::-1].copy(), "bias": sd.take(f"{k}.bias")}


def _pointnet_layer(sd: _SD, prefix: str) -> Tuple[Dict, Dict]:
    """Reference PointNetLayer conv1/bn1..conv3/bn3 (networks.py:16-49)
    -> flax PointNetLayer {DenseBN_0..2: {Dense_0, BatchNorm_0}}."""
    params, stats = {}, {}
    for i in range(3):
        bn_p, bn_s = _bn(sd, f"{prefix}.bn{i + 1}")
        params[f"DenseBN_{i}"] = {
            "Dense_0": _conv1d_as_dense(sd, f"{prefix}.conv{i + 1}"),
            "BatchNorm_0": bn_p,
        }
        stats[f"DenseBN_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def _dense_bn_rung(sd: _SD, conv_key: str, bn_key: str,
                   conv_fn=_conv1d_as_dense) -> Tuple[Dict, Dict]:
    bn_p, bn_s = _bn(sd, bn_key)
    return (
        {"Dense_0": conv_fn(sd, conv_key), "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def _res3d(sd: _SD, prefix: str) -> Tuple[Dict, Dict]:
    """Reference ResidualBlock3D conv1/bn1/conv2/bn2[/downsample]
    (networks.py:471-504) -> flax {Conv_0, BatchNorm_0, Conv_1, BatchNorm_1
    [, Conv_2]}."""
    b1p, b1s = _bn(sd, f"{prefix}.bn1")
    b2p, b2s = _bn(sd, f"{prefix}.bn2")
    params = {
        "Conv_0": _conv3d(sd, f"{prefix}.conv1"), "BatchNorm_0": b1p,
        "Conv_1": _conv3d(sd, f"{prefix}.conv2"), "BatchNorm_1": b2p,
    }
    if sd.has(f"{prefix}.downsample.weight"):
        params["Conv_2"] = _conv3d(sd, f"{prefix}.downsample")
    stats = {"BatchNorm_0": b1s, "BatchNorm_1": b2s}
    return params, stats


def _fc_reshape_perm(c: int, d: int, h: int, w: int) -> np.ndarray:
    """Column permutation aligning torch's fc -> reshape(C, D, H, W)
    (channel-first) with flax's reshape(D, H, W, C) (channel-last)."""
    torch_idx = np.arange(c * d * h * w).reshape(c, d, h, w)
    return torch_idx.transpose(1, 2, 3, 0).reshape(-1)


def _set_abstraction(sd: _SD, prefix: str, n_rungs: int) -> Tuple[Dict, Dict]:
    """Reference SetAbstraction mlp_convs/mlp_bns (networks.py:183-205,
    Conv2d k=1 + BatchNorm2d) -> flax SetAbstraction {DenseBN_i}."""
    params, stats = {}, {}
    for i in range(n_rungs):
        p, s = _dense_bn_rung(
            sd, f"{prefix}.mlp_convs.{i}", f"{prefix}.mlp_bns.{i}",
            conv_fn=_conv2d_as_dense,
        )
        params[f"DenseBN_{i}"] = p
        stats[f"DenseBN_{i}"] = s
    return params, stats


# ---------------------------------------------------------------------------
# Per-architecture converters: state_dict -> (params, batch_stats, hparams)
# ---------------------------------------------------------------------------


def import_point_unet_large(
    sd_dict: Dict[str, np.ndarray], prefix: str = "model."
) -> Tuple[Dict, Dict]:
    """UNetPointNetLarge (networks.py:724-838) -> models.PointUNetLarge.

    The flax model splits dec4's first Dense over its concat([global, r4])
    input (Dense_4 g-rows no-bias + Dense_5 r-rows with bias) — see
    models/point_unet.py; the split is proven identical by
    tests/test_full_model_transplant.py."""
    sd = _SD(sd_dict, "PointCloudDiffusion/UNetPointNetLarge")
    p = prefix
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["TimeMLP_0"] = {
        "Dense_0": _linear(sd, f"{p}time_mlp.0"),
        "Dense_1": _linear(sd, f"{p}time_mlp.2"),
    }
    for i, enc in enumerate(("enc1", "enc2", "enc3", "enc4")):
        params[f"PointNetLayer_{i}"], stats[f"PointNetLayer_{i}"] = (
            _pointnet_layer(sd, f"{p}{enc}")
        )
    params["DenseBN_0"], stats["DenseBN_0"] = _dense_bn_rung(
        sd, f"{p}global_feat.0", f"{p}global_feat.1")
    params["DenseBN_1"], stats["DenseBN_1"] = _dense_bn_rung(
        sd, f"{p}global_feat.3", f"{p}global_feat.4")
    # refines: declaration order in the flax model is refine4..refine1.
    for i, r in enumerate(("refine4", "refine3", "refine2", "refine1")):
        params[f"Dense_{i}"] = _conv1d_as_dense(sd, f"{p}{r}")
    # dec4 first rung: split the (4096+1024, 1024) kernel at the global width.
    g_rows = sd.take(f"{p}global_feat.3.weight").shape[0]
    w4 = sd.take(f"{p}dec4.conv1.weight")[:, :, 0].T
    params["Dense_4"] = {"kernel": w4[:g_rows]}
    params["Dense_5"] = {
        "kernel": w4[g_rows:], "bias": sd.take(f"{p}dec4.conv1.bias")
    }
    bn_p, bn_s = _bn(sd, f"{p}dec4.bn1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn_p, bn_s
    params["DenseBN_2"], stats["DenseBN_2"] = _dense_bn_rung(
        sd, f"{p}dec4.conv2", f"{p}dec4.bn2")
    params["DenseBN_3"], stats["DenseBN_3"] = _dense_bn_rung(
        sd, f"{p}dec4.conv3", f"{p}dec4.bn3")
    for i, dec in enumerate(("dec3", "dec2", "dec1"), start=4):
        params[f"PointNetLayer_{i}"], stats[f"PointNetLayer_{i}"] = (
            _pointnet_layer(sd, f"{p}{dec}")
        )
    params["DenseBN_4"], stats["DenseBN_4"] = _dense_bn_rung(
        sd, f"{p}output.0", f"{p}output.1")
    params["Dense_6"] = _conv1d_as_dense(sd, f"{p}output.3")

    _check_consumed(sd, prefix)
    return params, stats


def import_simple_latent_unet(
    sd_dict: Dict[str, np.ndarray], prefix: str = "model."
) -> Tuple[Dict, Dict]:
    """SimpleLatentUNetPointNet (networks.py:962-1106) ->
    models.SimpleLatentUNet. Flax auto-numbering pinned by
    tests/test_latent_unet_transplant.py."""
    sd = _SD(sd_dict, "LatentDiffusion/SimpleLatentUNetPointNet")
    p = prefix
    params: Dict[str, Any] = {
        "Dense_0": _linear(sd, f"{p}time_mlp.0"),
        "Dense_1": _linear(sd, f"{p}time_mlp.2"),
    }

    def rung(key):
        return {"Dense_0": _linear(sd, f"{key}.0"), "GroupNorm_0": _gn(sd, f"{key}.1")}

    for i, enc in enumerate(("enc1", "enc2", "enc3", "enc4")):
        params[f"DenseGN_{i}"] = rung(f"{p}{enc}")
    params["DenseGN_4"] = {
        "Dense_0": _linear(sd, f"{p}global_feat.0"),
        "GroupNorm_0": _gn(sd, f"{p}global_feat.1"),
    }
    params["DenseGN_5"] = {
        "Dense_0": _linear(sd, f"{p}global_feat.3"),
        "GroupNorm_0": _gn(sd, f"{p}global_feat.4"),
    }
    for i, r in enumerate(("refine1", "refine2", "refine3", "refine4"), start=2):
        params[f"Dense_{i}"] = _linear(sd, f"{p}{r}")
    for i, dec in enumerate(("dec4", "dec3", "dec2", "dec1"), start=6):
        params[f"DenseGN_{i}"] = rung(f"{p}{dec}")
    params["Dense_6"] = _linear(sd, f"{p}output.0")
    params["Dense_7"] = _linear(sd, f"{p}output.2")

    _check_consumed(sd, prefix)
    return params, {}


def import_simple_pointnet_vae(
    sd_dict: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict, Dict]:
    """SimplePointNetVAE (networks.py:1110-1410) -> models.SimplePointNetVAE."""
    sd = _SD(sd_dict, "SimplePointNetVAE")
    p = prefix
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(4):
        params[f"enc{i + 1}"], stats[f"enc{i + 1}"] = _pointnet_layer(
            sd, f"{p}encoder.{i}")
    params["enc_fc"] = _linear(sd, f"{p}encoder.6")
    params["fc_mu"] = _linear(sd, f"{p}fc_mu")
    params["fc_logvar"] = _linear(sd, f"{p}fc_logvar")
    for name, idx in (("dec1", 0), ("dec2", 2), ("dec3", 4)):
        params[name] = _linear(sd, f"{p}decoder.{idx}")
    params["output_layer"] = _linear(sd, f"{p}output_layer")

    _check_consumed(sd, prefix)
    return params, stats


def import_pointnet_vae(
    sd_dict: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict, Dict]:
    """PointNetVAE (networks.py:1511-1725): PointNetPPEncoder
    (networks.py:1412-1447) + FoldingDecoder (networks.py:1449-1509)."""
    sd = _SD(sd_dict, "PointNetVAE")
    p = prefix
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    for sa in ("sa1", "sa2", "sa3"):
        enc_p[sa], enc_s[sa] = _set_abstraction(sd, f"{p}encoder.{sa}", 3)
    enc_p["fc1"] = _linear(sd, f"{p}encoder.fc1")
    bn_p, bn_s = _bn(sd, f"{p}encoder.bn1")
    enc_p["bn1"], enc_s["bn1"] = bn_p, bn_s
    enc_p["fc_mu"] = _linear(sd, f"{p}encoder.fc_mu")
    enc_p["fc_logvar"] = _linear(sd, f"{p}encoder.fc_logvar")

    dec_p: Dict[str, Any] = {}
    for fold in ("fold1", "fold2"):
        for i in range(3):
            dec_p[f"{fold}_{i}"] = {
                "Dense_0": _conv1d_as_dense(sd, f"{p}decoder.{fold}.{i}.layer.0"),
                "Dense_1": _conv1d_as_dense(sd, f"{p}decoder.{fold}.{i}.layer.2"),
            }
    dec_p["upsample"] = _linear(sd, f"{p}decoder.upsample")

    _check_consumed(sd, prefix)
    return (
        {"encoder": enc_p, "decoder": dec_p},
        {"encoder": enc_s},
    )


def import_vae3d(
    sd_dict: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict, Dict]:
    """VAE3D (networks.py:1984-2206) -> models.VAE3D."""
    sd = _SD(sd_dict, "VAE3D")
    p = prefix
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(4):
        blk_p, blk_s = _dense_bn_rung(
            sd, f"{p}encoder.{i}.conv", f"{p}encoder.{i}.bn", conv_fn=_conv3d)
        params[f"enc_blocks_{i}"] = {
            "Conv_0": blk_p["Dense_0"], "BatchNorm_0": blk_p["BatchNorm_0"]
        }
        stats[f"enc_blocks_{i}"] = blk_s
    params["enc_fc"] = _linear(sd, f"{p}encoder.5")
    params["fc_mu"] = _linear(sd, f"{p}fc_mu")
    params["fc_logvar"] = _linear(sd, f"{p}fc_logvar")
    di = _linear(sd, f"{p}decoder_input")
    perm = _fc_reshape_perm(256, 2, 2, 2)
    params["decoder_input"] = {
        "kernel": di["kernel"][:, perm], "bias": di["bias"][perm]
    }
    for i in range(3):
        bn_p, bn_s = _bn(sd, f"{p}decoder.{i}.bn")
        params[f"dec_blocks_{i}"] = {
            "ConvTranspose_0": _deconv3d(sd, f"{p}decoder.{i}.deconv"),
            "BatchNorm_0": bn_p,
        }
        stats[f"dec_blocks_{i}"] = {"BatchNorm_0": bn_s}
    params["dec_out"] = _deconv3d(sd, f"{p}decoder.3")

    _check_consumed(sd, prefix)
    return params, stats


def import_vae3d_large(
    sd_dict: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict, Dict]:
    """VAE3DLarge (networks.py:2208-2490) -> models.VAE3DLarge. Sequential
    index -> name map follows the encoder/decoder layouts at
    networks.py:2226-2266 (ReLU/Flatten/Sigmoid entries hold no weights)."""
    sd = _SD(sd_dict, "VAE3DLarge")
    p = prefix
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["enc_in"] = _conv3d(sd, f"{p}encoder.0")
    enc_res = {"enc_res1": 2, "enc_res2": 5, "enc_res3": 8, "enc_res4": 11}
    for name, idx in enc_res.items():
        params[name], stats[name] = _res3d(sd, f"{p}encoder.{idx}")
    for name, idx in (("enc_down1", 3), ("enc_down2", 6), ("enc_down3", 9)):
        params[name] = _conv3d(sd, f"{p}encoder.{idx}")
    params["enc_final"] = _conv3d(sd, f"{p}encoder.12")
    params["fc_mu"] = _linear(sd, f"{p}fc_mu")
    params["fc_logvar"] = _linear(sd, f"{p}fc_logvar")
    di = _linear(sd, f"{p}decoder_input")
    perm = _fc_reshape_perm(512, 4, 4, 4)
    params["decoder_input"] = {
        "kernel": di["kernel"][:, perm], "bias": di["bias"][perm]
    }
    for name, idx in (("dec_up1", 0), ("dec_up2", 3), ("dec_up3", 6)):
        params[name] = _deconv3d(sd, f"{p}decoder.{idx}")
    dec_res = {"dec_res1": 2, "dec_res2": 5, "dec_res3": 8, "dec_res4": 11}
    for name, idx in dec_res.items():
        params[name], stats[name] = _res3d(sd, f"{p}decoder.{idx}")
    params["dec_conv"] = _conv3d(sd, f"{p}decoder.9")
    params["dec_out"] = _conv3d(sd, f"{p}decoder.12")

    _check_consumed(sd, prefix)
    return params, stats


def _check_consumed(sd: _SD, prefix: str) -> None:
    left = sd.leftovers(prefix)
    if left:
        raise ValueError(
            f"unconsumed state_dict keys under {prefix!r} (unsupported "
            f"variant or corrupted checkpoint): {left[:8]}"
            + ("..." if len(left) > 8 else "")
        )


# ---------------------------------------------------------------------------
# Detection + hparams inference
# ---------------------------------------------------------------------------

_VAE_KINDS = {
    "simple_pointnet_vae": import_simple_pointnet_vae,
    "pointnet_vae": import_pointnet_vae,
    "vae3d": import_vae3d,
    "vae3d_large": import_vae3d_large,
}


def detect_architecture(sd: Dict[str, np.ndarray], prefix: str = "") -> str:
    """Fingerprint the source LightningModule from its state_dict keys."""
    def has(k):
        return f"{prefix}{k}" in sd

    if has("model.enc1.conv1.weight"):
        return "point_diffusion"
    if has("model.enc1.0.weight"):
        return "latent_diffusion"
    if has("encoder.0.conv1.weight"):
        return "simple_pointnet_vae"
    if has("encoder.sa1.mlp_convs.0.weight"):
        return "pointnet_vae"
    if has("encoder.0.conv.weight"):
        return "vae3d"
    if has("encoder.2.conv1.weight"):
        return "vae3d_large"
    if has("sa1.mlp_convs.0.weight"):
        raise ValueError(
            "PointNetVAEExperimental checkpoints are not supported (the "
            "reference marks it unused and no entry point trains it)"
        )
    raise ValueError(
        "unrecognized checkpoint: state_dict matches no reference "
        "architecture (PointCloudDiffusion, LatentDiffusion, "
        "SimplePointNetVAE, PointNetVAE, VAE3D, VAE3DLarge)"
    )


def _detect_vae_kind(
    sd: Dict[str, np.ndarray]
) -> Tuple[str, Dict[str, np.ndarray]]:
    """(kind, sub-state_dict) of the VAE embedded under ``vae.`` in a
    LatentDiffusion checkpoint."""
    sub = {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")}
    if not sub:
        raise ValueError("LatentDiffusion checkpoint has no vae.* weights")
    return detect_architecture(sub), sub


def _infer_hparams(kind: str, sd: Dict[str, np.ndarray], lightning_hp: Dict,
                   num_points: Optional[int] = None) -> Dict[str, Any]:
    """Framework task hparams from Lightning hyper_parameters, falling back
    to weight-shape inference, falling back to reference defaults."""
    hp = dict(lightning_hp)

    def get(key, default):
        v = hp.get(key)
        return default if v is None else v

    if kind == "point_diffusion":
        # UNetPointNetLarge: time_mlp.0 is Linear(time_dim, dim).
        w = sd["model.time_mlp.0.weight"]
        return {
            "task": "point_diffusion",
            "num_points": int(num_points or get("num_points", 2048)),
            "dim": int(get("dim", w.shape[0])),
            "time_dim": int(get("time_dim", w.shape[1])),
            "lr": float(get("lr", 1e-4)),
            "noise_schedule": str(get("noise_schedule", "cosine")),
            "num_classes": None,  # the reference is unconditional
            "lr_schedule": "plateau",  # diffusion.py:56-68
            "compute_dtype": "float32",
        }
    if kind == "latent_diffusion":
        w_out = sd["model.output.2.weight"]  # (latent_dim, dim//4)
        return {
            "task": "latent_diffusion",
            "latent_dim": int(get("latent_dim", w_out.shape[0])),
            "dim": int(get("dim", w_out.shape[1] * 4)),
            "time_dim": int(get("time_dim", sd["model.time_mlp.0.weight"].shape[1])),
            "lr": float(get("lr", 1e-4)),
            "noise_schedule": str(get("noise_schedule", "cosine")),
            "is_voxel_based": bool(get("is_voxel_based", True)),
            "compute_dtype": "float32",
        }
    if kind == "simple_pointnet_vae":
        out_w = sd["output_layer.weight"]  # (3N, 3N)
        return {
            "task": "simple_pointnet_vae",
            "num_points": int(num_points or get("num_points", out_w.shape[0] // 3)),
            "latent_dim": int(get("latent_dim", sd["fc_mu.weight"].shape[0])),
            "lr": float(get("lr", 1e-4)),
            "beta": float(get("beta", 1e-1)),
            "compute_dtype": "float32",
        }
    if kind == "pointnet_vae":
        up_w = sd["decoder.upsample.weight"]  # (num_points, 1024)
        return {
            "task": "pointnet_vae",
            "num_points": int(num_points or get("num_points", up_w.shape[0])),
            "latent_dim": int(get("latent_dim", sd["encoder.fc_mu.weight"].shape[0])),
            "lr": float(get("lr", 1e-4)),
            "beta": float(get("beta", 1e-1)),
            "compute_dtype": "float32",
        }
    if kind == "vae3d":
        return {
            "task": "vae3d",
            "latent_dim": int(get("latent_dim", sd["fc_mu.weight"].shape[0])),
            "beta": float(get("beta", 1e-1)),
            "lr": 1e-3,  # networks.py:2045 Adam(1e-3), not an hparam there
            "compute_dtype": "float32",
        }
    if kind == "vae3d_large":
        return {
            "task": "vae3d_large",
            "latent_dim": int(get("latent_dim", sd["fc_mu.weight"].shape[0])),
            "lr": float(get("lr", 1e-4)),
            "kl_warmup_epochs": int(get("kl_warmup_epochs", 10)),
            "kl_warmup_max_beta": float(get("kl_warmup_max_beta", 0.1)),
            "kl_annealing_epochs": int(get("kl_annealing_epochs", 100)),
            "compute_dtype": "float32",
        }
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Top level: convert + write framework checkpoints
# ---------------------------------------------------------------------------

_CONVERTERS = {
    "point_diffusion": import_point_unet_large,
    "latent_diffusion": import_simple_latent_unet,
    **_VAE_KINDS,
}


def _convert_moments(converter, moments) -> Optional[Dict[str, Any]]:
    """Run the weight converter over the mu/nu dicts (the transforms are all
    element-wise-valid for Adam moments); discard the dummy stats trees."""
    if moments is None:
        return None
    mu_tree, _ = converter(moments["mu"])
    nu_tree, _ = converter(moments["nu"])
    return {"mu": mu_tree, "nu": nu_tree, "count": moments["count"],
            "lr": moments["lr"]}


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    lightning_hparams: Optional[Dict] = None,
    num_points: Optional[int] = None,
    optimizer_states: Optional[list] = None,
    lr_schedulers: Optional[list] = None,
) -> Dict[str, Dict[str, Any]]:
    """Convert a reference state_dict into framework trees.

    Returns {name: {kind, params, batch_stats, hparams, adam, scheduler}} —
    one entry for a plain module; a LatentDiffusion checkpoint yields two
    ("main" = the denoiser, "vae" = the embedded VAE split out). ``adam`` is
    the converted optimizer-moment bundle, or None when the checkpoint has no
    optimizer state (and always None for the embedded VAE — it is frozen in
    the reference, so it carries no meaningful moments). ``scheduler`` is the
    translated host-scheduler state for Trainer.fit resumes (None for the
    frozen VAE and for scheduler-less tasks)."""
    lightning_hparams = lightning_hparams or {}
    kind = detect_architecture(sd)
    out: Dict[str, Dict[str, Any]] = {}

    if kind == "latent_diffusion":
        vae_kind, vae_sd = _detect_vae_kind(sd)
        main_sd = {k: v for k, v in sd.items() if not k.startswith("vae.")}
        params, stats = import_simple_latent_unet(main_sd)
        moments = extract_adam_moments(
            sd, optimizer_states or [],
            key_filter=lambda k: k.startswith("model."),
        )
        out["main"] = {
            "kind": kind, "params": params, "batch_stats": stats,
            "hparams": _infer_hparams(kind, sd, lightning_hparams),
            "adam": _convert_moments(import_simple_latent_unet, moments),
            "scheduler": convert_scheduler_state(
                kind, lr_schedulers or [], moments["lr"] if moments else None
            ),
        }
        vparams, vstats = _VAE_KINDS[vae_kind](vae_sd)
        out["vae"] = {
            "kind": vae_kind, "params": vparams, "batch_stats": vstats,
            "hparams": _infer_hparams(vae_kind, vae_sd, {}, num_points),
            "adam": None,
            "scheduler": None,
        }
        return out

    params, stats = _CONVERTERS[kind](sd)
    moments = extract_adam_moments(sd, optimizer_states or [])
    out["main"] = {
        "kind": kind, "params": params, "batch_stats": stats,
        "hparams": _infer_hparams(kind, sd, lightning_hparams, num_points),
        "adam": _convert_moments(_CONVERTERS[kind], moments),
        "scheduler": convert_scheduler_state(
            kind, lr_schedulers or [], moments["lr"] if moments else None
        ),
    }
    return out


def _tree_shape_diff(imported, expected) -> list:
    """Human-readable structure/shape mismatches between two trees."""
    import jax

    def flatten(tree):
        return {
            "/".join(str(k.key) for k in path): np.shape(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = flatten(imported), flatten(expected)
    diffs = []
    for k in sorted(set(got) | set(want)):
        if k not in want:
            diffs.append(f"unexpected leaf {k} {got[k]}")
        elif k not in got:
            diffs.append(f"missing leaf {k} {want[k]}")
        elif got[k] != want[k]:
            diffs.append(f"shape mismatch {k}: imported {got[k]} != model {want[k]}")
    return diffs


def _graft_adam_state(opt_state, adam, params_template):
    """Replace the mu/nu/count of the ScaleByAdamState inside an
    inject_hyperparams(adam/adamw) opt_state with imported moments, and
    carry the source optimizer's live learning rate into the injected
    hyperparams (it reflects any ReduceLROnPlateau halvings)."""
    import jax
    import jax.numpy as jnp

    diffs = _tree_shape_diff(adam["mu"], params_template)
    diffs += _tree_shape_diff(adam["nu"], params_template)
    if diffs:
        raise ValueError(
            "imported Adam moments do not match the parameter tree:\n  "
            + "\n  ".join(diffs[:20])
        )
    mu = jax.tree_util.tree_map(jnp.asarray, adam["mu"])
    nu = jax.tree_util.tree_map(jnp.asarray, adam["nu"])
    count = jnp.asarray(adam["count"], jnp.int32)

    replaced = False
    new_inner = []
    for s in opt_state.inner_state:
        if hasattr(s, "mu") and hasattr(s, "nu"):
            s = s._replace(mu=mu, nu=nu, count=count)
            replaced = True
        new_inner.append(s)
    if not replaced:
        raise ValueError("no ScaleByAdamState found in the optimizer chain")
    hyperparams = dict(opt_state.hyperparams)
    if adam["lr"] > 0:
        hyperparams["learning_rate"] = jnp.asarray(adam["lr"], jnp.float32)
    return opt_state._replace(
        count=count, hyperparams=hyperparams, inner_state=tuple(new_inner)
    )


def _looks_like_checkpoint(path: str) -> bool:
    """A framework checkpoint directory: has its .json sidecar, or at least
    orbax's own metadata files (a save interrupted between the payload
    rename and the sidecar write leaves the latter without the former —
    that orphan must stay replaceable by a re-run)."""
    return os.path.isdir(path) and (
        os.path.exists(path + ".json")
        or os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "_METADATA"))
    )


def write_framework_checkpoint(
    out_path: str,
    kind: str,
    params: Dict,
    batch_stats: Dict,
    hparams: Dict,
    epoch: int = 0,
    source: str = "",
    vae_model=None,
    vae_variables=None,
    adam: Optional[Dict[str, Any]] = None,
    scheduler_state: Optional[Dict[str, Any]] = None,
) -> str:
    """Validate the imported trees against a fresh model init (exact
    structure + shapes) and write an orbax checkpoint + sidecar that
    factory.load_task_checkpoint restores. With ``adam`` (converted
    moments from convert_state_dict), the optimizer state resumes
    mid-trajectory instead of fresh; ``scheduler_state`` lands in the
    sidecar's extra so Trainer.fit(resume_from=...) rebuilds the live LR
    controller instead of a fresh one."""
    import jax
    import jax.numpy as jnp

    from shapegen_tpu.train import factory

    task = factory.task_from_hparams(hparams, vae_model, vae_variables)
    init_state = task.init_state(
        jax.random.PRNGKey(0), factory._sample_batch_for(task)
    )
    diffs = _tree_shape_diff(params, init_state.params)
    diffs += _tree_shape_diff(batch_stats, init_state.batch_stats)
    if diffs:
        raise ValueError(
            f"imported {kind} trees do not match the framework model:\n  "
            + "\n  ".join(diffs[:20])
        )

    opt_state = init_state.opt_state
    step = init_state.step
    if adam is not None:
        opt_state = _graft_adam_state(opt_state, adam, init_state.params)
        step = jnp.asarray(adam["count"], jnp.int32)

    as_jnp = jax.tree_util.tree_map(jnp.asarray, (params, batch_stats))
    payload = {
        "params": as_jnp[0],
        "batch_stats": as_jnp[1],
        "opt_state": jax.device_get(opt_state),
        "step": jax.device_get(step),
    }
    out_path = os.path.abspath(out_path)
    if os.path.exists(out_path) and not _looks_like_checkpoint(out_path):
        # A typo'd --out pointing at a data directory must never be
        # rmtree'd; only something recognizably a (possibly crash-orphaned)
        # framework checkpoint is replaceable.
        raise ValueError(
            f"refusing to overwrite {out_path!r}: it exists but does not "
            "look like a framework checkpoint (expected a directory with a "
            ".json sidecar or orbax metadata) — remove it yourself or pick "
            "another --out"
        )
    from shapegen_tpu.train.checkpoints import atomic_save

    return atomic_save(
        out_path, jax.device_get(payload),
        {
            "epoch": epoch,
            "monitor": "imported",
            "value": None,
            "hparams": hparams,
            "extra": {
                "imported_from": source,
                "scheduler": scheduler_state,
                "note": (
                    "weights+BN stats+Adam moments imported"
                    if adam is not None
                    else "weights+BN stats imported; optimizer state fresh"
                ),
            },
        },
    )


def import_lightning_checkpoint(
    src_path: str,
    out_path: str,
    vae_out_path: Optional[str] = None,
    num_points: Optional[int] = None,
    import_optimizer: bool = True,
    loaded: Optional[Tuple[Dict[str, np.ndarray], Dict, Dict]] = None,
) -> Dict[str, str]:
    """One-call import: reference Lightning .ckpt file -> framework
    checkpoint director(ies). Returns {name: written path}. Pass ``loaded``
    (the load_lightning_checkpoint tuple) when the caller already read the
    file, so a multi-hundred-MB pickle isn't parsed twice."""
    sd, lightning_hp, meta = loaded or load_lightning_checkpoint(src_path)
    converted = convert_state_dict(
        sd, lightning_hp, num_points,
        optimizer_states=meta["optimizer_states"] if import_optimizer else [],
        lr_schedulers=(
            meta.get("lr_schedulers") if import_optimizer else []
        ),
    )

    written: Dict[str, str] = {}
    if "vae" in converted:
        if vae_out_path is None:
            raise ValueError(
                "LatentDiffusion checkpoints embed a VAE; pass vae_out_path "
                "for the split-out VAE checkpoint"
            )
        v = converted["vae"]
        written["vae"] = write_framework_checkpoint(
            vae_out_path, v["kind"], v["params"], v["batch_stats"],
            v["hparams"], epoch=meta["epoch"], source=src_path,
            adam=v["adam"], scheduler_state=v["scheduler"],
        )
        # The LDM task needs the (frozen) VAE to build at all — reuse the
        # just-imported trees.
        import jax
        import jax.numpy as jnp

        from shapegen_tpu.train import factory

        vae_task = factory.task_from_hparams(v["hparams"])
        vae_vars = {
            "params": jax.tree_util.tree_map(jnp.asarray, v["params"]),
            "batch_stats": jax.tree_util.tree_map(jnp.asarray, v["batch_stats"]),
        }
        m = converted["main"]
        written["main"] = write_framework_checkpoint(
            out_path, m["kind"], m["params"], m["batch_stats"], m["hparams"],
            epoch=meta["epoch"], source=src_path,
            vae_model=vae_task.model, vae_variables=vae_vars,
            adam=m["adam"], scheduler_state=m["scheduler"],
        )
        return written

    m = converted["main"]
    written["main"] = write_framework_checkpoint(
        out_path, m["kind"], m["params"], m["batch_stats"], m["hparams"],
        epoch=meta["epoch"], source=src_path, adam=m["adam"],
        scheduler_state=m["scheduler"],
    )
    return written
