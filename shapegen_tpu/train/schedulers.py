"""Epoch-level learning-rate controllers (host-side state machines).

The reference uses torch schedulers stepped once per epoch by Lightning:
  * ReduceLROnPlateau(factor=0.5, patience=5) monitoring val_loss
    (diffusion.py:56-68, networks.py:2285-2297).
  * CosineAnnealingLR(T_max=max_epochs, eta_min=1e-6)
    (diffusion.py:410-423, networks.py:1175-1188).

These are tiny host state machines, not device code: the resulting scalar LR
is injected into the optax optimizer via ``set_learning_rate`` each epoch, so
the compiled train step never recompiles.
"""

from __future__ import annotations

import math


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau parity (mode='min').

    step(metric) after each epoch; .lr is the current learning rate.
    """

    def __init__(
        self,
        base_lr: float,
        factor: float = 0.5,
        patience: int = 5,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        # torch default threshold_mode='rel': better if metric < best*(1-thr).
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, d):
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]


class CosineAnnealingLR:
    """torch CosineAnnealingLR parity, epoch-stepped."""

    def __init__(self, base_lr: float, t_max: int, eta_min: float = 1e-6):
        self.base_lr = base_lr
        self.t_max = t_max
        self.eta_min = eta_min
        self.epoch = 0
        self.lr = base_lr

    def step(self, metric: float = 0.0) -> float:
        del metric
        self.epoch += 1
        self.lr = self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.epoch / self.t_max)
        ) / 2
        return self.lr

    def state_dict(self):
        return {
            "epoch": self.epoch,
            "lr": self.lr,
            "t_max": self.t_max,
            "base_lr": self.base_lr,
        }

    def load_state_dict(self, d):
        self.epoch = d["epoch"]
        self.lr = d["lr"]
        # torch restores T_max AND base_lrs from the scheduler state on
        # resume (so the annealing horizon and amplitude stick to the
        # ORIGINAL run's values even if the resuming trainer's differ) —
        # match that. Older sidecars lack the keys; keep ctor values then.
        self.t_max = d.get("t_max", self.t_max)
        self.base_lr = d.get("base_lr", self.base_lr)
