"""Train state: params + BatchNorm running stats + optax state.

TPU equivalent of the Lightning module's mutable training state. The learning
rate is an injected optax hyperparameter so the host-side epoch schedulers
(ReduceLROnPlateau / CosineAnnealing) can retune it without recompiling the
train step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    apply_fn: Callable = struct.field(pytree_node=False)
    params: core.FrozenDict
    batch_stats: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    opt_state: optax.OptState

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            apply_fn=apply_fn,
            params=params,
            batch_stats=batch_stats,
            tx=tx,
            opt_state=tx.init(params),
        )


def make_adamw(lr: float, weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """AdamW(lr, wd=1e-5) with torch defaults (diffusion.py:60)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def make_adam(lr: float) -> optax.GradientTransformation:
    """Adam(lr) (networks.py:2045, 2289)."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Retune the injected LR without touching compiled code."""
    opt_state = state.opt_state
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyperparams))


def get_learning_rate(state: TrainState) -> float:
    return float(jax.device_get(state.opt_state.hyperparams["learning_rate"]))
