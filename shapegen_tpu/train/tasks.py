"""Training tasks: model family + loss + optimizer + sampler, as pure steps.

Each task is the functional equivalent of one reference LightningModule:

  * PointDiffusionTask    <- PointCloudDiffusion  (diffusion.py:14-358)
  * LatentDiffusionTask   <- LatentDiffusion      (diffusion.py:361-734)
  * VAE3DLargeTask        <- VAE3DLarge           (networks.py:2208-2490)
  * VAE3DTask             <- VAE3D                (networks.py:1984-2206)
  * SimplePointNetVAETask <- SimplePointNetVAE    (networks.py:1110-1410)
  * PointNetVAETask       <- PointNetVAE          (networks.py:1511-1725)

A task exposes:
  init_state(rng, sample_batch) -> TrainState
  train_step(state, batch, rng, epoch) -> (state, metrics dict)
  eval_step(state, batch, rng, epoch)  -> metrics dict
  make_scheduler() -> host LR controller
  hparams -> dict stored in checkpoints (Lightning save_hyperparameters parity)

Steps are pure jax functions; the Trainer jits them (optionally with mesh
shardings) and threads PRNG keys explicitly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from shapegen_tpu.core import diffusion as diff
from shapegen_tpu.core import samplers
from shapegen_tpu.core.schedules import get_schedule
from shapegen_tpu.metrics.metrics import chamfer_distance, voxel_bce_recon_loss
from shapegen_tpu.models.vae3d import (
    kl_divergence_mean,
    kl_divergence_sum,
    kl_warmup_weight,
    reparameterize,
)
from shapegen_tpu.train.schedulers import CosineAnnealingLR, ReduceLROnPlateau
from shapegen_tpu.train.state import TrainState, make_adam, make_adamw


def _variables(state: TrainState) -> Dict:
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


class PointDiffusionTask:
    """Continuous-time eps-prediction diffusion on (B, N, 3) clouds.

    With ``num_classes`` set (and a conditional model), batches are
    (points, labels) tuples and training applies classifier-free label
    dropout; conditional sampling supports guidance. This is an extension —
    the reference trains one unconditional model per category.
    """

    def __init__(
        self,
        model,
        num_points: int = 2048,
        lr: float = 1e-4,
        noise_schedule: str = "cosine",
        num_classes: Optional[int] = None,
        cond_drop_prob: float = 0.1,
        lr_schedule: str = "plateau",
    ):
        self.model = model
        self.num_points = num_points
        self.lr = lr
        self.schedule = get_schedule(noise_schedule)
        self.num_classes = num_classes
        self.cond_drop_prob = cond_drop_prob
        self.lr_schedule = lr_schedule
        self.hparams = {
            "task": "point_diffusion",
            "num_points": num_points,
            "dim": model.dim,
            "time_dim": model.time_dim,
            "lr": lr,
            "noise_schedule": noise_schedule,
            "num_classes": num_classes,
            "lr_schedule": lr_schedule,
            "compute_dtype": jnp.dtype(model.dtype).name,
        }

    def _split_batch(self, batch):
        if isinstance(batch, (tuple, list)):
            return batch[0], batch[1]
        return batch, None

    def init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        points, _ = self._split_batch(sample_batch)
        t = jnp.zeros((points.shape[0],))
        variables = self.model.init(rng, points, t, train=False)
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            make_adamw(self.lr),
        )

    def make_scheduler(self):
        # AdamW + ReduceLROnPlateau(0.5, 5) on val_loss (diffusion.py:56-68).
        # lr_schedule='none' (extension) keeps a constant lr — useful on
        # tiny/noisy datasets where plateau halvings collapse the lr.
        if self.lr_schedule == "none":
            return None
        return ReduceLROnPlateau(self.lr, factor=0.5, patience=5)

    def _loss(self, params, batch_stats, batch, rng, train: bool):
        points, labels = self._split_batch(batch)
        t_key, n_key, d_key = jax.random.split(rng, 3)
        t = diff.sample_timesteps(t_key, points.shape[0])
        x_t, noise, _, _ = diff.add_noise(n_key, points, t, self.schedule)

        kwargs = {}
        if self.num_classes is not None and labels is not None:
            if train and self.cond_drop_prob > 0:
                # Classifier-free label dropout to the null token.
                drop = (
                    jax.random.uniform(d_key, labels.shape) < self.cond_drop_prob
                )
                labels = jnp.where(drop, self.num_classes, labels)
            kwargs["y"] = labels

        if train:
            pred, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x_t,
                t,
                train=True,
                mutable=["batch_stats"],
                **kwargs,
            )
            return diff.l1_eps_loss(noise, pred), mutated["batch_stats"]
        pred = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            x_t, t, train=False, **kwargs,
        )
        return diff.l1_eps_loss(noise, pred), batch_stats

    def train_step(self, state: TrainState, batch, rng, epoch):
        del epoch

        def loss_fn(params):
            return self._loss(params, state.batch_stats, batch, rng, train=True)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"train_loss": loss}

    def eval_step(self, state: TrainState, batch, rng, epoch):
        del epoch
        loss, _ = self._loss(state.params, state.batch_stats, batch, rng, train=False)
        return {"val_loss": loss}

    def denoise_fn(self, state: TrainState):
        def fn(x_t, t):
            return self.model.apply(_variables(state), x_t, t, train=False)

        return fn

    def sample(self, state, key, num_samples, num_points=None, num_steps=1000):
        """DDIM sampling — the default entrypoint sampler (diffusion.py:261)."""
        num_points = num_points or self.num_points
        return samplers.ddim_sample(
            key, self.denoise_fn(state), (num_samples, num_points, 3),
            num_steps=num_steps, schedule=self.schedule,
        )

    def sample2(self, state, key, num_samples, num_points=None, num_steps=1000):
        """Ancestral DDPM sampling (diffusion.py:225)."""
        num_points = num_points or self.num_points
        return samplers.ddpm_sample(
            key, self.denoise_fn(state), (num_samples, num_points, 3),
            num_steps=num_steps, schedule=self.schedule,
        )

    def sample3(self, state, x, start_t, num_steps=1000):
        """DDIM from a given noisy state (diffusion.py:291)."""
        return samplers.ddim_sample_from(
            None, self.denoise_fn(state), x, start_t,
            num_steps=num_steps, schedule=self.schedule,
        )

    def sample_sharded(
        self, state, key, num_samples, mesh, num_points=None, num_steps=1000,
        sharding_rules=None,
    ):
        """Sampler fan-out over a mesh: num_samples shards across chips, the
        whole 1000-step scan stays HBM-resident per chip, one gather at the
        end (the BASELINE.json north-star scaling axis; reference is
        single-device). With ``sharding_rules`` (tensor parallelism on an
        N-D mesh) the closed-over weights keep their 'model'-axis sharding
        instead of being gathered to every chip."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from shapegen_tpu.parallel.mesh import shard_sample_count, shard_state

        # Pin the parameter placement inside the API: callers may hand us
        # state living on a single device; the closed-over weights must be
        # mesh-placed (replicated, or rules-sharded for TP) or XLA
        # materializes cross-chip transfers per step.
        state = shard_state(state, mesh, sharding_rules)
        n = shard_sample_count(num_samples, mesh)
        fn = jax.jit(
            lambda k: self.sample(state, k, n, num_points, num_steps),
            out_shardings=NamedSharding(mesh, P("data")),
        )
        out = fn(key)
        return out if n == num_samples else out[:num_samples]

    def sample_conditional(
        self,
        state,
        key,
        labels: jnp.ndarray,
        num_points: Optional[int] = None,
        num_steps: int = 1000,
        guidance_scale: float = 1.0,
        sampler: str = "ddim",
    ):
        """Category-conditional sampling with classifier-free guidance
        (extension; eps = (1+w)*eps_cond - w*eps_uncond for w > 0).
        ``sampler``: 'ddim' (deterministic, the reference's default
        entrypoint math) or 'ddpm' (ancestral)."""
        assert self.num_classes is not None, "task is unconditional"
        num_points = num_points or self.num_points
        labels = jnp.asarray(labels, jnp.int32)
        null = jnp.full_like(labels, self.num_classes)
        variables = _variables(state)

        def denoise(x_t, t):
            eps_c = self.model.apply(variables, x_t, t, y=labels, train=False)
            if guidance_scale == 0.0:
                return eps_c
            eps_u = self.model.apply(variables, x_t, t, y=null, train=False)
            return (1.0 + guidance_scale) * eps_c - guidance_scale * eps_u

        sample_fn = (
            samplers.ddpm_sample if sampler == "ddpm" else samplers.ddim_sample
        )
        return sample_fn(
            key, denoise, (labels.shape[0], num_points, 3),
            num_steps=num_steps, schedule=self.schedule,
        )

    def add_noise(self, key, x_0, t):
        return diff.add_noise(key, x_0, t, self.schedule)


class LatentDiffusionTask:
    """DDPM in the frozen VAE's latent space (diffusion.py:361-734)."""

    def __init__(
        self,
        model,
        vae_model,
        vae_variables,
        latent_dim: int = 256,
        lr: float = 1e-4,
        noise_schedule: str = "cosine",
        is_voxel_based: bool = True,
        max_epochs: int = 500,
    ):
        self.model = model
        self.vae_model = vae_model
        self.vae_variables = vae_variables  # frozen (diffusion.py:377-378)
        self.latent_dim = latent_dim
        self.lr = lr
        self.schedule = get_schedule(noise_schedule)
        self.is_voxel_based = is_voxel_based
        self.max_epochs = max_epochs
        self.hparams = {
            "task": "latent_diffusion",
            "latent_dim": latent_dim,
            "dim": model.dim,
            "time_dim": model.time_dim,
            "lr": lr,
            "noise_schedule": noise_schedule,
            "is_voxel_based": is_voxel_based,
            "compute_dtype": jnp.dtype(model.dtype).name,
        }

    def init_state(self, rng, sample_batch) -> TrainState:
        z = jnp.zeros((sample_batch.shape[0], self.latent_dim))
        t = jnp.zeros((sample_batch.shape[0],))
        variables = self.model.init(rng, z, t, train=False)
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            make_adamw(self.lr),
        )

    def place_on_mesh(self, mesh):
        """Pin the closed-over frozen VAE variables to the mesh, replicated.

        The Trainer calls this once before fitting on a mesh: the VAE
        variables are captured by the jitted step as constants, and placing
        them as committed replicated arrays makes the layout explicit — one
        replica per device, resident for the whole run, never re-transferred
        per step (asserted by tests/test_sharding.py)."""
        from shapegen_tpu.parallel.mesh import replicated_sharding

        if mesh is None:
            return
        self.vae_variables = jax.device_put(
            self.vae_variables, replicated_sharding(mesh)
        )

    def make_scheduler(self):
        # AdamW + CosineAnnealingLR (diffusion.py:410-423).
        return CosineAnnealingLR(self.lr, t_max=self.max_epochs)

    def _encode(self, batch, rng):
        mu, logvar = self.vae_model.apply(
            self.vae_variables, batch, train=False, method=self.vae_model.encode
        )
        return reparameterize(rng, mu, logvar)

    def encode(self, batch, rng):
        """Frozen-VAE reparameterized encode (diffusion.py:455-458) — the
        public entry for validation-figure round-trips."""
        return self._encode(batch, rng)

    def _loss(self, params, batch, rng, train: bool):
        e_key, t_key, n_key, d_key = jax.random.split(rng, 4)
        z0 = jax.lax.stop_gradient(self._encode(batch, e_key))
        t = diff.sample_timesteps(t_key, z0.shape[0])
        z_t, noise, _, _ = diff.add_noise(n_key, z0, t, self.schedule)
        pred = self.model.apply(
            {"params": params}, z_t, t, train=train,
            rngs={"dropout": d_key} if train else {},
        )
        return diff.l1_eps_loss(noise, pred)

    def train_step(self, state, batch, rng, epoch):
        del epoch
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(p, batch, rng, train=True)
        )(state.params)
        state = state.apply_gradients(grads)
        return state, {"train_loss": loss}

    def eval_step(self, state, batch, rng, epoch):
        del epoch
        return {"val_loss": self._loss(state.params, batch, rng, train=False)}

    def denoise_fn(self, state):
        def fn(z_t, t):
            return self.model.apply({"params": state.params}, z_t, t, train=False)

        return fn

    def decode(self, z):
        """VAE decode of final latents (diffusion.py:609, 648, 702)."""
        return self.vae_model.apply(
            self.vae_variables, z, train=False, method=self.vae_model.decode
        )

    def sample_latents(self, state, key, num_samples, num_steps=1000):
        return samplers.ddim_sample(
            key, self.denoise_fn(state), (num_samples, self.latent_dim),
            num_steps=num_steps, schedule=self.schedule,
        )

    def sample2_latents(self, state, key, num_samples, num_steps=1000):
        return samplers.ddpm_sample(
            key, self.denoise_fn(state), (num_samples, self.latent_dim),
            num_steps=num_steps, schedule=self.schedule,
        )

    def sample3_latents(self, state, z, start_t, num_steps=1000):
        return samplers.ddim_sample_from(
            None, self.denoise_fn(state), z, start_t,
            num_steps=num_steps, schedule=self.schedule,
        )

    def add_noise(self, key, z_0, t):
        return diff.add_noise(key, z_0, t, self.schedule)


class VAE3DLargeTask:
    """BCE(mean) + warmup/annealed-beta * KL(mean) (networks.py:2372-2403)."""

    def __init__(self, model, lr: float = 1e-4, max_epochs: int = 500,
                 kl_warmup_epochs: int = 10, kl_warmup_max_beta: float = 0.1,
                 kl_annealing_epochs: int = 100):
        self.model = model
        self.lr = lr
        self.max_epochs = max_epochs
        self.kl_warmup_epochs = kl_warmup_epochs
        self.kl_warmup_max_beta = kl_warmup_max_beta
        self.kl_annealing_epochs = kl_annealing_epochs
        self.hparams = {
            "task": "vae3d_large",
            "latent_dim": model.latent_dim,
            "lr": lr,
            "kl_warmup_epochs": kl_warmup_epochs,
            "kl_warmup_max_beta": kl_warmup_max_beta,
            "kl_annealing_epochs": kl_annealing_epochs,
            "compute_dtype": jnp.dtype(model.dtype).name,
        }

    def init_state(self, rng, sample_batch) -> TrainState:
        init_rng, re_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, sample_batch, re_rng, train=False)
        # Adam + ReduceLROnPlateau (networks.py:2285-2297).
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            make_adam(self.lr),
        )

    def make_scheduler(self):
        return ReduceLROnPlateau(self.lr, factor=0.5, patience=5)

    def _loss(self, params, batch_stats, batch, rng, epoch, train: bool):
        kl_w = jnp.where(
            train,
            kl_warmup_weight(
                epoch, self.max_epochs, self.kl_warmup_epochs,
                self.kl_warmup_max_beta, self.kl_annealing_epochs,
            ),
            1.0,  # val uses beta=1 (networks.py:2393)
        )
        variables = {"params": params, "batch_stats": batch_stats}
        # Loss from logits: same value as the reference's
        # BCE(sigmoid(.), reduction='mean') but gradient-stable where the
        # sigmoid saturates (see VAE3D.forward_logits).
        if train:
            (logits, mu, logvar), mutated = self.model.apply(
                variables, batch, rng, train=True, mutable=["batch_stats"],
                method=self.model.forward_logits,
            )
            new_stats = mutated["batch_stats"]
        else:
            logits, mu, logvar = self.model.apply(
                variables, batch, rng, train=False,
                method=self.model.forward_logits,
            )
            new_stats = batch_stats
        recon_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, batch))
        kl = kl_divergence_mean(mu, logvar)
        loss = recon_loss + kl_w * kl
        return loss, (recon_loss, kl, new_stats)

    def train_step(self, state, batch, rng, epoch):
        def loss_fn(params):
            return self._loss(params, state.batch_stats, batch, rng, epoch, True)

        (loss, (recon, kl, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"train_loss": loss, "train_recon_loss": recon, "train_kl_div": kl}

    def eval_step(self, state, batch, rng, epoch):
        loss, (recon, kl, _) = self._loss(
            state.params, state.batch_stats, batch, rng, epoch, False
        )
        return {"val_loss": loss, "val_recon_loss": recon, "val_kl_div": kl}

    def decode(self, state, z):
        return self.model.apply(
            _variables(state), z, train=False, method=self.model.decode
        )

    def encode(self, state, x):
        return self.model.apply(
            _variables(state), x, train=False, method=self.model.encode
        )

    def sample_voxels(self, state, key, num_samples, mesh=None):
        """Prior draws -> decoded occupancy grids (networks.py:2446-2462).

        With ``mesh``, the prior latents are batch-sharded over the 'data'
        axis so the decode fans out across chips (same latents as the
        unsharded call — sharding is a layout, not a numerics change)."""
        z = jax.random.normal(key, (num_samples, self.model.latent_dim))
        if mesh is not None:
            from shapegen_tpu.parallel.mesh import batch_sharding

            z = jax.device_put(z, batch_sharding(mesh))
        return self.decode(state, z)


class VAE3DTask:
    """BCE(sum) + beta*KL(sum), fixed Adam lr=1e-3 (networks.py:1984-2206)."""

    def __init__(self, model, beta: float = 1e-1, lr: float = 1e-3):
        self.model = model
        self.beta = beta
        self.lr = lr
        self.hparams = {
            "task": "vae3d", "latent_dim": model.latent_dim, "beta": beta,
            "lr": lr, "compute_dtype": jnp.dtype(model.dtype).name,
        }

    def init_state(self, rng, sample_batch) -> TrainState:
        init_rng, re_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, sample_batch, re_rng, train=False)
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            make_adam(self.lr),
        )

    def make_scheduler(self):
        return None  # reference uses a bare Adam (networks.py:2041-2045)

    def _loss(self, params, batch_stats, batch, rng, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (logits, mu, logvar), mutated = self.model.apply(
                variables, batch, rng, train=True, mutable=["batch_stats"],
                method=self.model.forward_logits,
            )
            new_stats = mutated["batch_stats"]
        else:
            logits, mu, logvar = self.model.apply(
                variables, batch, rng, train=False,
                method=self.model.forward_logits,
            )
            new_stats = batch_stats
        recon_loss = jnp.sum(optax.sigmoid_binary_cross_entropy(logits, batch))
        kl = kl_divergence_sum(mu, logvar)
        return recon_loss + self.beta * kl, (recon_loss, kl, new_stats)

    def train_step(self, state, batch, rng, epoch):
        del epoch

        def loss_fn(params):
            return self._loss(params, state.batch_stats, batch, rng, True)

        (loss, (recon, kl, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {
            "train_loss": loss, "train_recon_loss": recon, "train_kl_loss": kl
        }

    def eval_step(self, state, batch, rng, epoch):
        del epoch
        loss, (recon, kl, _) = self._loss(
            state.params, state.batch_stats, batch, rng, False
        )
        return {"val_loss": loss, "val_recon_loss": recon, "val_kl_loss": kl}

    def decode(self, state, z):
        return self.model.apply(
            _variables(state), z, train=False, method=self.model.decode
        )

    def sample_voxels(self, state, key, num_samples):
        z = jax.random.normal(key, (num_samples, self.model.latent_dim))
        return self.decode(state, z)


class SimplePointNetVAETask:
    """chamfer + voxel-BCE + beta*KL(sum) (networks.py:1110-1410).

    NOTE: the voxel-BCE term flows through an index-based voxelize and is
    non-differentiable — zero gradient, exactly like the reference
    (networks.py:1285-1287 + utils.py:488-509; SURVEY.md hard part #7).
    """

    def __init__(self, model, lr=1e-4, beta=1e-1, chamfer_lambda=1.0,
                 voxel_lambda=1.0, max_epochs: int = 500):
        self.model = model
        self.lr = lr
        self.beta = beta
        self.chamfer_lambda = chamfer_lambda
        self.voxel_lambda = voxel_lambda
        self.max_epochs = max_epochs
        self.hparams = {
            "task": "simple_pointnet_vae",
            "num_points": model.num_points,
            "latent_dim": model.latent_dim,
            "lr": lr,
            "beta": beta,
            "compute_dtype": jnp.dtype(model.dtype).name,
        }

    def init_state(self, rng, sample_batch) -> TrainState:
        init_rng, re_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, sample_batch, re_rng, train=False)
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            make_adamw(self.lr),
        )

    def make_scheduler(self):
        return CosineAnnealingLR(self.lr, t_max=self.max_epochs)

    def _loss(self, params, batch_stats, batch, rng, train: bool):
        re_key, d_key = jax.random.split(rng)
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": d_key} if train else {}
        if train:
            (recon, mu, logvar), mutated = self.model.apply(
                variables, batch, re_key, train=True,
                mutable=["batch_stats"], rngs=rngs,
            )
            new_stats = mutated["batch_stats"]
        else:
            recon, mu, logvar = self.model.apply(
                variables, batch, re_key, train=False
            )
            new_stats = batch_stats
        # Differentiated CD: on TPU this takes the streaming Pallas kernel
        # (custom VJP — no (N, M) matrix through fwd+bwd), XLA elsewhere.
        chamfer = chamfer_distance(recon, batch)
        voxel = voxel_bce_recon_loss(recon, batch)
        recon_loss = self.chamfer_lambda * chamfer + self.voxel_lambda * voxel
        kl = kl_divergence_sum(mu, logvar)
        loss = recon_loss + self.beta * kl
        return loss, (recon_loss, chamfer, voxel, kl, new_stats)

    def train_step(self, state, batch, rng, epoch):
        del epoch

        def loss_fn(params):
            return self._loss(params, state.batch_stats, batch, rng, True)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        recon, chamfer, voxel, kl, new_stats = aux
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {
            "train_loss": loss, "train_recon_loss": recon,
            "train_chamfer_loss": chamfer, "train_voxel_loss": voxel,
            "train_kl_loss": kl,
        }

    def eval_step(self, state, batch, rng, epoch):
        del epoch
        loss, (recon, chamfer, voxel, kl, _) = self._loss(
            state.params, state.batch_stats, batch, rng, False
        )
        return {
            "val_loss": loss, "val_recon_loss": recon,
            "val_chamfer_loss": chamfer, "val_voxel_loss": voxel,
            "val_kl_loss": kl,
        }

    def decode(self, state, z):
        return self.model.apply(
            _variables(state), z, train=False, method=self.model.decode
        )

    def sample(self, state, key, num_samples, temp: float = 1.0):
        z = jax.random.normal(key, (num_samples, self.model.latent_dim)) * temp
        return self.decode(state, z)


class PointNetVAETask:
    """chamfer + beta*KL(sum) over the PointNet++/Folding VAE
    (networks.py:1620-1634)."""

    def __init__(self, model, lr=1e-4, beta=1e-1, max_epochs: int = 500):
        self.model = model
        self.lr = lr
        self.beta = beta
        self.max_epochs = max_epochs
        self.hparams = {
            "task": "pointnet_vae",
            "num_points": model.num_points,
            "latent_dim": model.latent_dim,
            "lr": lr,
            "beta": beta,
            "compute_dtype": jnp.dtype(model.dtype).name,
        }

    def init_state(self, rng, sample_batch) -> TrainState:
        init_rng, re_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, sample_batch, re_rng, train=False)
        return TrainState.create(
            self.model.apply,
            variables["params"],
            variables.get("batch_stats", {}),
            make_adamw(self.lr),
        )

    def make_scheduler(self):
        return CosineAnnealingLR(self.lr, t_max=self.max_epochs)

    def _loss(self, params, batch_stats, batch, rng, train: bool):
        re_key, fps_key = jax.random.split(rng)
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"fps": fps_key} if train else {}
        if train:
            (recon, mu, logvar), mutated = self.model.apply(
                variables, batch, re_key, train=True,
                mutable=["batch_stats"], rngs=rngs,
            )
            new_stats = mutated["batch_stats"]
        else:
            recon, mu, logvar = self.model.apply(variables, batch, re_key, train=False)
            new_stats = batch_stats
        # Differentiated CD: on TPU this takes the streaming Pallas kernel
        # (custom VJP — no (N, M) matrix through fwd+bwd), XLA elsewhere.
        recon_loss = chamfer_distance(recon, batch)
        kl = kl_divergence_sum(mu, logvar)
        return recon_loss + self.beta * kl, (recon_loss, kl, new_stats)

    def train_step(self, state, batch, rng, epoch):
        del epoch

        def loss_fn(params):
            return self._loss(params, state.batch_stats, batch, rng, True)

        (loss, (recon, kl, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {
            "train_loss": loss, "train_recon_loss": recon, "train_kl_loss": kl
        }

    def eval_step(self, state, batch, rng, epoch):
        del epoch
        loss, (recon, kl, _) = self._loss(
            state.params, state.batch_stats, batch, rng, False
        )
        return {"val_loss": loss, "val_recon_loss": recon, "val_kl_loss": kl}

    def decode(self, state, z):
        return self.model.apply(
            _variables(state), z, train=False, method=self.model.decode
        )

    def encode(self, state, x):
        return self.model.apply(
            _variables(state), x, train=False, method=self.model.encode
        )

    def sample(self, state, key, num_samples, temp: float = 1.0):
        z = jax.random.normal(key, (num_samples, self.model.latent_dim)) * temp
        return self.decode(state, z)
