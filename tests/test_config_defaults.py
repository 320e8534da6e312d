"""SURVEY §7 parity checklist: the reference's hardcoded constants survive
as our config defaults (seed 24, batch 16, wd 1e-5, thresholds, bounds...)."""

from shapegen_tpu import config


def test_data_defaults():
    d = config.DataConfig()
    assert d.num_points == 2048
    assert d.batch_size == 16
    assert d.num_workers == 4
    assert d.train_val_split == 0.8
    assert d.seed == 24
    assert d.augmentations is False


def test_diffusion_defaults():
    c = config.DiffusionConfig()
    assert c.dim == 256 and c.time_dim == 256
    assert c.lr == 1e-4 and c.weight_decay == 1e-5
    assert c.noise_schedule == "cosine"
    assert c.linear_min_rate == 1e-4 and c.linear_max_rate == 0.02
    assert c.cosine_min_signal_rate == 0.02
    assert c.cosine_max_signal_rate == 0.95
    assert c.num_sample_steps == 1000
    assert c.plateau_factor == 0.5 and c.plateau_patience == 5


def test_ldm_defaults():
    c = config.LatentDiffusionConfig()
    assert c.latent_dim == 256 and c.dim == 512 and c.time_dim == 256
    assert c.is_voxel_based is True
    assert c.sample_threshold == 0.4  # diffusion.py:576,620
    assert c.cosine_eta_min == 1e-6


def test_vae_defaults():
    c = config.VAE3DLargeConfig()
    assert c.input_shape == (32, 32, 32)
    assert c.latent_dim == 256
    assert c.kl_warmup_epochs == 10
    assert c.kl_warmup_max_beta == 0.1
    assert c.kl_annealing_epochs == 100
    assert c.sample_threshold == 0.4


def test_eval_defaults():
    c = config.EvalConfig()
    assert c.num_samples == 16
    assert c.num_steps == 1000
    assert c.initial_t == 0.010
    assert c.vae_threshold == 0.5  # test_point_ldm.py:128
    assert c.use_approximate_gpu_emd is False


def test_train_defaults():
    c = config.TrainRunConfig()
    assert c.max_epochs == 500
    assert c.save_top_k == 10


def test_point_diffusion_hparams_roundtrip_extensions():
    """lr_schedule and compute_dtype survive the checkpoint hparams ->
    factory round trip (a resumed run must not silently revert them)."""
    import jax.numpy as jnp

    from shapegen_tpu import models
    from shapegen_tpu.train import tasks
    from shapegen_tpu.train.factory import task_from_hparams

    model = models.PointUNetLarge(dim=32, time_dim=32, dtype=jnp.bfloat16)
    task = tasks.PointDiffusionTask(
        model, num_points=64, lr_schedule="none"
    )
    rebuilt = task_from_hparams(task.hparams)
    assert rebuilt.lr_schedule == "none"
    assert rebuilt.make_scheduler() is None
    assert rebuilt.model.dtype == jnp.bfloat16


def test_ldm_tasks_compute_dtype_roundtrip():
    """The LDM-pipeline tasks (VAE3D/VAE3DLarge/SimpleLatentUNet and the
    point VAEs) record compute_dtype in hparams and the factory honors it,
    so --resume / --skip-vae-training + --vae-checkpoint keep bf16 compute
    instead of silently reverting to f32."""
    import jax.numpy as jnp

    from shapegen_tpu import models
    from shapegen_tpu.train import tasks
    from shapegen_tpu.train.factory import task_from_hparams

    vae = models.VAE3DLarge(latent_dim=32, dtype=jnp.bfloat16)
    t = tasks.VAE3DLargeTask(vae)
    assert task_from_hparams(t.hparams).model.dtype == jnp.bfloat16

    t = tasks.VAE3DTask(models.VAE3D(latent_dim=32, dtype=jnp.bfloat16))
    assert task_from_hparams(t.hparams).model.dtype == jnp.bfloat16

    unet = models.SimpleLatentUNet(latent_dim=32, dim=64, dtype=jnp.bfloat16)
    t = tasks.LatentDiffusionTask(unet, vae, {"params": {}}, latent_dim=32)
    rebuilt = task_from_hparams(t.hparams, vae_model=vae, vae_variables={"params": {}})
    assert rebuilt.model.dtype == jnp.bfloat16

    t = tasks.SimplePointNetVAETask(
        models.SimplePointNetVAE(num_points=64, latent_dim=32, dtype=jnp.bfloat16)
    )
    assert task_from_hparams(t.hparams).model.dtype == jnp.bfloat16

    t = tasks.PointNetVAETask(
        models.PointNetVAE(num_points=64, latent_dim=32, dtype=jnp.bfloat16)
    )
    assert task_from_hparams(t.hparams).model.dtype == jnp.bfloat16
