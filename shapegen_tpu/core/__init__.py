from shapegen_tpu.core import schedules, diffusion, samplers  # noqa: F401
