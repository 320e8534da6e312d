"""shapegen_tpu — a TPU-native 3D shape generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dhillon24/3d-shape-generation (PyTorch/Lightning, single GPU):

* Point-cloud DDPM/DDIM diffusion on (B, N, 3) clouds
  (reference: diffusion.py:14-358) — here a pure functional core with
  ``lax.scan`` samplers compiled into a single XLA program.
* 3D voxel VAEs on 32^3 occupancy grids (reference: networks.py:1984-2490).
* Latent diffusion in a frozen VAE's latent space
  (reference: diffusion.py:361-734).
* Chamfer / EMD (exact Hungarian + device Sinkhorn) / voxel-BCE eval suite
  (reference: metrics.py) plus new coverage/MMD extensions.
* ShapeNet ``.dd`` (HDF5) data pipeline (reference: data.py).

Design stance: functional models (flax.linen), explicit PRNG threading,
static shapes everywhere (ragged voxel->point conversion becomes padded
buffers + masks), ``jax.sharding.Mesh`` data parallelism over ICI, Orbax
checkpoints, and Pallas kernels for the pairwise-distance hot paths.
"""

__version__ = "0.1.0"

from shapegen_tpu.core import schedules, diffusion, samplers  # noqa: F401
