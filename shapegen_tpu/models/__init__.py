from shapegen_tpu.models import layers  # noqa: F401
from shapegen_tpu.models.point_unet import (  # noqa: F401
    PointUNetLarge,
    SimplePointUNet,
    PointUNetLargeWithAttention,
    UNetAttentionPoint,
)
from shapegen_tpu.models.latent_unet import SimpleLatentUNet  # noqa: F401
from shapegen_tpu.models.vae3d import VAE3D, VAE3DLarge  # noqa: F401
from shapegen_tpu.models.point_vae import (  # noqa: F401
    SimplePointNetVAE,
    PointNetVAE,
    PointNetVAEExperimental,
)
