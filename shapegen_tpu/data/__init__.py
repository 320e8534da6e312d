from shapegen_tpu.data.dataset import (  # noqa: F401
    PointCloudDataset,
    PointCloudDataDirectoryModule,
    PointCloudDataModule,
    load_dd,
    save_dd,
)
from shapegen_tpu.data.synsets import SHAPENET_ID_TO_CATEGORY  # noqa: F401
