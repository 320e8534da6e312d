from shapegen_tpu.utils.viz import (  # noqa: F401
    plot_point_cloud_3d,
    plot_point_cloud_2d,
    plot_comparison_point_clouds,
    save_point_cloud_comparison,
    save_three_point_cloud_comparison,
    save_to_ply,
    save_point_cloud,
    get_coords,
    voxel_grid_to_point_cloud,
    plot_voxels,
    plot_3d,
    plot_multiple_3d,
)
from shapegen_tpu.utils.profiling import StepTimer, trace  # noqa: F401
from shapegen_tpu.utils.logging import setup_logger  # noqa: F401
