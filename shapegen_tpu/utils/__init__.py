from shapegen_tpu.utils.viz import (  # noqa: F401
    plot_point_cloud_3d,
    plot_point_cloud_2d,
    plot_comparison_point_clouds,
    save_point_cloud_comparison,
    save_three_point_cloud_comparison,
    save_to_ply,
    save_point_cloud,
)
from shapegen_tpu.utils.logging import setup_logger  # noqa: F401
