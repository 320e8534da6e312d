from shapegen_tpu.metrics.metrics import (  # noqa: F401
    chamfer_distance,
    chamfer_distance_masked,
    pairwise_chamfer_matrix,
    pairwise_emd_matrix,
    earth_mover_distance_hungarian,
    sinkhorn_emd,
    voxel_bce_recon_loss,
    voxel_focal_loss,
    compute_metrics,
    compute_metrics_batched,
    coverage_and_mmd,
    one_nna,
)
