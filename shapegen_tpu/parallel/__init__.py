from shapegen_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    data_axis_size,
    replicated_sharding,
    shard_batch,
    global_batch_from_local,
    replicate_state,
    shard_state,
    tree_shardings,
    shard_sample_count,
)
from shapegen_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    shard_for_host,
    shard_files_for_host,
)
