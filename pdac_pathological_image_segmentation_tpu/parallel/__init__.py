from pdac_pathological_image_segmentation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicated_sharding,
    sync_global_devices,
)
