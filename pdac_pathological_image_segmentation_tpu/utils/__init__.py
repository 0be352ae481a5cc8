from pdac_pathological_image_segmentation_tpu.utils.meters import (  # noqa: F401
    AverageMeter,
    EarlyStop,
)
