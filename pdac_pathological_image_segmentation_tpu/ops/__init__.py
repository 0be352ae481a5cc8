from pdac_pathological_image_segmentation_tpu.ops.dice import (  # noqa: F401
    dice_loss,
    dice_score,
    weighted_dice_ce_loss,
)
from pdac_pathological_image_segmentation_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
)
