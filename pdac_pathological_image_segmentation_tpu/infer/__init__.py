from pdac_pathological_image_segmentation_tpu.infer.evaluate import (  # noqa: F401
    Evaluator,
)
