from pdac_pathological_image_segmentation_tpu.data.discovery import (  # noqa: F401
    discover_split,
)
from pdac_pathological_image_segmentation_tpu.data.loader import (  # noqa: F401
    PatchDataset,
    PatchLoader,
)
from pdac_pathological_image_segmentation_tpu.data.synthetic import (  # noqa: F401
    generate_synthetic_patches,
)
