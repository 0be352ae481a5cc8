from pdac_pathological_image_segmentation_tpu.train.loop import (  # noqa: F401
    Trainer,
)
from pdac_pathological_image_segmentation_tpu.train.schedule import (  # noqa: F401
    ReduceLROnPlateau,
)
from pdac_pathological_image_segmentation_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
)
