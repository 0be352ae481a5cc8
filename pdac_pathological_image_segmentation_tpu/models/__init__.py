from pdac_pathological_image_segmentation_tpu.models.deeplabv3plus import (  # noqa: F401
    ASPP,
    DeepLabV3Plus,
)
from pdac_pathological_image_segmentation_tpu.models.encoders import (  # noqa: F401
    build_encoder,
    encoder_feature_channels,
)
from pdac_pathological_image_segmentation_tpu.models.fpn import FPN  # noqa: F401
from pdac_pathological_image_segmentation_tpu.models.mobilenetv2 import (  # noqa: F401
    MobileNetV2Encoder,
)
from pdac_pathological_image_segmentation_tpu.models.pspnet import PSPNet  # noqa: F401
from pdac_pathological_image_segmentation_tpu.models.registry import (  # noqa: F401
    build_model,
)
from pdac_pathological_image_segmentation_tpu.models.resnet import (  # noqa: F401
    ResNetEncoder,
)
from pdac_pathological_image_segmentation_tpu.models.resunet import ResUNet  # noqa: F401
from pdac_pathological_image_segmentation_tpu.models.unetplusplus import (  # noqa: F401
    UNetPlusPlus,
)
