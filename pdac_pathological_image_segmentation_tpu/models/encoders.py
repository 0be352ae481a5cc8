"""Encoder factory — the smp ``encoder_name=`` dispatch point.

The reference forwards ``cfg["backbone"]`` verbatim into smp's encoder zoo
(``train_worker.py:153-182``, documented "e.g. mobilenet_v2 or
efficientnet-b7" at ``train_worker.py:155``).  Here the same string picks
one of the owned flax encoders; every decoder (FPN / DeepLabV3+ / PSPNet /
UNet++) builds its encoder through this factory, so a new family plugs
into all of them at once.  All encoders share one contract:
``encoder(x, train) -> [c1..c5]`` at strides ``[2, 4, 8, 16, 32]``.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn

from pdac_pathological_image_segmentation_tpu.models import efficientnet
from pdac_pathological_image_segmentation_tpu.models.efficientnet import (
    EfficientNetEncoder,
)
from pdac_pathological_image_segmentation_tpu.models.mobilenetv2 import (
    MobileNetV2Encoder,
)
from pdac_pathological_image_segmentation_tpu.models.resnet import (
    RESNET_CFGS,
    ResNetEncoder,
)

VALID_BACKBONES = (tuple(RESNET_CFGS) + ("mobilenet_v2",)
                   + tuple(efficientnet.VARIANTS))


def build_encoder(backbone: str, *, output_stride: int = 32,
                  dtype: Any, name: str = "encoder") -> nn.Module:
    """Build the encoder module for an smp-style backbone string."""
    if backbone == "mobilenet_v2":
        return MobileNetV2Encoder(output_stride=output_stride, dtype=dtype,
                                  name=name)
    if backbone in efficientnet.VARIANTS:
        return EfficientNetEncoder(variant=backbone,
                                   output_stride=output_stride, dtype=dtype,
                                   name=name)
    if backbone in RESNET_CFGS:
        return ResNetEncoder(backbone=backbone, output_stride=output_stride,
                             dtype=dtype, name=name)
    raise ValueError(
        f"unknown backbone {backbone!r}; supported: {VALID_BACKBONES}")


def encoder_feature_channels(backbone: str) -> List[int]:
    """Channels of ``[c1..c5]`` for a backbone string."""
    if backbone == "mobilenet_v2":
        return MobileNetV2Encoder.feature_channels()
    if backbone in efficientnet.VARIANTS:
        return efficientnet.feature_channels(backbone)
    if backbone in RESNET_CFGS:
        return ResNetEncoder.feature_channels(backbone)
    raise ValueError(
        f"unknown backbone {backbone!r}; supported: {VALID_BACKBONES}")
