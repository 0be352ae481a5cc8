"""Model factory keyed by ``cfg.model`` — mirrors the reference's if/elif
factories at ``train_worker.py:149-182`` and ``test.py:78-111`` (including
tolerating the ``"pspnet+"`` typo, which the config layer canonicalizes)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models.deeplabv3plus import DeepLabV3Plus
from pdac_pathological_image_segmentation_tpu.models.fpn import FPN
from pdac_pathological_image_segmentation_tpu.models.pspnet import PSPNet
from pdac_pathological_image_segmentation_tpu.models.resunet import ResUNet
from pdac_pathological_image_segmentation_tpu.models.unetplusplus import (
    UNetPlusPlus,
)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(cfg: Config) -> nn.Module:
    dtype = _DTYPES[cfg.compute_dtype]
    if cfg.model == "unet":
        # reference always builds ResUNet with the default resnet18 encoder
        # (train_worker.py:150 ignores cfg["backbone"] for "unet")
        return ResUNet(num_classes=cfg.num_classes, output_size=cfg.img_size,
                       backbone="resnet18", dtype=dtype)
    if cfg.model == "fpn":
        return FPN(num_classes=cfg.num_classes, output_size=cfg.img_size,
                   backbone=cfg.backbone, dtype=dtype)
    if cfg.model == "deeplabv3+":
        return DeepLabV3Plus(num_classes=cfg.num_classes,
                             output_size=cfg.img_size,
                             backbone=cfg.backbone,
                             atrous_rates=tuple(cfg.dilations), dtype=dtype)
    if cfg.model == "unet++":
        return UNetPlusPlus(num_classes=cfg.num_classes,
                            output_size=cfg.img_size,
                            backbone=cfg.backbone, dtype=dtype)
    if cfg.model == "pspnet":
        return PSPNet(num_classes=cfg.num_classes, output_size=cfg.img_size,
                      backbone=cfg.backbone, dtype=dtype)
    raise ValueError(f"unknown model {cfg.model!r}")
