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
        head_dtype = _DTYPES[
            str(cfg.extras.get("head_dtype", "float32")).lower()
        ]
        return ResUNet(num_classes=cfg.num_classes, output_size=cfg.img_size,
                       backbone="resnet18", dtype=dtype,
                       head_dtype=head_dtype,
                       stage0_residual_barrier=bool(
                           cfg.extras.get("layer1_barrier", False)))
    if cfg.model == "fpn":
        # Pallas GN wins standalone (1.65 vs 3.06 ms) but loses in-model
        # (59.9 vs 52.1 ms/step): the custom call forces standard layouts,
        # inserting two full-tensor copies around each of the 7 GN sites.
        # Off by default per keep-whichever-wins; cfg extra
        # `fpn_pallas_gn: true` opts in.
        return FPN(num_classes=cfg.num_classes, output_size=cfg.img_size,
                   backbone=cfg.backbone,
                   use_pallas=bool(cfg.extras.get("fpn_pallas_gn", False)),
                   dtype=dtype)
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
