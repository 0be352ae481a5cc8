"""DeepLabV3+ (capability-equivalent to the reference's
``smp.DeepLabV3Plus(..., decoder_atrous_rates=cfg["dilations"])`` factory at
``train_worker.py:163-170`` / ``test.py:94-101``).

Exact smp ``DeepLabV3PlusDecoder`` topology (so reference-trained ``.pth``
checkpoints convert one-to-one, ``utils/torch_weights.py``): ResNet encoder
at output-stride 16 (layer4 strides → dilations) → ASPP with the config's
atrous rates (reference default ``(3, 6, 9)`` from
``configs/train_config.yaml:24``) using depthwise-separable atrous convs +
global image pooling → 1×1 project to 256 + dropout(0.5) → separable 3×3
conv + BN + ReLU (smp ``aspp.1/aspp.2``) → 4× corner-aligned bilinear up
(``nn.UpsamplingBilinear2d``) → concat with the 48-channel projected
stride-4 skip → separable 3×3 conv → 1×1 head (smp passes ``kernel_size=1``
to ``SegmentationHead``) → 4× corner-aligned bilinear upsample to full
resolution.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.models.encoders import build_encoder
from pdac_pathological_image_segmentation_tpu.models.resnet import (
    BN_EPS,
    BN_MOMENTUM,
)
from pdac_pathological_image_segmentation_tpu.ops.resize import resize_bilinear


class _SeparableConvBNReLU(nn.Module):
    channels: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class _ConvBNReLU(nn.Module):
    channels: int
    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.channels, (self.kernel, self.kernel),
                    padding=self.kernel // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    channels: int = 256
    atrous_rates: Tuple[int, ...] = (3, 6, 9)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n, h, w, _ = x.shape
        branches = [_ConvBNReLU(self.channels, 1, dtype=self.dtype,
                                name="branch_1x1")(x, train=train)]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                _SeparableConvBNReLU(self.channels, dilation=rate,
                                     dtype=self.dtype,
                                     name=f"branch_r{i}")(x, train=train)
            )
        # image pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = _ConvBNReLU(self.channels, 1, dtype=self.dtype,
                             name="branch_pool")(pooled, train=train)
        pooled = jnp.broadcast_to(pooled, (n, h, w, self.channels))
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1)
        y = _ConvBNReLU(self.channels, 1, dtype=self.dtype,
                        name="project")(y, train=train)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class DeepLabV3Plus(nn.Module):
    num_classes: int = 1
    output_size: int = 512
    backbone: str = "resnet18"
    atrous_rates: Tuple[int, ...] = (3, 6, 9)
    decoder_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, c2, _, _, c5 = build_encoder(
            self.backbone, output_stride=16, dtype=self.dtype,
            name="encoder",
        )(x, train=train)

        y = ASPP(self.decoder_channels, self.atrous_rates, dtype=self.dtype,
                 name="aspp")(c5, train=train)
        # smp's DeepLabV3PlusDecoder runs one more separable 3×3 conv + BN +
        # ReLU after the ASPP projection (decoder.aspp.1 / aspp.2)
        y = _SeparableConvBNReLU(self.decoder_channels, dtype=self.dtype,
                                 name="aspp_sep")(y, train=train)
        # stride 16 → stride 4: smp nn.UpsamplingBilinear2d (corner-aligned)
        y = resize_bilinear(y.astype(jnp.float32), c2.shape[1], c2.shape[2],
                            align_corners=True)
        y = y.astype(self.dtype)

        skip = _ConvBNReLU(48, 1, dtype=self.dtype, name="skip_project")(
            c2, train=train)
        y = jnp.concatenate([y, skip], axis=-1)
        y = _SeparableConvBNReLU(self.decoder_channels, dtype=self.dtype,
                                 name="fuse")(y, train=train)

        # smp SegmentationHead with kernel_size=1 + UpsamplingBilinear2d(4)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="head")(y)
        y = resize_bilinear(y.astype(jnp.float32), self.output_size,
                            self.output_size, align_corners=True)
        return y
