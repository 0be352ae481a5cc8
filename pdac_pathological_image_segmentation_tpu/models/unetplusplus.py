"""U-Net++ (nested U-Net) with a ResNet encoder — the "deeper variant" of
BASELINE.json config #3 (a framework extension; the reference repo offers
only ResUNet/FPN/DeepLabV3+/PSPNet, ``train_worker.py:149-182``).

Zhou et al. 2018 topology: decoder node ``X(i, j)`` consumes the dense skip
chain ``X(i, 0..j-1)`` plus the 2× upsample of ``X(i+1, j-1)``; each node is
two conv-BN-ReLU blocks.  Encoder features come from ``ResNetEncoder`` at
strides (2, 4, 8, 16, 32); the last decoder column ends at stride 2 and the
head bilinearly upsamples 2× to full resolution.
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


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class _DoubleConv(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNetPlusPlus(nn.Module):
    num_classes: int = 1
    output_size: int = 512
    backbone: str = "resnet18"
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = build_encoder(
            self.backbone, dtype=self.dtype, name="encoder"
        )(x, train=train)  # [c1@2, c2@4, c3@8, c4@16, c5@32]

        depth = len(feats) - 1  # 4 decoder rows
        # grid[i][j] = X(i, j); X(i, 0) = encoder feature at level i
        grid = {(i, 0): feats[i] for i in range(len(feats))}
        for j in range(1, depth + 1):
            for i in range(0, depth + 1 - j):
                up = _upsample_nearest_2x(grid[(i + 1, j - 1)])
                skips = [grid[(i, k)] for k in range(j)]
                y = jnp.concatenate(skips + [up], axis=-1)
                # deepest decoder row gets the widest channel count
                ch = self.decoder_channels[
                    max(len(self.decoder_channels) - 1 - i, 0)
                ]
                grid[(i, j)] = _DoubleConv(
                    ch, dtype=self.dtype, name=f"x_{i}_{j}"
                )(y, train=train)

        y = grid[(0, depth)]  # stride 2
        y = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                    name="head")(y)
        y = resize_bilinear(y.astype(jnp.float32), self.output_size,
                            self.output_size)
        return y
