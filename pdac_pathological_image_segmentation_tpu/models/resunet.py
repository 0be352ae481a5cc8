"""ResUNet — ResNet18-encoder U-Net with the reference's exact topology.

Reference: ``models/resunet.py:7-58``.  Faithfully reproduced details:

* encoder = resnet18; skips come from layer3/layer2/layer1 outputs (x4/x3/x2);
  the stem feature x1 is computed but **never concatenated** (reference quirk,
  ``models/resunet.py:25-33`` — the maxpooled stem only feeds layer1).
* decoder = 3 × [ConvTranspose(k2,s2) → concat skip → 3×3 conv → ReLU]
  over channels 512→256→128→64 (``models/resunet.py:36-46``), no BN.
* 1×1 conv to ``num_classes`` at 1/4 resolution, then a single bilinear
  ``align_corners=False`` upsample to ``output_size``
  (``models/resunet.py:48-56``).  Output is logits (sigmoid applied by
  callers, ``train_worker.py:72``).

``features()`` exposes the pre-head decoder activations so the fused Pallas
inference head (``ops/pallas/fused_head.py``) can consume them together with
the ``conv4`` parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.models.resnet import ResNetEncoder
from pdac_pathological_image_segmentation_tpu.ops.resize import resize_bilinear


class ResUNet(nn.Module):
    num_classes: int = 1
    output_size: int = 512
    backbone: str = "resnet18"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.encoder = ResNetEncoder(backbone=self.backbone, dtype=self.dtype)
        self.upconv1 = nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                        padding="VALID", dtype=self.dtype)
        self.conv1 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)
        self.upconv2 = nn.ConvTranspose(128, (2, 2), strides=(2, 2),
                                        padding="VALID", dtype=self.dtype)
        self.conv2 = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype)
        self.upconv3 = nn.ConvTranspose(64, (2, 2), strides=(2, 2),
                                        padding="VALID", dtype=self.dtype)
        self.conv3 = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype)
        self.conv4 = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)

    def features(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Encoder + decoder up to (excluding) the 1×1 head: N,H/4,W/4,64."""
        # x1 (stem) is the skip the reference computes but never uses
        _, x2, x3, x4, x5 = self.encoder(x, train=train)

        y = self.upconv1(x5)
        y = jnp.concatenate([y, x4], axis=-1)
        y = nn.relu(self.conv1(y))

        y = self.upconv2(y)
        y = jnp.concatenate([y, x3], axis=-1)
        y = nn.relu(self.conv2(y))

        y = self.upconv3(y)
        y = jnp.concatenate([y, x2], axis=-1)
        y = nn.relu(self.conv3(y))
        return y

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.conv4(self.features(x, train=train))
        # single 4× bilinear upsample, align_corners=False semantics
        y = resize_bilinear(y.astype(jnp.float32), self.output_size,
                            self.output_size)
        return y  # N,H,W,num_classes logits, float32
