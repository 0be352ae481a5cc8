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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Encoder (x1 is the stem feature the reference computes but never
        # skips; layer outputs are x2..x5 in the reference's naming)
        _, x2, x3, x4, x5 = ResNetEncoder(
            backbone=self.backbone, dtype=self.dtype, name="encoder"
        )(x, train=train)

        # Decoder — ConvTranspose k2 s2 ("VALID" ≡ torch p0: exact 2× upsample)
        y = nn.ConvTranspose(256, (2, 2), strides=(2, 2), padding="VALID",
                             dtype=self.dtype, name="upconv1")(x5)
        y = jnp.concatenate([y, x4], axis=-1)
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv1")(y))

        y = nn.ConvTranspose(128, (2, 2), strides=(2, 2), padding="VALID",
                             dtype=self.dtype, name="upconv2")(y)
        y = jnp.concatenate([y, x3], axis=-1)
        y = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                            name="conv2")(y))

        y = nn.ConvTranspose(64, (2, 2), strides=(2, 2), padding="VALID",
                             dtype=self.dtype, name="upconv3")(y)
        y = jnp.concatenate([y, x2], axis=-1)
        y = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                            name="conv3")(y))

        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv4")(y)

        # single 4× bilinear upsample, align_corners=False semantics
        y = resize_bilinear(y.astype(jnp.float32), self.output_size, self.output_size)
        return y  # N,H,W,num_classes logits, float32
