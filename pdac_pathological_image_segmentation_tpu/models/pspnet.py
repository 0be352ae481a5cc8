"""PSPNet (capability-equivalent to the reference's
``smp.PSPNet(..., psp_use_batchnorm=True)`` factory at
``train_worker.py:172-182`` — note the reference's *test* script can never
build it due to the ``"pspnet+"`` key typo at ``test.py:101``; we accept both
spellings, see ``config.py``).

Exact smp ``PSPDecoder`` topology (so reference-trained ``.pth`` checkpoints
convert one-to-one, ``utils/torch_weights.py``): encoder depth 3 (deepest
feature at stride 8) → pyramid pooling module over bin sizes (1, 2, 3, 6) —
each branch adaptive-avg-pool → 1×1 conv (+BN except the 1×1 bin, where smp
disables BatchNorm and the conv carries a bias) → ReLU → corner-aligned
bilinear upsample back to the feature size — concatenated as
``[branches..., identity]`` (smp appends the input LAST) → 1×1 conv to 512 +
BN + ReLU → channel dropout(0.2) → 3×3 head → 8× corner-aligned bilinear
upsample (``nn.UpsamplingBilinear2d``).
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


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """torch ``AdaptiveAvgPool2d`` on NHWC: variable windows
    [floor(i·H/s), ceil((i+1)·H/s)).  ``out_size`` is tiny (≤6) and static,
    so the python loops unroll into a handful of fused slice-means."""
    n, h, w, c = x.shape
    rows = []
    for i in range(out_size):
        h0, h1 = (i * h) // out_size, -(-((i + 1) * h) // out_size)
        cols = []
        for j in range(out_size):
            w0, w1 = (j * w) // out_size, -(-((j + 1) * w) // out_size)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # N, s, s, C


class _PSPBranch(nn.Module):
    pool_size: int
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        y = adaptive_avg_pool(x, self.pool_size)
        # smp PSPBlock: the 1×1 bin gets NO BatchNorm ("PyTorch does not
        # support BatchNorm for 1x1 shape" in smp's decoder) — its conv
        # carries the bias instead
        use_bn = self.pool_size > 1
        y = nn.Conv(self.channels, (1, 1), use_bias=not use_bn,
                    dtype=self.dtype, name="conv")(y)
        if use_bn:
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        # smp PSPBlock upsamples with align_corners=True
        return resize_bilinear(y.astype(jnp.float32), h, w,
                               align_corners=True).astype(self.dtype)


class PSPNet(nn.Module):
    num_classes: int = 1
    output_size: int = 512
    backbone: str = "resnet18"
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    psp_out_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # encoder depth 3: deepest used feature is layer2's output (stride 8)
        _, _, c3, _, _ = build_encoder(
            self.backbone, dtype=self.dtype, name="encoder"
        )(x, train=train)

        in_ch = c3.shape[-1]
        branch_ch = in_ch // len(self.pool_sizes)
        # smp PSPModule concat order: pooled branches first, identity LAST
        branches = [
            _PSPBranch(pool_size=s, channels=branch_ch, dtype=self.dtype,
                       name=f"psp_{s}")(c3, train=train)
            for s in self.pool_sizes
        ]
        y = jnp.concatenate(branches + [c3], axis=-1)

        y = nn.Conv(self.psp_out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="bottleneck_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype,
                         name="bottleneck_bn")(y)
        y = nn.relu(y)
        # smp uses Dropout2d (whole-channel dropout) — broadcast over H,W
        y = nn.Dropout(0.2, deterministic=not train,
                       broadcast_dims=(1, 2))(y)

        y = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                    name="head")(y)
        # smp SegmentationHead: UpsamplingBilinear2d(8) — corner-aligned
        y = resize_bilinear(y.astype(jnp.float32), self.output_size,
                            self.output_size, align_corners=True)
        return y
