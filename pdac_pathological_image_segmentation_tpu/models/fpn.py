"""FPN segmentation model (capability-equivalent to the reference's
``smp.FPN(encoder_name=backbone, classes=1, activation=None)`` factory call
at ``train_worker.py:153-161`` / ``test.py:82-92``).

Architecture (smp-style): ResNet encoder → top-down pyramid with 256-channel
lateral 1×1 convs and nearest 2× top-down upsampling → per-level segmentation
blocks (3×3 conv + GroupNorm + ReLU, upsampled to the stride-4 level) →
sum-merge → dropout(0.2) → 3×3 conv head to ``num_classes`` → 4× bilinear
upsample.  Output is logits at full resolution.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.models.encoders import build_encoder
from pdac_pathological_image_segmentation_tpu.ops.resize import resize_bilinear


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class _GNReLU(nn.Module):
    """GroupNorm(32)+ReLU with the same param tree as ``nn.GroupNorm``
    (scale/bias).  Inference uses the fused Pallas kernel
    (``ops/pallas/group_norm.py`` — 1.65 ms vs XLA's 3.06 ms on the FPN's
    [128,128,128,128] blocks, r1 measured); training and non-TPU backends
    use the identical-math XLA ops (the kernel has no VJP yet)."""

    num_groups: int = 32
    use_pallas: bool = True
    dtype: Any = jnp.float32
    # torch nn.GroupNorm default (what smp's Conv3x3GNReLU uses) — parity
    # with reference-trained FPN checkpoints
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if self.use_pallas and on_tpu:
            from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
                group_norm_relu,
                group_norm_relu_trainable,
            )

            if train:
                # Pallas forward + analytic XLA backward (custom VJP)
                return group_norm_relu_trainable(
                    x, scale, bias, self.num_groups, self.eps)
            return group_norm_relu(x, scale, bias,
                                   num_groups=self.num_groups, eps=self.eps)
        from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
            xla_group_norm_relu,
        )

        return xla_group_norm_relu(x, scale, bias,
                                   num_groups=self.num_groups, eps=self.eps)


class _Conv3x3GNReLU(nn.Module):
    channels: int
    upsample: bool = False
    use_pallas: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = _GNReLU(use_pallas=self.use_pallas, dtype=self.dtype,
                    name="GroupNorm_0")(x, train=train)
        if self.upsample:
            x = _upsample_nearest_2x(x)
        return x


class FPN(nn.Module):
    num_classes: int = 1
    output_size: int = 512
    backbone: str = "resnet18"
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    use_pallas: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, c2, c3, c4, c5 = build_encoder(
            self.backbone, dtype=self.dtype, name="encoder"
        )(x, train=train)

        pc = self.pyramid_channels
        p5 = nn.Conv(pc, (1, 1), dtype=self.dtype, name="lateral5")(c5)
        p4 = nn.Conv(pc, (1, 1), dtype=self.dtype, name="lateral4")(c4) + \
            _upsample_nearest_2x(p5)
        p3 = nn.Conv(pc, (1, 1), dtype=self.dtype, name="lateral3")(c3) + \
            _upsample_nearest_2x(p4)
        p2 = nn.Conv(pc, (1, 1), dtype=self.dtype, name="lateral2")(c2) + \
            _upsample_nearest_2x(p3)

        # segmentation blocks bring every level to stride 4
        outs = []
        for i, (p, n_up) in enumerate(((p5, 3), (p4, 2), (p3, 1), (p2, 0))):
            y = _Conv3x3GNReLU(self.segmentation_channels, upsample=n_up > 0,
                               use_pallas=self.use_pallas, dtype=self.dtype,
                               name=f"seg{i}_0")(p, train=train)
            for j in range(1, n_up):
                y = _Conv3x3GNReLU(self.segmentation_channels, upsample=True,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype,
                                   name=f"seg{i}_{j}")(y, train=train)
            outs.append(y)
        y = sum(outs)

        # smp uses Dropout2d (whole-channel dropout) — broadcast over H,W
        y = nn.Dropout(self.dropout, deterministic=not train,
                       broadcast_dims=(1, 2))(y)
        # smp's FPN passes kernel_size=1 to SegmentationHead (fpn/model.py) —
        # unlike Unet/PSPNet which use the default 3×3
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="head")(y)
        # smp SegmentationHead upsamples with nn.UpsamplingBilinear2d —
        # align_corners=True (unlike the ResUNet's interpolate(...,
        # align_corners=False))
        y = resize_bilinear(y.astype(jnp.float32), self.output_size,
                            self.output_size, align_corners=True)
        return y
