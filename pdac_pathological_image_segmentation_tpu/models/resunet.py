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

``features()`` exposes the pre-head decoder activations for streaming
consumers that fuse their own head (e.g. quantized serving,
``infer/quantized.py``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.models.resnet import ResNetEncoder
from pdac_pathological_image_segmentation_tpu.ops.resize import resize_bilinear


class PointwiseHead(nn.Module):
    """1×1 conv head computed as an einsum over the channel axis.

    Parameter tree is identical to ``nn.Conv(features, (1, 1))`` (``kernel``
    (1,1,C,F) + ``bias`` (F,)), so checkpoints and the reference ``.pth``
    converter are unaffected.  The payoff is the ``features == 1`` case (the
    reference's binary head): an NHWC conv writing C=1 puts the channel in
    the 128-lane minormost tile position — 127/128 of the output writes are
    padding (measured 8.2 ms/step of a 112 ms ResUNet inference step at
    bs=512 on v5e).  The einsum emits a dense N,H,W tensor instead.
    """

    features: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel[0, 0].astype(self.dtype)  # (C, F)
        b = bias.astype(self.dtype)
        if self.features == 1:
            return jnp.einsum("nhwc,c->nhw", x, k[:, 0]) + b[0]  # N,H,W
        return jnp.einsum("nhwc,cf->nhwf", x, k) + b


class ConcatConv(nn.Module):
    """3×3 conv over a channel-concat ``[a, b]`` without materializing the
    concat.

    ``conv(concat(a, b), W) ≡ conv(a, W[:,:,:Ca]) + conv(b, W[:,:,Ca:])`` —
    exact up to f32-accumulator addition order.  XLA:TPU materializes a
    concatenate feeding a convolution as a real HBM tensor (at bs=512/512²
    the three decoder concats total ~3.7 GB of extra write+read traffic per
    step); splitting the conv reads each operand once from where it already
    lives and fuses the add into the second conv's epilogue.

    The parameter tree (``kernel`` (3,3,Ca+Cb,F) + ``bias`` (F,)) is
    identical to ``nn.Conv(F, (3,3), padding=1)`` over the concat, so
    checkpoints and the reference ``.pth`` converter are unaffected
    (reference decoder convs: ``models/resunet.py:36-46``)."""

    features: int
    dtype: Any = jnp.float32
    split: bool = True

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, ca + cb, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)

        def conv(x, kk):
            return jax.lax.conv_general_dilated(
                x, kk, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.split:
            y = conv(a, k[:, :, :ca]) + conv(b, k[:, :, ca:])
        else:
            y = conv(jnp.concatenate([a, b], axis=-1), k)
        return y + bias.astype(self.dtype)


class UpConv(nn.Module):
    """2× upsample: ``ConvTranspose(k=2, s=2, VALID)`` computed as an einsum
    + pixel-shuffle reshape.

    A k2/s2 transposed conv has no tap overlap — every output pixel is one
    ``C×F`` contraction — so it is exactly ``x @ W'`` to (N,H,W,2,2,F)
    followed by an interleaving reshape.  XLA:TPU lowers the einsum to a
    full-utilization MXU matmul, where the ``lax.conv_transpose`` lowering
    (input dilation) wastes cycles on inserted zeros (measured 45.3 vs
    23.9 ms isolated at bs=512 on the 64²·128ch decoder stage).

    Parameter tree is identical to ``nn.ConvTranspose`` (``kernel``
    (2,2,C,F) + ``bias`` (F,)); ``W'`` is the spatially flipped kernel —
    ``lax.conv_transpose(transpose_kernel=False)`` correlates with the
    flipped taps (verified vs flax on CPU), so checkpoints and the
    reference ``.pth`` converter are unaffected."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel[::-1, ::-1].astype(self.dtype)
        z = jnp.einsum("nhwc,ijcf->nhiwjf", x, k)
        z = z.reshape(n, 2 * h, 2 * w, self.features)
        return z + bias.astype(self.dtype)


class ResUNet(nn.Module):
    num_classes: int = 1
    output_size: int = 512
    backbone: str = "resnet18"
    dtype: Any = jnp.float32
    # dtype of the 4× bilinear upsample + output logits.  float32 preserves
    # the reference's interpolate() numerics bit-for-bit; bfloat16 halves the
    # HBM traffic of the largest output-path tensors (config extra
    # ``head_dtype: bfloat16`` — serving-path option, ~2 ms/step at bs=512).
    head_dtype: Any = jnp.float32
    # decoder upsamples as einsum+pixel-shuffle (UpConv) instead of
    # lax.conv_transpose — same params/math, different lowering.  Off by
    # default: einsum wins isolated (23.9 vs 45.3 ms) but LOSES in-model
    # (4,342 vs 4,440 patches/s end-to-end) — XLA fuses the transposed conv
    # with the neighboring ConcatConv adds; keep-whichever-wins
    upconv_einsum: bool = False
    # layer1 residual-add fusion barrier (see models/resnet.BasicBlock)
    stage0_residual_barrier: bool = False

    def setup(self) -> None:
        self.encoder = ResNetEncoder(
            backbone=self.backbone, dtype=self.dtype,
            stage0_residual_barrier=self.stage0_residual_barrier,
        )

        def up(features):
            if self.upconv_einsum:
                return UpConv(features, dtype=self.dtype)
            return nn.ConvTranspose(features, (2, 2), strides=(2, 2),
                                    padding="VALID", dtype=self.dtype)

        self.upconv1 = up(256)
        self.conv1 = ConcatConv(256, dtype=self.dtype)
        self.upconv2 = up(128)
        self.conv2 = ConcatConv(128, dtype=self.dtype)
        self.upconv3 = up(64)
        self.conv3 = ConcatConv(64, dtype=self.dtype)
        self.conv4 = PointwiseHead(self.num_classes, dtype=self.dtype)

    def features(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Encoder + decoder up to (excluding) the 1×1 head: N,H/4,W/4,64."""
        # x1 (stem) is the skip the reference computes but never uses
        _, x2, x3, x4, x5 = self.encoder(x, train=train)
        return self._decode(x2, x3, x4, x5)

    def _decode(self, x2, x3, x4, x5) -> jax.Array:
        # concat(upsampled, skip) → conv runs as a split conv-sum
        # (ConcatConv): same math, no materialized concat tensors
        y = nn.relu(self.conv1(self.upconv1(x5), x4))
        y = nn.relu(self.conv2(self.upconv2(y), x3))
        y = nn.relu(self.conv3(self.upconv3(y), x2))
        return y

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = self.conv4(self.features(x, train=train))
        if self.num_classes == 1:
            y = y[..., None]  # dense N,H,W from the head → N,H,W,1 (free)
        # single 4× bilinear upsample, align_corners=False semantics
        y = resize_bilinear(y.astype(self.head_dtype), self.output_size,
                            self.output_size, compute_dtype=self.head_dtype)
        return y  # N,H,W,num_classes logits, head_dtype (float32 default)
