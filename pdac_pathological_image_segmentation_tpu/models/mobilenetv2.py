"""MobileNetV2 encoder (torchvision topology, NHWC, TPU-native).

The reference documents that any ``segmentation_models_pytorch`` encoder
string may be passed as ``cfg["backbone"]`` — "e.g. mobilenet_v2 or
efficientnet-b7" (reference ``train_worker.py:155``, the smp
``encoder_name=`` argument at ``train_worker.py:153-182``).  This is the
first non-ResNet member of that family here: a from-scratch flax.linen
re-implementation of torchvision ``mobilenet_v2().features`` in
channels-last layout, cut into smp's 5-stage feature pyramid
(``smp/encoders/mobilenet.py`` stage splits)::

    stage 1 = features[0:2]   stride  2, 16 ch
    stage 2 = features[2:4]   stride  4, 24 ch
    stage 3 = features[4:7]   stride  8, 32 ch
    stage 4 = features[7:14]  stride 16, 96 ch
    stage 5 = features[14:19] stride 32, 1280 ch

so ``[c1..c5]`` plugs into the same decoder contract as
:class:`~..models.resnet.ResNetEncoder`.  ``output_stride=16`` replaces
stage 5's stride with dilation 2 on the depthwise convs, following smp's
``make_dilated`` (every kernel>1 conv in the dilated stage gets the same
rate), which DeepLabV3+ requires.

Inverted-residual blocks use ReLU6 after the expand and depthwise convs,
a linear 1×1 projection, and a residual add when stride is 1 and the
channel count is preserved — exactly torchvision's ``InvertedResidual``
(expand ratio 6 everywhere except ``features[1]``'s ratio 1, which has no
expand conv).  Weight conversion from a torchvision/smp ``.pth`` lives in
``utils/torch_weights.convert_mobilenetv2_state_dict``.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # == torch momentum 0.1
BN_EPS = 1e-5

# torchvision inverted_residual_setting: (expand t, out channels, blocks, stride)
_IR_SETTING: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
# smp stage boundaries over torchvision features[0..18]
_STAGE_SPLITS = (2, 4, 7, 14, 19)


def relu6(x: jax.Array) -> jax.Array:
    return jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))


class _ConvBN(nn.Module):
    """Conv (optionally depthwise) + BatchNorm, optional ReLU6 — the
    torchvision ``ConvBNReLU`` unit (and, with ``act=False``, the linear
    projection conv+BN pair)."""

    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    depthwise: bool = False
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.kernel - 1) // 2 * self.dilation
        y = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=x.shape[-1] if self.depthwise else 1,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="bn",
        )(y)
        return relu6(y) if self.act else y


class InvertedResidual(nn.Module):
    """torchvision ``InvertedResidual``: [1×1 expand → ReLU6] (t>1 only) →
    3×3 depthwise(s) → ReLU6 → 1×1 linear project, residual add when
    ``strides == 1`` and in/out channels match."""

    features: int
    expand_ratio: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = _ConvBN(hidden, kernel=1, dtype=self.dtype,
                        name="expand")(y, train=train)
        y = _ConvBN(hidden, kernel=3, strides=self.strides,
                    dilation=self.dilation, depthwise=True,
                    dtype=self.dtype, name="depthwise")(y, train=train)
        y = _ConvBN(self.features, kernel=1, act=False, dtype=self.dtype,
                    name="project")(y, train=train)
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2Encoder(nn.Module):
    """MobileNetV2 feature extractor (no classifier head), smp stage
    contract: ``[c1, c2, c3, c4, c5]`` at strides ``[2, 4, 8, 16, 32]``
    with channels ``[16, 24, 32, 96, 1280]``.

    Submodule names mirror torchvision's ``features`` indices
    (``features_0`` … ``features_18``) so the weight converter is a
    direct index walk."""

    output_stride: int = 32
    dtype: Any = jnp.float32

    @staticmethod
    def feature_channels() -> List[int]:
        return [16, 24, 32, 96, 1280]

    def setup(self) -> None:
        blocks = []
        specs = []  # (kind, kwargs) per features index
        specs.append(("stem", dict(features=32, kernel=3, strides=2)))
        current_stride = 2
        dilation = 1
        for t, c, n, s in _IR_SETTING:
            for b in range(n):
                stride = s if b == 0 else 1
                if stride == 2:
                    if current_stride >= self.output_stride:
                        dilation *= 2
                        stride = 1
                    else:
                        current_stride *= 2
                specs.append(("ir", dict(features=c, expand_ratio=t,
                                         strides=stride,
                                         dilation=dilation)))
        specs.append(("last", dict(features=1280, kernel=1)))

        for i, (kind, kw) in enumerate(specs):
            name = f"features_{i}"
            if kind == "ir":
                blocks.append(InvertedResidual(dtype=self.dtype, name=name,
                                               **kw))
            else:
                blocks.append(_ConvBN(dtype=self.dtype, name=name, **kw))
        self.blocks = blocks

    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        feats: List[jax.Array] = []
        y = x.astype(self.dtype)
        start = 0
        for end in _STAGE_SPLITS:
            for i in range(start, end):
                y = self.blocks[i](y, train=train)
            feats.append(y)
            start = end
        return feats
