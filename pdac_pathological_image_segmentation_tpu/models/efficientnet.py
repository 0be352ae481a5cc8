"""EfficientNet-b0…b7 encoders (efficientnet-pytorch topology, NHWC).

The reference documents that any ``segmentation_models_pytorch`` encoder
string may be passed as ``cfg["backbone"]`` — "e.g. mobilenet_v2 or
efficientnet-b7" (reference ``train_worker.py:155``).  With this module
both encoder names the reference explicitly cites exist here.  It is a
from-scratch flax.linen re-implementation of the ``efficientnet-pytorch``
model family that smp's ``EfficientNetEncoder`` wraps, in channels-last
layout, cut into smp's 5-stage feature pyramid:

    c1 = stem (stride 2)                c4 = base stages 4-5 (stride 16)
    c2 = base stages 1-2 (stride 4)     c5 = base stages 6-7 (stride 32)
    c3 = base stage  3   (stride 8)

which for b0 gives channels ``[32, 24, 40, 112, 320]`` and for b7
``[64, 48, 80, 224, 640]`` — exactly smp's ``out_channels[1:]`` — so
``[c1..c5]`` plugs into the same decoder contract as
:class:`~..models.resnet.ResNetEncoder`.  Stage boundaries are derived
from the stride transitions of the scaled block list rather than
hard-coded, so every width/depth multiplier pairs with the right splits.

Per-variant scaling follows the paper/efficientnet-pytorch exactly:
``round_filters`` (divisor 8, +divisor when rounding loses >10%) and
``round_repeats`` (ceil).  MBConv = 1×1 expand → BN → SiLU (skipped when
expand ratio is 1) → k×k depthwise (TF-SAME padding) → BN → SiLU →
squeeze-excite (reduce to ``max(1, int(in_ch·0.25))`` of the block's
*input* channels) → 1×1 linear project → BN, with an identity skip when
stride is 1 and channels match.  BatchNorm uses eps 1e-3 and torch
momentum 0.01 (flax momentum 0.99) per efficientnet-pytorch's
``batch_norm_momentum=0.99``.  Drop-connect (stochastic depth) is a
train-time regularizer in efficientnet-pytorch; it is intentionally not
replicated — at inference it is identity, and the reference only ever
consumes pretrained encoders through smp.

``output_stride=16`` (DeepLabV3+) follows smp's ``make_dilated``: the
stride-32 stage's stride-2 block becomes stride 1 and every kernel>1
conv in that stage gets dilation 2.

Weight conversion from an efficientnet-pytorch ``.pth`` lives in
``utils/torch_weights.convert_efficientnet_state_dict``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.99  # == torch momentum 0.01 (batch_norm_momentum=0.99)
BN_EPS = 1e-3

# base (b0) stages: (expand t, out channels, repeats, stride, kernel)
_BASE_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# (width_mult, depth_mult) per variant
VARIANTS: Dict[str, Tuple[float, float]] = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
}

_SE_RATIO = 0.25
_DIVISOR = 8


def round_filters(filters: int, width_mult: float) -> int:
    """efficientnet-pytorch ``round_filters`` (divisor 8)."""
    filters *= width_mult
    new_filters = max(_DIVISOR,
                      int(filters + _DIVISOR / 2) // _DIVISOR * _DIVISOR)
    if new_filters < 0.9 * filters:  # never round down by >10%
        new_filters += _DIVISOR
    return int(new_filters)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def block_specs(variant: str) -> List[Dict[str, int]]:
    """Scaled, flattened per-block specs (the ``_blocks`` list) for a
    variant: dicts of in/out channels, expand ratio, kernel, stride."""
    if variant not in VARIANTS:
        raise ValueError(
            f"unknown efficientnet variant {variant!r}; "
            f"supported: {tuple(VARIANTS)}")
    w, d = VARIANTS[variant]
    specs: List[Dict[str, int]] = []
    in_ch = round_filters(32, w)  # stem output
    for t, c, r, s, k in _BASE_STAGES:
        out_ch = round_filters(c, w)
        for b in range(round_repeats(r, d)):
            specs.append(dict(in_ch=in_ch, out_ch=out_ch, expand=t,
                              kernel=k, stride=s if b == 0 else 1))
            in_ch = out_ch
    return specs


def stage_splits(variant: str) -> Tuple[int, int, int, int]:
    """smp ``stage_idxs`` — block-list boundaries of the stride-4/8/16/32
    feature groups, derived from where the stride-2 blocks sit."""
    specs = block_specs(variant)
    # boundary k means blocks[..k) ends a resolution group; a group ends
    # right before the NEXT stride-2 block.
    bounds = [i for i, sp in enumerate(specs) if sp["stride"] == 2]
    # specs[0] group (stride 4 after stem+first s2) structure: stem is
    # stride 2; first stride-2 block starts the stride-4 group, etc.
    # bounds[j] = index of the block that *opens* resolution group j+1.
    if len(bounds) != 4:
        raise AssertionError(f"expected 4 stride-2 blocks, got {bounds}")
    return (bounds[1], bounds[2], bounds[3], len(specs))


def feature_channels(variant: str) -> List[int]:
    """Channels of ``[c1..c5]`` (== smp ``out_channels[1:]``)."""
    w, _ = VARIANTS[variant]
    specs = block_specs(variant)
    i0, i1, i2, n = stage_splits(variant)
    return [round_filters(32, w), specs[i0 - 1]["out_ch"],
            specs[i1 - 1]["out_ch"], specs[i2 - 1]["out_ch"],
            specs[n - 1]["out_ch"]]


def _silu(x: jax.Array) -> jax.Array:
    return x * nn.sigmoid(x)


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(use_running_average=not train,
                            momentum=BN_MOMENTUM, epsilon=BN_EPS,
                            dtype=self.dtype, name="bn")(x)


class MBConv(nn.Module):
    """efficientnet-pytorch ``MBConvBlock`` (without drop-connect): expand →
    depthwise → squeeze-excite → linear project, identity skip when
    ``stride == 1`` and in/out channels match."""

    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = self.in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = _BN(self.dtype, name="expand_bn")(y, train)
            y = _silu(y)
        y = nn.Conv(hidden, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="depthwise_conv")(y)
        y = _BN(self.dtype, name="depthwise_bn")(y, train)
        y = _silu(y)
        # squeeze-excite over the block's INPUT channel count
        # (efficientnet-pytorch: int(input_filters * se_ratio))
        squeezed = max(1, int(self.in_ch * _SE_RATIO))
        s = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = s.astype(self.dtype)
        s = nn.Conv(squeezed, (1, 1), use_bias=True, dtype=self.dtype,
                    name="se_reduce")(s)
        s = _silu(s)
        s = nn.Conv(hidden, (1, 1), use_bias=True, dtype=self.dtype,
                    name="se_expand")(s)
        y = y * nn.sigmoid(s)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = _BN(self.dtype, name="project_bn")(y, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    """EfficientNet feature extractor, smp stage contract:
    ``[c1..c5]`` at strides ``[2, 4, 8, 16, 32]``.

    Submodule names mirror efficientnet-pytorch's (``stem`` +
    ``blocks_0 … blocks_{N-1}``) so the weight converter is a direct
    index walk over ``_blocks.N``."""

    variant: str = "efficientnet-b0"
    output_stride: int = 32
    dtype: Any = jnp.float32

    def setup(self) -> None:
        w, _ = VARIANTS[self.variant]
        stem_ch = round_filters(32, w)
        self.stem_conv = nn.Conv(stem_ch, (3, 3), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype, name="stem_conv")
        self.stem_bn = _BN(self.dtype, name="stem_bn")
        specs = block_specs(self.variant)
        self.splits = stage_splits(self.variant)
        # smp make_dilated: collapse strides past output_stride into
        # dilation on the kernel>1 convs of the affected stage(s).
        current_stride = 2  # after stem
        dilation = 1
        blocks = []
        for i, sp in enumerate(specs):
            stride, dil = sp["stride"], 1
            if stride == 2:
                if current_stride >= self.output_stride:
                    dilation *= 2
                    stride = 1
                else:
                    current_stride *= 2
            dil = dilation if sp["kernel"] > 1 else 1
            blocks.append(MBConv(
                in_ch=sp["in_ch"], out_ch=sp["out_ch"], expand=sp["expand"],
                kernel=sp["kernel"], stride=stride, dilation=dil,
                dtype=self.dtype, name=f"blocks_{i}"))
        self.blocks = blocks

    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        y = x.astype(self.dtype)
        y = self.stem_conv(y)
        y = self.stem_bn(y, train)
        y = _silu(y)
        feats: List[jax.Array] = [y]
        start = 0
        for end in self.splits:
            for i in range(start, end):
                y = self.blocks[i](y, train=train)
            feats.append(y)
            start = end
        return feats
