"""ResNet encoder family (torchvision-topology, NHWC, TPU-native).

The reference pulls ``torchvision.models.resnet18(ImageNet)`` as the encoder
for all four architectures (reference ``models/resunet.py:12`` and the
``encoder_name=cfg["backbone"]`` smp factory calls at
``train_worker.py:149-182``).  This is a from-scratch flax.linen
re-implementation in channels-last layout with the exact torchvision
topology (7×7/2 stem, 3×3/2 maxpool, BasicBlock×[2,2,2,2] for resnet18),
so converted torchvision weights load one-to-one
(see ``utils/torch_weights.py``).

Feature pyramid contract (matches smp encoder stages):
``features = [c1, c2, c3, c4, c5]`` at strides ``[2, 4, 8, 16, 32]``
with channels ``[64, 64, 128, 256, 512]`` for resnet18/34
(``[64, 256, 512, 1024, 2048]`` for resnet50).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# torchvision layer configs
RESNET_CFGS = {
    "resnet18": {"block": "basic", "layers": (2, 2, 2, 2)},
    "resnet34": {"block": "basic", "layers": (3, 4, 6, 3)},
    "resnet50": {"block": "bottleneck", "layers": (3, 4, 6, 3)},
}

BN_MOMENTUM = 0.9  # == torch momentum 0.1
BN_EPS = 1e-5


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3×3 conv(s) → BN → ReLU → 3×3 conv → BN,
    residual add (1×1 conv+BN projection on downsample), ReLU."""

    channels: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    # keep the residual add OUT of conv2's output fusion: under the serving
    # scoped-vmem compiler option, XLA's conv2+BN+add+relu mega-fusion for
    # the 128² C=64 stages stalls (10.0 vs 6.2 ms at bs=512) — a barrier
    # splits it into a clean conv fusion + an elementwise pass
    residual_barrier: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.channels, (3, 3), strides=(self.strides, self.strides),
            padding=self.dilation, kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (3, 3), padding=self.dilation,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn2",
        )(y)
        if self.residual_barrier:
            y = jax.lax.optimization_barrier(y)
        if residual.shape[-1] != self.channels or self.strides != 1:
            residual = nn.Conv(
                self.channels, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype, name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1×1 → 3×3 → 1×1·4) for resnet50+."""

    channels: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out_ch = self.channels * 4
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), strides=(self.strides, self.strides),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class _StemConv(nn.Module):
    """The 7×7/2 stem conv, optionally computed via the exact
    space-to-depth fold (``ops/folded_stem.py``) that keeps the MXU
    contraction dimension full.  The parameter tree is identical either
    way (``conv1/kernel`` in HWIO), so checkpoints and the torchvision
    weight converter are unaffected."""

    features: int = 64
    fold: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import jax.numpy as _jnp

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
            _jnp.float32,
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.fold:
            from pdac_pathological_image_segmentation_tpu.ops.folded_stem import (
                folded_stem_conv,
            )

            return folded_stem_conv(x, kernel)
        # plain XLA conv — its native wgrad (8.7 ms at bs=256) beat both
        # custom-VJP im2col formulations on v5e: whole-batch patches OOM
        # (4.9 GB materialized), and a lax.scan-chunked version serialized
        # into a 312 ms while-loop of layout copies (r3 profile,
        # BASELINE.md).  The narrow 3-channel contraction is simply what
        # the hardware gives for this shape.
        return lax.conv_general_dilated(
            x, kernel, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetEncoder(nn.Module):
    """ResNet feature extractor (no avgpool/fc head — the reference never
    uses them, which is why its DDP needs ``find_unused_parameters=True`` at
    ``train_worker.py:204-206``; we simply don't instantiate them).

    ``output_stride`` ∈ {8, 16, 32}: strides below it become dilations
    (DeepLabV3+ needs 16).

    Setup-style so :meth:`stages` can run the residual stages from an
    externally computed stem+pool activation.
    """

    backbone: str = "resnet18"
    output_stride: int = 32
    # serving-path scheduling workaround: barrier the residual adds of the
    # first (128², C=64) stage out of their conv fusions (see BasicBlock)
    stage0_residual_barrier: bool = False
    # exact space-to-depth stem rewrite — measured SLOWER than XLA's own
    # handling of the 7×7/2 stem on v5e (3,448 vs 3,603 patches/s end-to-end,
    # r1 bench): the s2d re-layout costs more HBM traffic than the fuller MXU
    # contraction saves.  Kept opt-in per the keep-whichever-wins rule.
    fold_stem: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def feature_channels(backbone: str) -> List[int]:
        if RESNET_CFGS[backbone]["block"] == "basic":
            return [64, 64, 128, 256, 512]
        return [64, 256, 512, 1024, 2048]

    def setup(self) -> None:
        cfg = RESNET_CFGS[self.backbone]
        block_cls = BasicBlock if cfg["block"] == "basic" else Bottleneck
        layers: Sequence[int] = cfg["layers"]

        self.conv1 = _StemConv(features=64, fold=self.fold_stem,
                               dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype)

        base_channels = (64, 128, 256, 512)
        stage_strides = [1, 2, 2, 2]
        # convert strides → dilations past the requested output stride.
        # Dilation semantics follow smp's replace_strides_with_dilation
        # (the library the reference's DeepLabV3+ encoder actually goes
        # through, ``train_worker.py:165-171``): every conv in a dilated
        # stage gets the SAME rate, block 0 included.  torchvision's own
        # ``previous_dilation`` convention is irrelevant for resnet18 —
        # its BasicBlock raises on dilation > 1, so smp patches the convs
        # uniformly instead.  Pinned by
        # tests/test_torch_parity.py::test_dilated_stage_matches_smp_semantics.
        current_stride, dilation = 4, 1
        stage_names = []
        for stage_idx, (ch, n_blocks, s) in enumerate(
            zip(base_channels, layers, stage_strides)
        ):
            if s == 2:
                if current_stride >= self.output_stride:
                    dilation *= 2
                    s = 1
                else:
                    current_stride *= 2
            names = []
            for b in range(n_blocks):
                name = f"layer{stage_idx + 1}_{b}"
                kwargs = dict(
                    channels=ch,
                    strides=s if b == 0 else 1,
                    dilation=dilation,
                    dtype=self.dtype,
                )
                if stage_idx == 0 and block_cls is BasicBlock:
                    kwargs["residual_barrier"] = self.stage0_residual_barrier
                setattr(self, name, block_cls(**kwargs))
                names.append(name)
            stage_names.append(tuple(names))
        self._stage_names = tuple(stage_names)

    def stages(self, y: jax.Array, train: bool = False) -> List[jax.Array]:
        """Residual stages from the post-maxpool activation: [c2, c3, c4, c5]."""
        features = []
        for names in self._stage_names:
            for name in names:
                y = getattr(self, name)(y, train=train)
            features.append(y)
        return features

    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        # stem: 7×7/2 conv, BN, ReLU  (stride 2)
        y = self.conv1(x)
        y = self.bn1(y, use_running_average=not train)
        c1 = nn.relu(y)
        # 3×3/2 maxpool (stride 4).  Stock select-and-scatter backward:
        # two custom-VJP replacements (argmax-gather, recomputed hit
        # masks) both measured SLOWER end-to-end at bs=256 (519 / 920
        # vs 1,132 patches/s) — the backward re-reads the 2.1 GB stem
        # activation per offset while XLA's scatter is one pass.  See
        # BASELINE.md "Train-step optimization log".
        y = nn.max_pool(c1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return [c1] + self.stages(y, train=train)  # [c1, c2, c3, c4, c5]
