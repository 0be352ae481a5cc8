"""Post-training int8 quantized inference for all four reference
architectures (unet / fpn / deeplabv3+ / pspnet; ROADMAP quantized
serving).

The v5e MXU runs int8 contractions at ~2× the bf16 rate (measured on this
harness: 1.3–1.7× end-to-end per conv shape, XLA int8 conv with int32
accumulators).  This module quantizes the conv-heavy path of the ResUNet
inference step post-training:

* **weights**: symmetric per-output-channel int8
  (``scale_f = amax|W[...,f]| / 127``);
* **activations**: symmetric per-tensor int8, scales from a short
  calibration pass over representative batches (amax, elementwise max
  across batches);
* **accumulation**: int32 on the MXU, dequantized in the conv epilogue
  (XLA fuses ``int32→f32·(s_x·s_w)`` into the conv output), BatchNorm's
  inference affine and biases applied in float exactly as the bf16 path;
* quantized sites: stem 7×7 + every encoder 3×3/1×1 conv + each
  decoder's dominant matmuls (ResUNet ``ConcatConv`` pairs, FPN laterals +
  seg blocks, DeepLabV3+ ASPP pointwises + fuse, PSPNet bottleneck).
  Upsamples, depthwise convs, heads, and the bilinear resizes stay float
  (minor share of runtime, keeps mask numerics tight).

This is an **opt-in serving mode**: the honest flagship bench stays bf16;
``bench.py --mode int8`` reports the quantized number next to it, and
``tests/test_quantized.py`` pins the mask agreement and Dice delta vs the
bf16 path.

The forward here is a functional mirror of ``models/resunet.py`` +
``models/resnet.py`` (reference topology ``models/resunet.py:23-57``);
drift is impossible to miss because the calibration-mode forward is tested
to match ``model.apply`` exactly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from pdac_pathological_image_segmentation_tpu.models.fpn import (
    _upsample_nearest_2x,
)
from pdac_pathological_image_segmentation_tpu.models.resnet import BN_EPS
from pdac_pathological_image_segmentation_tpu.ops.resize import resize_bilinear

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, k, stride=1, pad=1, dilation=1, groups=1):
    padding = ((pad, pad), (pad, pad)) if pad else "VALID"
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), padding,
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=_DN)


def _conv_i8(x, xscale, kq, kscale, stride=1, pad=1, dilation=1):
    """int8 conv with int32 accumulation, dequantized epilogue."""
    xq = jnp.clip(jnp.round(x / xscale), -127, 127).astype(jnp.int8)
    padding = ((pad, pad), (pad, pad)) if pad else "VALID"
    yi = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), padding,
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    return yi.astype(jnp.float32) * (xscale * kscale)


def _bn_affine(bn_params, bn_stats):
    a = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + BN_EPS)
    b = bn_params["bias"] - bn_stats["mean"] * a
    return a.astype(jnp.float32), b.astype(jnp.float32)


def quantize_weights(kernel) -> tuple[jax.Array, jax.Array]:
    """HWIO kernel → (int8 kernel, per-output-channel f32 scale)."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


class _QT(NamedTuple):
    """A producer-quantized int8 activation tensor + its per-tensor scale.

    The ``act_storage="int8"`` inter-site representation: the producing
    conv's epilogue quantizes (one fused elementwise chain writing int8),
    consumers feed ``q`` straight into the int8 MXU contraction — the
    tensor crosses HBM at 1 byte/element instead of 2 (the bf16-storage
    mode's diagnosis at BASELINE.md "int8 sits on the bandwidth roofline:
    its bytes/patch barely moved because activations stay bf16")."""

    q: jax.Array      # int8
    scale: jax.Array  # f32 scalar (amax/127 of this tensor, calibrated)


def _deq(x):
    """Dequantize a ``_QT`` (fuses into the consumer's elementwise chain);
    pass plain arrays through."""
    if isinstance(x, _QT):
        return x.q.astype(jnp.float32) * x.scale
    return x


def _maxpool(y):
    """3×3/2 stem maxpool.  Max commutes with the (monotonic) quantize, so
    an int8 ``_QT`` pools directly in int8 — same result as pooling the
    float tensor and quantizing after."""
    window, strides = (1, 3, 3, 1), (1, 2, 2, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    if isinstance(y, _QT):
        q = jax.lax.reduce_window(y.q, jnp.int8(-128), jax.lax.max,
                                  window, strides, pads)
        return _QT(q, y.scale)
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 window, strides, pads)


class _Ctx:
    """Conv dispatcher: float mode records per-site amax (calibration),
    int8 mode quantizes with the calibrated scales."""

    def __init__(self, mode: str, act_scales=None, qweights=None,
                 act_storage: str = "bf16"):
        assert mode in ("float", "int8")
        assert act_storage in ("bf16", "int8")
        self.mode = mode
        # int8 mode stores inter-site activations in bf16 (the dequantized
        # values re-quantize at the next site anyway; halves the HBM
        # footprint so bs≥256 fits alongside the int8 weight copies).
        # Float mode keeps f32 for the exact-parity contract vs model.apply.
        # act_storage="int8" goes further: activations whose next consumer
        # is a quantized conv are stored as producer-quantized int8 _QTs
        # (1 byte/element inter-site traffic; the consumer's calibrated
        # scale applies because producer and consumer see the same tensor).
        self.act_dtype = jnp.float32 if mode == "float" else jnp.bfloat16
        self.act_storage = act_storage if mode == "int8" else "bf16"
        self.act_scales = act_scales or {}
        self.qweights = qweights or {}
        self.stats: Dict[str, jax.Array] = {}

    def conv(self, name, x, kernel, stride=1, pad=1, dilation=1):
        if self.mode == "float":
            self.stats[name] = jnp.max(jnp.abs(x)).astype(jnp.float32)
            return _conv(x, kernel.astype(x.dtype), stride, pad, dilation)
        kq, ks = self.qweights[name]
        if isinstance(x, _QT):
            # already int8 in HBM — straight into the int32 MXU contraction
            padding = ((pad, pad), (pad, pad)) if pad else "VALID"
            yi = jax.lax.conv_general_dilated(
                x.q, kq, (stride, stride), padding,
                rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            return yi.astype(jnp.float32) * (x.scale * ks)
        return _conv_i8(x.astype(jnp.float32), self.act_scales[name],
                        kq, ks, stride, pad, dilation)

    def act(self, y, site: Optional[str] = None):
        """Cast a post-affine activation to the inter-site storage dtype.

        ``site`` names the quantized conv that consumes this tensor; under
        ``act_storage="int8"`` the tensor is stored as a ``_QT`` quantized
        with that site's calibrated scale (producer-side quantization —
        identical scale value, the calibration amax is of this very
        tensor).  ``site=None`` (float consumers: upconv einsums, heads,
        image pools) keeps the bf16 path."""
        if self.act_storage == "int8" and site is not None:
            s = self.act_scales[site]
            q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
            return _QT(q, jnp.float32(s))
        return y.astype(self.act_dtype)


def _basic_block(ctx, p, s, x, name, stride=1, dilation=1, out_site=None):
    """``out_site``: the quantized conv consuming this block's output —
    int8-storage mode quantizes the output in the residual add's epilogue
    (None → bf16, for float consumers like decoder upconvs)."""
    a1, b1 = _bn_affine(p["bn1"], s["bn1"])
    a2, b2 = _bn_affine(p["bn2"], s["bn2"])
    y = ctx.conv(f"{name}.conv1", x, p["conv1"]["kernel"], stride, dilation,
                 dilation)
    y = ctx.act(jnp.maximum(y * a1 + b1, 0.0), site=f"{name}.conv2")
    y = ctx.conv(f"{name}.conv2", y, p["conv2"]["kernel"], 1, dilation,
                 dilation)
    y = y * a2 + b2
    if "downsample_conv" in p:
        ad, bd = _bn_affine(p["downsample_bn"], s["downsample_bn"])
        r = ctx.conv(f"{name}.ds", x, p["downsample_conv"]["kernel"],
                     stride, 0)
        r = r * ad + bd
    else:
        r = _deq(x)  # int8-storage residuals dequantize into the add
    return ctx.act(jnp.maximum(y + r.astype(y.dtype), 0.0), site=out_site)


def _concat_conv(ctx, p, name, a, b):
    ca = a.shape[-1]
    k = p["kernel"]
    ya = ctx.conv(f"{name}.a", a, k[:, :, :ca], 1, 1)
    yb = ctx.conv(f"{name}.b", b, k[:, :, ca:], 1, 1)
    return ctx.act(ya + yb + p["bias"].astype(jnp.float32))


def _upconv(p, x):
    # einsum + pixel-shuffle == flax ConvTranspose(k2,s2,VALID) with the
    # spatially flipped kernel (models/resunet.UpConv)
    n, h, w, _ = x.shape
    k = p["kernel"][::-1, ::-1].astype(x.dtype)
    f = k.shape[-1]
    z = jnp.einsum("nhwc,ijcf->nhiwjf", x, k).reshape(n, 2 * h, 2 * w, f)
    return z + p["bias"].astype(x.dtype)


def _normalize(image_u8):
    mean = jnp.asarray(255.0 * np.asarray(IMAGENET_MEAN), jnp.float32)
    std = jnp.asarray(255.0 * np.asarray(IMAGENET_STD), jnp.float32)
    return (image_u8.astype(jnp.float32) - mean) / std


def _encoder_forward(ctx: _Ctx, e, es, x, output_stride: int = 32,
                     depth: int = 5, feat_sites=None):
    """Shared resnet18 encoder mirror (stem + maxpool + residual stages) →
    stage outputs ``[x2, …]``.  ``output_stride`` turns strides past it
    into dilations with smp's uniform-rate semantics (every conv in a
    dilated stage, block 0 included — ``models/resnet.py`` setup);
    ``depth`` is the smp encoder depth (5 → all four stages, 3 → through
    layer2, PSPNet).

    Under ``act_storage="int8"``, every tensor whose next consumer is a
    quantized conv stays int8 in HBM: the stem output (quantized, pooled
    in int8 — max commutes with quantize), block internals, and
    within-stage block outputs.  ``feat_sites`` (per stage, or None)
    names the quantized conv consuming each STAGE output — the
    architecture-specific part (ResUNet's skips feed quantized
    ``ConcatConv``s; FPN/DeepLab/PSPNet do float math on theirs, so they
    leave it unset and stage outputs stay bf16)."""
    a0, b0 = _bn_affine(e["bn1"], es["bn1"])
    y = ctx.conv("stem", x, e["conv1"]["kernel"], 2, 3)
    # the stem output's consumer (through the int8-transparent maxpool) is
    # layer1_0.conv1: same tensor amax — the maxpool keeps the global max
    y = ctx.act(jnp.maximum(y * a0 + b0, 0.0), site="layer1_0.conv1")
    y = _maxpool(y)

    feats = []
    current_stride, dilation = 4, 1
    for li in range(depth - 1):
        s = 1 if li == 0 else 2
        if s == 2:
            if current_stride >= output_stride:
                dilation *= 2
                s = 1
            else:
                current_stride *= 2
        for bi in (0, 1):
            name = f"layer{li + 1}_{bi}"
            if bi == 0:
                # block 0's output feeds block 1's conv1 (same stage)
                out_site = f"layer{li + 1}_1.conv1"
            else:
                out_site = feat_sites[li] if feat_sites else None
            y = _basic_block(ctx, e[name], es[name], y, name,
                             stride=s if bi == 0 else 1, dilation=dilation,
                             out_site=out_site)
        feats.append(y)
    return feats


def resunet_forward(ctx: _Ctx, params, batch_stats, image_u8,
                    output_size: int):
    """uint8 NHWC → sigmoid probability masks; mirrors
    ``ResUNet.__call__(train=False)`` (reference ``models/resunet.py:23-57``:
    stem skip unused, head at 1/4 res, single 4× bilinear)."""
    x = _normalize(image_u8)
    # stage outputs double as decoder skips into quantized ConcatConvs, so
    # int8-storage mode can keep x2..x4 int8 end-to-end (each skip's scale
    # equals the next stage's conv1 scale — amax of the same tensor); x5
    # feeds the float upconv einsum and stays bf16
    x2, x3, x4, x5 = _encoder_forward(
        ctx, params["encoder"], batch_stats["encoder"], x,
        feat_sites=("layer2_0.conv1", "layer3_0.conv1", "layer4_0.conv1",
                    None))

    y = _upconv(params["upconv1"], x5)
    y = jnp.maximum(_concat_conv(ctx, params["conv1"], "dec1", y, x4), 0.0)
    y = _upconv(params["upconv2"], y)
    y = jnp.maximum(_concat_conv(ctx, params["conv2"], "dec2", y, x3), 0.0)
    y = _upconv(params["upconv3"], y)
    y = jnp.maximum(_concat_conv(ctx, params["conv3"], "dec3", y, x2), 0.0)

    k4 = params["conv4"]["kernel"][0, 0].astype(y.dtype)  # (64, 1)
    logits = jnp.einsum("nhwc,c->nhw", y, k4[:, 0]) + params["conv4"]["bias"][0]
    logits = resize_bilinear(logits[..., None].astype(jnp.float32),
                             output_size, output_size)
    return jax.nn.sigmoid(logits[..., 0])


def fpn_forward(ctx: _Ctx, params, batch_stats, image_u8, output_size: int):
    """uint8 NHWC → sigmoid probability masks; mirrors
    ``FPN.__call__(train=False)`` (``models/fpn.py`` — smp topology, the
    reference's DEFAULT model ``configs/train_config.yaml:22``).  Quantized
    sites: the shared encoder + the four lateral 1×1 convs + every
    segmentation-block 3×3 conv; GroupNorm, the 1×1 head and the
    corner-aligned 4× resize stay float."""
    from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
        xla_group_norm_relu,
    )

    x = _normalize(image_u8)
    c2, c3, c4, c5 = _encoder_forward(
        ctx, params["encoder"], batch_stats["encoder"], x)

    def lateral(name, feat):
        y = ctx.conv(name, feat, params[name]["kernel"], 1, 0)
        return ctx.act(y + params[name]["bias"].astype(jnp.float32))

    p5 = lateral("lateral5", c5)
    p4 = ctx.act(lateral("lateral4", c4) + _upsample_nearest_2x(p5))
    p3 = ctx.act(lateral("lateral3", c3) + _upsample_nearest_2x(p4))
    p2 = ctx.act(lateral("lateral2", c2) + _upsample_nearest_2x(p3))

    def seg_conv(name, y):
        p = params[name]
        y = ctx.conv(f"{name}.conv", y, p["Conv_0"]["kernel"], 1, 1)
        y = xla_group_norm_relu(
            y.astype(jnp.float32), p["GroupNorm_0"]["scale"],
            p["GroupNorm_0"]["bias"], num_groups=32, eps=1e-5)
        return ctx.act(y)

    outs = []
    for i, (p, n_up) in enumerate(((p5, 3), (p4, 2), (p3, 1), (p2, 0))):
        y = seg_conv(f"seg{i}_0", p)
        if n_up > 0:
            y = _upsample_nearest_2x(y)
        for j in range(1, n_up):
            y = _upsample_nearest_2x(seg_conv(f"seg{i}_{j}", y))
        outs.append(y)
    y = outs[0]
    for o in outs[1:]:
        y = y + o

    # 1×1 head (smp SegmentationHead kernel_size=1) + corner-aligned 4× up
    k = params["head"]["kernel"][0, 0].astype(jnp.float32)  # (128, classes)
    logits = jnp.einsum("nhwc,co->nhwo", y.astype(jnp.float32), k)
    logits = logits + params["head"]["bias"].astype(jnp.float32)
    logits = resize_bilinear(logits, output_size, output_size,
                             align_corners=True)
    return jax.nn.sigmoid(logits[..., 0])


def _conv_bn_relu(ctx, p, s, name, x):
    """Quantized mirror of ``deeplabv3plus._ConvBNReLU`` (1×1, no bias)."""
    y = ctx.conv(name, x, p["conv"]["kernel"], 1, 0)
    a, b = _bn_affine(p["bn"], s["bn"])
    return ctx.act(jnp.maximum(y * a + b, 0.0))


def _sep_conv_bn_relu(ctx, p, s, name, x, dilation=1):
    """Quantized mirror of ``deeplabv3plus._SeparableConvBNReLU``: the
    depthwise 3×3 stays float (negligible FLOP share — C MACs/pixel vs the
    pointwise's C²), the pointwise 1×1 quantizes."""
    dw = _conv(x.astype(jnp.float32),
               p["depthwise"]["kernel"].astype(jnp.float32),
               1, dilation, dilation, groups=x.shape[-1])
    y = ctx.conv(f"{name}.pointwise", dw, p["pointwise"]["kernel"], 1, 0)
    a, b = _bn_affine(p["bn"], s["bn"])
    return ctx.act(jnp.maximum(y * a + b, 0.0))


def deeplab_forward(ctx: _Ctx, params, batch_stats, image_u8,
                    output_size: int, atrous_rates=(3, 6, 9)):
    """uint8 NHWC → sigmoid probability masks; mirrors
    ``DeepLabV3Plus.__call__(train=False)`` (``models/deeplabv3plus.py`` —
    smp topology with the reference's config dilations,
    ``configs/train_config.yaml:24``).  Quantized sites: the os-16 dilated
    encoder + every ASPP 1×1/pointwise + projections + the fuse pointwise;
    depthwise convs, the image-pool branch (1×1 spatial), the 1×1 head and
    the corner-aligned resizes stay float."""
    x = _normalize(image_u8)
    feats = _encoder_forward(ctx, params["encoder"],
                             batch_stats["encoder"], x, output_stride=16)
    c2, c5 = feats[0], feats[3]
    ap, asts = params["aspp"], batch_stats["aspp"]

    branches = [_conv_bn_relu(ctx, ap["branch_1x1"], asts["branch_1x1"],
                              "aspp.1x1", c5)]
    for i, rate in enumerate(atrous_rates):
        branches.append(
            _sep_conv_bn_relu(ctx, ap[f"branch_r{i}"], asts[f"branch_r{i}"],
                              f"aspp.r{i}", c5, dilation=rate))
    n, h, w, _ = c5.shape
    pooled = jnp.mean(c5.astype(jnp.float32), axis=(1, 2), keepdims=True)
    pp, ps = ap["branch_pool"], asts["branch_pool"]
    a, b = _bn_affine(pp["bn"], ps["bn"])
    pooled = jnp.maximum(
        _conv(pooled, pp["conv"]["kernel"].astype(jnp.float32), 1, 0) * a + b,
        0.0)
    branches.append(ctx.act(jnp.broadcast_to(pooled,
                                             (n, h, w, pooled.shape[-1]))))

    y = jnp.concatenate(branches, axis=-1)
    y = _conv_bn_relu(ctx, ap["project"], asts["project"], "aspp.project", y)
    # dropout(0.5) is identity at inference
    y = _sep_conv_bn_relu(ctx, params["aspp_sep"], batch_stats["aspp_sep"],
                          "aspp_sep", y)
    y = resize_bilinear(y.astype(jnp.float32), c2.shape[1], c2.shape[2],
                        align_corners=True)
    skip = _conv_bn_relu(ctx, params["skip_project"],
                         batch_stats["skip_project"], "skip", c2)
    y = jnp.concatenate([ctx.act(y), skip], axis=-1)
    y = _sep_conv_bn_relu(ctx, params["fuse"], batch_stats["fuse"],
                          "fuse", y)

    k = params["head"]["kernel"][0, 0].astype(jnp.float32)  # (256, classes)
    logits = jnp.einsum("nhwc,co->nhwo", y.astype(jnp.float32), k)
    logits = logits + params["head"]["bias"].astype(jnp.float32)
    logits = resize_bilinear(logits, output_size, output_size,
                             align_corners=True)
    return jax.nn.sigmoid(logits[..., 0])


def pspnet_forward(ctx: _Ctx, params, batch_stats, image_u8,
                   output_size: int, pool_sizes=(1, 2, 3, 6)):
    """uint8 NHWC → sigmoid probability masks; mirrors
    ``PSPNet.__call__(train=False)`` (``models/pspnet.py`` — smp depth-3
    topology).  Quantized sites: the depth-3 encoder + the 512-channel
    bottleneck 1×1 (the decoder's dominant matmul).  The PSP pyramid
    branches pool to ≤6×6 before their convs — negligible compute, kept
    float; the 3×3 head and the 8× corner-aligned resize stay float."""
    from pdac_pathological_image_segmentation_tpu.models.pspnet import (
        adaptive_avg_pool,
    )

    x = _normalize(image_u8)
    feats = _encoder_forward(ctx, params["encoder"],
                             batch_stats["encoder"], x, depth=3)
    c3 = feats[-1]
    h, w = c3.shape[1], c3.shape[2]

    branches = []
    for size in pool_sizes:
        p = params[f"psp_{size}"]
        y = adaptive_avg_pool(c3.astype(jnp.float32), size)
        y = _conv(y, p["conv"]["kernel"].astype(jnp.float32), 1, 0)
        if size > 1:
            a, b = _bn_affine(p["bn"], batch_stats[f"psp_{size}"]["bn"])
            y = y * a + b
        else:  # smp skips BN on the 1×1 bin; its conv carries the bias
            y = y + p["conv"]["bias"].astype(jnp.float32)
        y = jnp.maximum(y, 0.0)
        branches.append(ctx.act(resize_bilinear(y, h, w,
                                                align_corners=True)))
    y = jnp.concatenate(branches + [c3], axis=-1)

    y = ctx.conv("bottleneck", y, params["bottleneck_conv"]["kernel"], 1, 0)
    a, b = _bn_affine(params["bottleneck_bn"], batch_stats["bottleneck_bn"])
    y = ctx.act(jnp.maximum(y * a + b, 0.0))
    # channel dropout(0.2) is identity at inference

    k = params["head"]["kernel"].astype(jnp.float32)  # (3, 3, 512, classes)
    logits = _conv(y.astype(jnp.float32), k, 1, 1)
    logits = logits + params["head"]["bias"].astype(jnp.float32)
    logits = resize_bilinear(logits, output_size, output_size,
                             align_corners=True)
    return jax.nn.sigmoid(logits[..., 0])


FORWARDS = {"unet": resunet_forward, "fpn": fpn_forward,
            "deeplabv3+": deeplab_forward, "pspnet": pspnet_forward}


def calibrate(params, batch_stats, batches, output_size: int,
              forward=resunet_forward):
    """Run the float-mode mirror over ``batches`` of uint8 images and
    return per-site activation scales (amax/127, max across batches)."""
    scales: Dict[str, float] = {}

    @jax.jit
    def one(image):
        ctx = _Ctx("float")
        out = forward(ctx, params, batch_stats, image, output_size)
        return out, ctx.stats

    for image in batches:
        _, stats = one(jnp.asarray(image))
        for k, v in stats.items():
            scales[k] = max(scales.get(k, 0.0), float(v))
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in scales.items()}


def _quantize_encoder(e, layers: int = 4) -> Dict[str, tuple]:
    qw = {"stem": quantize_weights(e["conv1"]["kernel"])}
    for li in range(1, layers + 1):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            p = e[name]
            qw[f"{name}.conv1"] = quantize_weights(p["conv1"]["kernel"])
            qw[f"{name}.conv2"] = quantize_weights(p["conv2"]["kernel"])
            if "downsample_conv" in p:
                qw[f"{name}.ds"] = quantize_weights(
                    p["downsample_conv"]["kernel"])
    return qw


def quantize_resunet(params, batch_stats, act_scales):
    """Quantize every conv site's weights; returns the bundle consumed by
    :func:`make_quantized_infer_step`."""
    qw = _quantize_encoder(params["encoder"])
    for di, cname in ((1, "conv1"), (2, "conv2"), (3, "conv3")):
        k = params[cname]["kernel"]
        ca = k.shape[2] // 2
        qw[f"dec{di}.a"] = quantize_weights(k[:, :, :ca])
        qw[f"dec{di}.b"] = quantize_weights(k[:, :, ca:])
    return {"qweights": qw, "act_scales": dict(act_scales)}


def quantize_fpn(params, batch_stats, act_scales):
    """Quantize the FPN's conv sites (encoder + laterals + seg blocks);
    returns the bundle consumed by :func:`make_quantized_infer_step`."""
    qw = _quantize_encoder(params["encoder"])
    for name in ("lateral5", "lateral4", "lateral3", "lateral2"):
        qw[name] = quantize_weights(params[name]["kernel"])
    for i, n_blocks in enumerate((3, 2, 1, 1)):
        for j in range(n_blocks):
            name = f"seg{i}_{j}"
            qw[f"{name}.conv"] = quantize_weights(
                params[name]["Conv_0"]["kernel"])
    return {"qweights": qw, "act_scales": dict(act_scales)}


def quantize_deeplab(params, batch_stats, act_scales):
    """Quantize the DeepLabV3+ conv sites (dilated encoder + ASPP 1×1s and
    pointwises + skip/fuse); returns the bundle consumed by
    :func:`make_quantized_infer_step`."""
    qw = _quantize_encoder(params["encoder"])
    ap = params["aspp"]
    qw["aspp.1x1"] = quantize_weights(ap["branch_1x1"]["conv"]["kernel"])
    for name in ap:
        if name.startswith("branch_r"):
            i = int(name[len("branch_r"):])
            qw[f"aspp.r{i}.pointwise"] = quantize_weights(
                ap[name]["pointwise"]["kernel"])
    qw["aspp.project"] = quantize_weights(ap["project"]["conv"]["kernel"])
    qw["aspp_sep.pointwise"] = quantize_weights(
        params["aspp_sep"]["pointwise"]["kernel"])
    qw["skip"] = quantize_weights(params["skip_project"]["conv"]["kernel"])
    qw["fuse.pointwise"] = quantize_weights(
        params["fuse"]["pointwise"]["kernel"])
    return {"qweights": qw, "act_scales": dict(act_scales)}


def quantize_pspnet(params, batch_stats, act_scales):
    """Quantize the PSPNet conv sites (depth-3 encoder + the bottleneck
    1×1); returns the bundle consumed by
    :func:`make_quantized_infer_step`."""
    qw = _quantize_encoder(params["encoder"], layers=2)
    qw["bottleneck"] = quantize_weights(params["bottleneck_conv"]["kernel"])
    return {"qweights": qw, "act_scales": dict(act_scales)}


QUANTIZERS = {"unet": quantize_resunet, "fpn": quantize_fpn,
              "deeplabv3+": quantize_deeplab, "pspnet": quantize_pspnet}


def make_quantized_infer_step(params, batch_stats, bundle,
                              output_size: int, forward=resunet_forward,
                              act_storage: str = "int8"):
    """jitted ``step(image_u8) → probs`` on the int8 path.

    ``act_storage="int8"`` (default — keep-whichever-wins: 6,553 vs
    5,947 patches/s at bs=256 on v5e, BASELINE.md round 5) stores
    inter-site activations as producer-quantized int8 (``_QT``) instead
    of bf16 — half the activation HBM traffic of the bandwidth-bound
    int8 program (the round-4 roofline diagnosis); accuracy is gated by
    the same mask-agreement/Dice-delta tests as the bf16-storage mode."""
    act = {k: jnp.float32(v) for k, v in bundle["act_scales"].items()}

    @jax.jit
    def step(image):
        ctx = _Ctx("int8", act_scales=act, qweights=bundle["qweights"],
                   act_storage=act_storage)
        return forward(ctx, params, batch_stats, image, output_size)

    return step


def make_float_infer_step(params, batch_stats, output_size: int,
                          forward=resunet_forward):
    """jitted float-mode mirror (for parity tests vs ``model.apply``)."""

    @jax.jit
    def step(image):
        ctx = _Ctx("float")
        return forward(ctx, params, batch_stats, image, output_size)

    return step


def _with_stain(forward, stain: str):
    """Wrap a mirror forward so it sees the same stain-normalized pixels the
    bf16 path's ``eval_transform`` produces (``ops/augment.py``).  Wrapping
    the *forward* (rather than each caller's batches) means calibration and
    serving can't disagree about preprocessing."""
    if stain in (None, "none"):
        return forward

    def staining_forward(ctx, params, batch_stats, image, output_size):
        from pdac_pathological_image_segmentation_tpu.ops.stain import (
            apply_stain_batch,
        )

        image = apply_stain_batch(
            image.astype(jnp.float32) / 255.0, stain) * 255.0
        return forward(ctx, params, batch_stats, image, output_size)

    return staining_forward


def quantize_model(model_name: str, params, batch_stats, calib_batches,
                   output_size: int, backbone: str = "resnet18",
                   stain: str = "none", **model_kw):
    """One-call post-training quantization for a supported model:
    calibrates activation scales on ``calib_batches`` (uint8 NHWC) and
    returns ``(bundle, forward)`` for :func:`make_quantized_infer_step` /
    :func:`make_quantized_infer_fn`.  ``model_kw`` forwards topology
    arguments the forward needs (e.g. ``atrous_rates=cfg.dilations`` for
    deeplabv3+); ``stain`` applies the same on-device H&E normalization the
    bf16 infer path runs, to both calibration and serving.  The encoder
    mirror here is resnet18-only — other backbones would silently trace a
    wrong topology over a subset of the weights, so anything else is
    rejected up front."""
    if model_name not in FORWARDS:
        raise ValueError(
            f"no int8 path for model {model_name!r} "
            f"(supported: {sorted(FORWARDS)})")
    if backbone != "resnet18":
        raise ValueError(
            f"int8 serving mirrors a resnet18 encoder; backbone "
            f"{backbone!r} is not supported (use the bf16 path)")
    forward = FORWARDS[model_name]
    if model_kw:
        import functools

        forward = functools.partial(forward, **model_kw)
    forward = _with_stain(forward, stain)
    scales = calibrate(params, batch_stats, calib_batches, output_size,
                       forward=forward)
    bundle = QUANTIZERS[model_name](params, batch_stats, scales)
    return bundle, forward


def quantize_from_config(cfg, params, batch_stats, calib_batches):
    """Config-driven :func:`quantize_model`: derives the model name,
    backbone, output size, topology kwargs (deeplabv3+ atrous rates from
    ``cfg.dilations``) and the ``cfg.stain`` hook from a ``Config``, so CLI
    callers cannot drop any of them."""
    kw = {}
    if cfg.model == "deeplabv3+":
        kw["atrous_rates"] = tuple(cfg.dilations)
    return quantize_model(
        cfg.model, params, batch_stats, calib_batches, cfg.img_size,
        backbone=cfg.backbone, stain=cfg.stain, **kw)


def make_quantized_infer_fn(params, batch_stats, bundle, output_size: int,
                            forward=resunet_forward,
                            act_storage: str = "int8"):
    """Jitted ``fn(state, images_u8) → probs`` with the WSI runners'
    ``infer_step`` signature (``infer/wsi.py`` / ``infer/wsi_sharded.py``).
    The jit matters for the plain ``SlidingWindowInference`` path, which
    calls the step eagerly per batch; under the sharded runner's own
    jit/shard_map trace the inner jit simply inlines.  The ``state``
    argument is ignored (weights are baked in as int8 constants)."""
    act = {k: jnp.float32(v) for k, v in bundle["act_scales"].items()}

    @jax.jit
    def fn(state, images):
        del state
        ctx = _Ctx("int8", act_scales=act, qweights=bundle["qweights"],
                   act_storage=act_storage)
        return forward(ctx, params, batch_stats, images, output_size)

    return fn
