"""EfficientNet encoder: golden parity vs a torch twin + decoder plumbing.

The reference passes ``cfg["backbone"]`` straight into smp's encoder zoo —
"e.g. mobilenet_v2 or efficientnet-b7" (reference ``train_worker.py:155``)
— and with this family both encoder names it cites exist here.
efficientnet-pytorch isn't installed; the torch twin builds b0 from
torch.nn primitives with efficientnet-pytorch's exact state_dict naming
(``_conv_stem``, ``_blocks.N._expand_conv`` …), which is what
``convert_efficientnet_state_dict`` consumes from real checkpoints.  The
b0 block list is hard-coded here (independent of the package's scaling
math) so a ``round_filters``/``round_repeats`` bug cannot hide.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.models.efficientnet import (
    EfficientNetEncoder,
    block_specs,
    feature_channels,
    stage_splits,
)
from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
    convert_efficientnet_state_dict,
    convert_encoder_state_dict,
)

SIZE = 64

# b0 flattened blocks, hand-derived from the paper table:
# (in_ch, out_ch, expand, kernel, stride)
_B0_BLOCKS = [
    (32, 16, 1, 3, 1),
    (16, 24, 6, 3, 2), (24, 24, 6, 3, 1),
    (24, 40, 6, 5, 2), (40, 40, 6, 5, 1),
    (40, 80, 6, 3, 2), (80, 80, 6, 3, 1), (80, 80, 6, 3, 1),
    (80, 112, 6, 5, 1), (112, 112, 6, 5, 1), (112, 112, 6, 5, 1),
    (112, 192, 6, 5, 2), (192, 192, 6, 5, 1), (192, 192, 6, 5, 1),
    (192, 192, 6, 5, 1),
    (192, 320, 6, 3, 1),
]
_B0_SPLITS = (3, 5, 11, 16)


class _SamePadConv(tnn.Conv2d):
    """efficientnet-pytorch Conv2dDynamicSamePadding (TF SAME)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        eh = (kh - 1) * self.dilation[0] + 1
        ew = (kw - 1) * self.dilation[1] + 1
        ph = max((math.ceil(ih / sh) - 1) * sh + eh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + ew - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _bn(ch):
    return tnn.BatchNorm2d(ch, eps=1e-3, momentum=0.01)


def _swish(x):
    return x * torch.sigmoid(x)


class _TorchMBConv(tnn.Module):
    """efficientnet-pytorch MBConvBlock twin (same state_dict keys)."""

    def __init__(self, in_ch, out_ch, expand, kernel, stride):
        super().__init__()
        hidden = in_ch * expand
        if expand != 1:
            self._expand_conv = tnn.Conv2d(in_ch, hidden, 1, bias=False)
            self._bn0 = _bn(hidden)
        self._depthwise_conv = _SamePadConv(
            hidden, hidden, kernel, stride, groups=hidden, bias=False)
        self._bn1 = _bn(hidden)
        squeezed = max(1, int(in_ch * 0.25))
        self._se_reduce = tnn.Conv2d(hidden, squeezed, 1)
        self._se_expand = tnn.Conv2d(squeezed, hidden, 1)
        self._project_conv = tnn.Conv2d(hidden, out_ch, 1, bias=False)
        self._bn2 = _bn(out_ch)
        self.use_res = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = x
        if hasattr(self, "_expand_conv"):
            y = _swish(self._bn0(self._expand_conv(y)))
        y = _swish(self._bn1(self._depthwise_conv(y)))
        s = F.adaptive_avg_pool2d(y, 1)
        s = self._se_expand(_swish(self._se_reduce(s)))
        y = torch.sigmoid(s) * y
        y = self._bn2(self._project_conv(y))
        return y + x if self.use_res else y


class _TorchEfficientNetB0(tnn.Module):
    def __init__(self):
        super().__init__()
        self._conv_stem = _SamePadConv(3, 32, 3, 2, bias=False)
        self._bn0 = _bn(32)
        self._blocks = tnn.ModuleList(
            [_TorchMBConv(*spec) for spec in _B0_BLOCKS])

    def forward(self, x):
        y = _swish(self._bn0(self._conv_stem(x)))
        outs, start = [y], 0
        for end in _B0_SPLITS:
            for i in range(start, end):
                y = self._blocks[i](y)
            outs.append(y)
            start = end
        return outs


def _converted_pair():
    torch.manual_seed(11)
    twin = _TorchEfficientNetB0().eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    enc = EfficientNetEncoder(variant="efficientnet-b0")
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, batch_stats = convert_efficientnet_state_dict(
        sd, variables["params"], variables["batch_stats"], encoder_key=None)
    return twin, enc, params, batch_stats


def test_scaling_math_matches_smp_zoo():
    # smp's published out_channels / stage_idxs for the two variants the
    # reference names plus the widest intermediate ones
    assert feature_channels("efficientnet-b0") == [32, 24, 40, 112, 320]
    assert feature_channels("efficientnet-b4") == [48, 32, 56, 160, 448]
    assert feature_channels("efficientnet-b7") == [64, 48, 80, 224, 640]
    assert stage_splits("efficientnet-b0") == (3, 5, 11, 16)
    assert stage_splits("efficientnet-b7") == (11, 18, 38, 55)
    specs = block_specs("efficientnet-b0")
    assert [(s["in_ch"], s["out_ch"], s["expand"], s["kernel"], s["stride"])
            for s in specs] == _B0_BLOCKS


@pytest.mark.slow
def test_golden_stage_parity_vs_torch_twin():
    twin, enc, params, batch_stats = _converted_pair()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        t_feats = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    j_feats = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False)
    assert len(j_feats) == 5
    for i, (tf, jf) in enumerate(zip(t_feats, j_feats)):
        np.testing.assert_allclose(
            np.asarray(jf), tf.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f"stage {i + 1}")


@pytest.mark.slow
def test_converter_dispatch_detects_efficientnet():
    twin, enc, params, batch_stats = _converted_pair()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = enc.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    p2, _ = convert_encoder_state_dict(
        sd, variables["params"], variables["batch_stats"], encoder_key=None)
    np.testing.assert_array_equal(np.asarray(p2["stem_conv"]["kernel"]),
                                  np.asarray(params["stem_conv"]["kernel"]))


def test_feature_pyramid_contract():
    enc = EfficientNetEncoder(variant="efficientnet-b0")
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    feats = enc.apply(v, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    for i, (f, c) in enumerate(zip(feats,
                                   feature_channels("efficientnet-b0"))):
        stride = 2 ** (i + 1)
        assert f.shape == (2, SIZE // stride, SIZE // stride, c), f.shape


def test_output_stride_16_dilates_last_stage():
    enc = EfficientNetEncoder(variant="efficientnet-b0", output_stride=16)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    feats = enc.apply(v, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    assert feats[3].shape[1] == SIZE // 16
    assert feats[4].shape[1] == SIZE // 16  # stride 32 stage held at 16
    assert feats[4].shape[-1] == 320


@pytest.mark.parametrize("model_name", ["fpn", "deeplabv3+", "pspnet",
                                        "unet++"])
@pytest.mark.slow
def test_decoders_accept_efficientnet_backbone(model_name):
    cfg = Config(model=model_name, backbone="efficientnet-b0", img_size=SIZE)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    out = model.apply(variables, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, SIZE, SIZE, 1)


@pytest.mark.slow
def test_train_mode_grads_flow():
    cfg = Config(model="fpn", backbone="efficientnet-b0", img_size=SIZE)
    model = build_model(cfg)
    x = jnp.ones((2, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
