"""MobileNetV2 encoder: golden parity vs a torch twin + decoder plumbing.

The reference passes ``cfg["backbone"]`` straight into smp's encoder zoo —
"e.g. mobilenet_v2 or efficientnet-b7" (reference ``train_worker.py:155``)
— so the framework supports a non-ResNet member of that family.
torchvision isn't installed; the torch twin builds ``mobilenet_v2``'s
``features`` from torch.nn primitives with torchvision's exact state_dict
naming (``features.i.conv.j...``), which is what
``convert_mobilenetv2_state_dict`` consumes from real checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.models.mobilenetv2 import (
    MobileNetV2Encoder,
)
from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
    convert_mobilenetv2_state_dict,
)

SIZE = 64
_STAGE_SPLITS = (2, 4, 7, 14, 19)


def _conv_bn_relu(inp, oup, k, stride=1, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(inp, oup, k, stride, (k - 1) // 2, groups=groups,
                   bias=False),
        tnn.BatchNorm2d(oup),
        tnn.ReLU6(inplace=True),
    )


class _TorchIR(tnn.Module):
    """torchvision InvertedResidual (same state_dict keys)."""

    def __init__(self, inp, oup, stride, t):
        super().__init__()
        hidden = inp * t
        layers = []
        if t != 1:
            layers.append(_conv_bn_relu(inp, hidden, 1))
        layers.extend([
            _conv_bn_relu(hidden, hidden, 3, stride, groups=hidden),
            tnn.Conv2d(hidden, oup, 1, bias=False),
            tnn.BatchNorm2d(oup),
        ])
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and inp == oup

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class _TorchMobileNetV2(tnn.Module):
    """torchvision mobilenet_v2().features twin, staged smp-style."""

    def __init__(self):
        super().__init__()
        setting = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                   (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                   (6, 320, 1, 1)]
        feats = [_conv_bn_relu(3, 32, 3, 2)]
        inp = 32
        for t, c, n, s in setting:
            for b in range(n):
                feats.append(_TorchIR(inp, c, s if b == 0 else 1, t))
                inp = c
        feats.append(_conv_bn_relu(inp, 1280, 1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        outs, start = [], 0
        for end in _STAGE_SPLITS:
            for i in range(start, end):
                x = self.features[i](x)
            outs.append(x)
            start = end
        return outs


def _converted_pair():
    torch.manual_seed(7)
    twin = _TorchMobileNetV2().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    enc = MobileNetV2Encoder()
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, batch_stats = convert_mobilenetv2_state_dict(
        sd, variables["params"], variables["batch_stats"], encoder_key=None)
    return twin, enc, params, batch_stats


@pytest.mark.slow
def test_golden_stage_parity_vs_torch_twin():
    twin, enc, params, batch_stats = _converted_pair()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        t_feats = twin(torch.from_numpy(x).permute(0, 3, 1, 2))
    j_feats = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False)
    assert len(j_feats) == 5
    for i, (tf, jf) in enumerate(zip(t_feats, j_feats)):
        np.testing.assert_allclose(
            np.asarray(jf),
            tf.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4,
            err_msg=f"stage {i + 1}",
        )


@pytest.mark.slow
def test_feature_pyramid_contract():
    enc = MobileNetV2Encoder()
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    feats = enc.apply(v, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    chans = MobileNetV2Encoder.feature_channels()
    for i, (f, c) in enumerate(zip(feats, chans)):
        stride = 2 ** (i + 1)
        assert f.shape == (2, SIZE // stride, SIZE // stride, c), f.shape


def test_output_stride_16_dilates_last_stage():
    enc = MobileNetV2Encoder(output_stride=16)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    feats = enc.apply(v, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    assert feats[3].shape[1] == SIZE // 16
    assert feats[4].shape[1] == SIZE // 16  # stride 32 stage held at 16
    assert feats[4].shape[-1] == 1280


@pytest.mark.parametrize("model_name", ["fpn", "deeplabv3+", "pspnet",
                                        "unet++"])
@pytest.mark.slow
def test_decoders_accept_mobilenet_backbone(model_name):
    cfg = Config(model=model_name, backbone="mobilenet_v2", img_size=SIZE)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    out = model.apply(variables, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, SIZE, SIZE, 1)


@pytest.mark.slow
def test_train_mode_grads_flow():
    cfg = Config(model="fpn", backbone="mobilenet_v2", img_size=SIZE)
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
