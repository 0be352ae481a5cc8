"""Full-model golden parity: our flax DeepLabV3Plus vs a torch twin with
smp's exact DeepLabV3Plus topology and state_dict layout (reference factory
``train_worker.py:163-170`` / ``test.py:94-101``), weights bit-copied
through ``convert_smp_deeplabv3plus_state_dict``.

smp isn't installed here, so the twin rebuilds its decoder from torch.nn
primitives with smp's module nesting — exactly the state_dict layout
reference DeepLabV3+ checkpoints carry (``decoder.aspp.0.convs.{i}``,
``decoder.aspp.{1,2}``, ``decoder.block{1,2}``, ``segmentation_head.0``),
including the output-stride-16 dilated layer4 (smp
``replace_strides_with_dilation``: every conv stride 1, dilation 2), the
corner-aligned 4× upsamples (nn.UpsamplingBilinear2d) and the 1×1 head.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
    convert_smp_deeplabv3plus_state_dict,
)

from test_resunet_golden import _TorchResNet18

SIZE = 64
RATES = (3, 6, 9)  # reference configs/train_config.yaml:24


def _dilate(module: tnn.Module, rate: int) -> None:
    """smp ``replace_strides_with_dilation``: every conv in the stage gets
    stride 1, the given dilation, and padding (k//2)·rate."""
    for mod in module.modules():
        if isinstance(mod, tnn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (rate, rate)
            kh, kw = mod.kernel_size
            mod.padding = ((kh // 2) * rate, (kw // 2) * rate)


class _SeparableConv2d(tnn.Sequential):
    def __init__(self, cin, cout, dilation=1):
        super().__init__(
            tnn.Conv2d(cin, cin, 3, padding=dilation, dilation=dilation,
                       groups=cin, bias=False),
            tnn.Conv2d(cin, cout, 1, bias=False),
        )


class _ASPPPooling(tnn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(
            tnn.AdaptiveAvgPool2d(1),
            tnn.Conv2d(cin, cout, 1, bias=False),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(),
        )

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class _ASPP(tnn.Module):
    def __init__(self, cin, cout, rates):
        super().__init__()
        convs = [tnn.Sequential(tnn.Conv2d(cin, cout, 1, bias=False),
                                tnn.BatchNorm2d(cout), tnn.ReLU())]
        for rate in rates:
            convs.append(tnn.Sequential(
                _SeparableConv2d(cin, cout, dilation=rate),
                tnn.BatchNorm2d(cout), tnn.ReLU()))
        convs.append(_ASPPPooling(cin, cout))
        self.convs = tnn.ModuleList(convs)
        self.project = tnn.Sequential(
            tnn.Conv2d(5 * cout, cout, 1, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([c(x) for c in self.convs], dim=1))


class _TorchSmpDeepLabV3Plus(tnn.Module):
    """smp.DeepLabV3Plus(resnet18, output_stride=16) twin with smp's exact
    parameter names."""

    def __init__(self, classes=1, rates=RATES):
        super().__init__()
        self.encoder = _TorchResNet18()
        _dilate(self.encoder.layer4, 2)  # output_stride 16

        class Decoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.aspp = tnn.Sequential(
                    _ASPP(512, 256, rates),
                    _SeparableConv2d(256, 256),
                    tnn.BatchNorm2d(256),
                    tnn.ReLU(),
                )
                self.up = tnn.UpsamplingBilinear2d(scale_factor=4)
                self.block1 = tnn.Sequential(
                    tnn.Conv2d(64, 48, 1, bias=False),
                    tnn.BatchNorm2d(48), tnn.ReLU())
                self.block2 = tnn.Sequential(
                    _SeparableConv2d(48 + 256, 256),
                    tnn.BatchNorm2d(256), tnn.ReLU())

            def forward(self, c2, c5):
                y = self.up(self.aspp(c5))
                skip = self.block1(c2)
                return self.block2(torch.cat([y, skip], dim=1))

        self.decoder = Decoder()
        # smp DeepLabV3Plus passes kernel_size=1 to SegmentationHead
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(256, classes, 1),
            tnn.UpsamplingBilinear2d(scale_factor=4),
        )

    def forward(self, x):
        e = self.encoder
        y = e.maxpool(e.relu(e.bn1(e.conv1(x))))
        c2 = e.layer1(y)
        c5 = e.layer4(e.layer3(e.layer2(c2)))
        return self.segmentation_head(self.decoder(c2, c5))


def _randomize_stats(tmodel):
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


@pytest.mark.slow
def test_full_deeplabv3plus_matches_smp_twin():
    torch.manual_seed(7)
    tmodel = _TorchSmpDeepLabV3Plus().eval()
    _randomize_stats(tmodel)

    x = np.random.default_rng(1).normal(
        size=(2, 3, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.as_tensor(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = Config(model="deeplabv3+", img_size=SIZE, compute_dtype="float32",
                 dilations=RATES)
    fmodel = build_model(cfg)
    variables = fmodel.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, SIZE, SIZE, 3)), train=False,
    )
    params, batch_stats = convert_smp_deeplabv3plus_state_dict(
        sd, variables["params"], variables["batch_stats"]
    )
    out = fmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-4)


def test_evaluator_loads_reference_deeplab_pth(tmp_path):
    """End-to-end: a reference-format smp-DeepLabV3+ .pth evaluates through
    our Evaluator (reference ``test.py:94-101`` capability)."""
    from pdac_pathological_image_segmentation_tpu.data import (
        PatchDataset,
        discover_split,
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.infer.evaluate import (
        Evaluator,
    )

    torch.manual_seed(8)
    tmodel = _TorchSmpDeepLabV3Plus().eval()
    _randomize_stats(tmodel)
    ckpt = {
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": {},
        "epoch": 2,
        "previous_best": 0.5,
    }
    pth = tmp_path / "best.pth"
    torch.save(ckpt, pth)

    data = tmp_path / "test"
    generate_synthetic_patches(str(data), n=8, size=SIZE, seed=9)
    cfg = Config(model="deeplabv3+", img_size=SIZE, batch_size=8,
                 num_worker=2, compute_dtype="float32", dilations=RATES,
                 test_path=str(data))
    ev = Evaluator(cfg, str(pth))
    ds = PatchDataset(*discover_split(str(data)), cfg)
    res = ev.run(ds)
    assert 0.0 <= res["test_score"] <= 1.0

    from pdac_pathological_image_segmentation_tpu.config import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    imgs = np.stack([ds[i][0] for i in range(8)]).astype(np.float32)
    msks = np.stack([ds[i][1] for i in range(8)]).astype(np.float32)
    norm = ((imgs / 255.0 - np.asarray(IMAGENET_MEAN))
            / np.asarray(IMAGENET_STD)).astype(np.float32)
    with torch.no_grad():
        out = tmodel(torch.as_tensor(norm.transpose(0, 3, 1, 2)))
    pred = (torch.sigmoid(out[:, 0]) >= 0.5).float().numpy()
    inter = (pred * msks).sum()
    ref_dice = (2 * inter + 1e-6) / (pred.sum() + msks.sum() + 1e-6)
    np.testing.assert_allclose(res["test_score"], ref_dice, atol=1e-3)
