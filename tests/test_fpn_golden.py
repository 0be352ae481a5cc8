"""Full-model golden parity: our flax FPN vs a torch twin with smp's exact
FPN topology and state_dict layout (the reference's DEFAULT model —
``configs/train_config.yaml:22`` ``model: fpn``, factory
``train_worker.py:153-161``), weights bit-copied through
``convert_smp_fpn_state_dict``.

smp isn't installed here, so the twin rebuilds its decoder from torch.nn
primitives with smp's module nesting — which is exactly the state_dict
layout reference FPN checkpoints carry (``decoder.p5``,
``decoder.pN.skip_conv``, ``decoder.seg_blocks.{i}.block.{j}.block.{0,1}``,
``segmentation_head.0``), including GroupNorm(32, eps=1e-5), nearest 2×
top-down upsampling and the align_corners=True 4× head upsample
(nn.UpsamplingBilinear2d).
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
    convert_smp_fpn_state_dict,
)

from test_resunet_golden import _TorchResNet18

SIZE = 64


class _C3GN(tnn.Module):
    """smp Conv3x3GNReLU: block = Sequential(conv3x3 no-bias, GN(32), ReLU)."""

    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.upsample = upsample
        self.block = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
            tnn.GroupNorm(32, cout),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        return x


class _SegBlock(tnn.Module):
    def __init__(self, cin, cout, n_upsamples):
        super().__init__()
        blocks = [_C3GN(cin, cout, upsample=bool(n_upsamples))]
        for _ in range(1, n_upsamples):
            blocks.append(_C3GN(cout, cout, upsample=True))
        self.block = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class _FPNBlock(tnn.Module):
    def __init__(self, pyramid_channels, skip_channels):
        super().__init__()
        self.skip_conv = tnn.Conv2d(skip_channels, pyramid_channels, 1)

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return x + self.skip_conv(skip)


class _TorchSmpFPN(tnn.Module):
    """smp.FPN(resnet18) twin with smp's exact parameter names."""

    def __init__(self, classes=1):
        super().__init__()
        self.encoder = _TorchResNet18()

        class Decoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.p5 = tnn.Conv2d(512, 256, 1)
                self.p4 = _FPNBlock(256, 256)
                self.p3 = _FPNBlock(256, 128)
                self.p2 = _FPNBlock(256, 64)
                self.seg_blocks = tnn.ModuleList(
                    [_SegBlock(256, 128, n) for n in (3, 2, 1, 0)]
                )

            def forward(self, feats):
                c2, c3, c4, c5 = feats
                p5 = self.p5(c5)
                p4 = self.p4(p5, c4)
                p3 = self.p3(p4, c3)
                p2 = self.p2(p3, c2)
                return sum(
                    b(p) for b, p in zip(self.seg_blocks, (p5, p4, p3, p2))
                )

        self.decoder = Decoder()
        # smp FPN passes kernel_size=1 to SegmentationHead (fpn/model.py)
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(128, classes, 1),
            tnn.UpsamplingBilinear2d(scale_factor=4),
        )

    def forward(self, x):
        e = self.encoder
        c1 = e.relu(e.bn1(e.conv1(x)))
        y = e.maxpool(c1)
        c2 = e.layer1(y)
        c3 = e.layer2(c2)
        c4 = e.layer3(c3)
        c5 = e.layer4(c4)
        return self.segmentation_head(self.decoder((c2, c3, c4, c5)))


@pytest.mark.slow
def test_full_fpn_matches_smp_twin():
    torch.manual_seed(3)
    tmodel = _TorchSmpFPN().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
            if isinstance(m, tnn.GroupNorm):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    x = np.random.default_rng(0).normal(
        size=(2, 3, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.as_tensor(x)).numpy()

    sd = {f"module.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    cfg = Config(model="fpn", img_size=SIZE, compute_dtype="float32",
                 use_pallas=False)
    fmodel = build_model(cfg)
    variables = fmodel.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, SIZE, SIZE, 3)), train=False,
    )
    params, batch_stats = convert_smp_fpn_state_dict(
        sd, variables["params"], variables["batch_stats"]
    )
    out = fmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-4)


def test_evaluator_loads_reference_fpn_pth(tmp_path):
    """End-to-end: a reference-format smp-FPN .pth evaluates through our
    Evaluator — the reference's *default* checkpoints work here."""
    from pdac_pathological_image_segmentation_tpu.data import (
        PatchDataset,
        discover_split,
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.infer.evaluate import (
        Evaluator,
    )

    torch.manual_seed(4)
    tmodel = _TorchSmpFPN().eval()
    ckpt = {
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": {},
        "epoch": 3,
        "previous_best": 0.6,
    }
    pth = tmp_path / "best.pth"
    torch.save(ckpt, pth)

    data = tmp_path / "test"
    generate_synthetic_patches(str(data), n=8, size=SIZE, seed=5)
    cfg = Config(model="fpn", img_size=SIZE, batch_size=8, num_worker=2,
                 compute_dtype="float32", test_path=str(data),
                 use_pallas=False)
    ev = Evaluator(cfg, str(pth))
    ds = PatchDataset(*discover_split(str(data)), cfg)
    res = ev.run(ds)
    assert 0.0 <= res["test_score"] <= 1.0

    # torch-side score on the same data
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
