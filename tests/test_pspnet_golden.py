"""Full-model golden parity: our flax PSPNet vs a torch twin with smp's
exact PSPNet topology and state_dict layout (reference factory
``train_worker.py:172-182``; the reference's own test script can never
build it due to the ``"pspnet+"`` typo at ``test.py:101`` — we can),
weights bit-copied through ``convert_smp_pspnet_state_dict``.

smp isn't installed here, so the twin rebuilds its decoder from torch.nn
primitives with smp's module nesting — exactly the state_dict layout
reference PSPNet checkpoints carry
(``decoder.psp.blocks.{i}.pool.1.{0,1}``, ``decoder.conv.{0,1}``,
``segmentation_head.0``), including the no-BatchNorm 1×1 bin, the
``[branches..., identity]`` concat order, corner-aligned branch upsamples
and the 8× corner-aligned head upsample.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
    convert_smp_pspnet_state_dict,
)

from test_resunet_golden import _TorchResNet18

SIZE = 64


class _PSPBlock(tnn.Module):
    def __init__(self, cin, cout, pool_size):
        super().__init__()
        use_bn = pool_size != 1  # smp: no BatchNorm for the 1×1 bin
        conv = tnn.Conv2d(cin, cout, 1, bias=not use_bn)
        norm = tnn.BatchNorm2d(cout) if use_bn else tnn.Identity()
        self.pool = tnn.Sequential(
            tnn.AdaptiveAvgPool2d(output_size=(pool_size, pool_size)),
            tnn.Sequential(conv, norm, tnn.ReLU(inplace=True)),
        )

    def forward(self, x):
        h, w = x.size(2), x.size(3)
        x = self.pool(x)
        return F.interpolate(x, size=(h, w), mode="bilinear",
                             align_corners=True)


class _TorchSmpPSPNet(tnn.Module):
    """smp.PSPNet(resnet18, psp_use_batchnorm=True) twin with smp's exact
    parameter names (encoder depth 3: layer3/layer4 exist in the
    state_dict but never run)."""

    def __init__(self, classes=1):
        super().__init__()
        self.encoder = _TorchResNet18()

        class Decoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.psp = tnn.Module()
                self.psp.blocks = tnn.ModuleList(
                    [_PSPBlock(128, 128 // 4, s) for s in (1, 2, 3, 6)]
                )
                self.conv = tnn.Sequential(
                    tnn.Conv2d(128 * 2, 512, 1, bias=False),
                    tnn.BatchNorm2d(512),
                    tnn.ReLU(inplace=True),
                )
                self.dropout = tnn.Dropout2d(p=0.2)

            def forward(self, x):
                xs = [block(x) for block in self.psp.blocks] + [x]
                return self.dropout(self.conv(torch.cat(xs, dim=1)))

        self.decoder = Decoder()
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(512, classes, 3, padding=1),
            tnn.UpsamplingBilinear2d(scale_factor=8),
        )

    def forward(self, x):
        e = self.encoder
        y = e.maxpool(e.relu(e.bn1(e.conv1(x))))
        c3 = e.layer2(e.layer1(y))  # encoder depth 3: stride-8 feature
        return self.segmentation_head(self.decoder(c3))


def _randomize_stats(tmodel):
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


def test_full_pspnet_matches_smp_twin():
    torch.manual_seed(11)
    tmodel = _TorchSmpPSPNet().eval()
    _randomize_stats(tmodel)

    x = np.random.default_rng(2).normal(
        size=(2, 3, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.as_tensor(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = Config(model="pspnet", img_size=SIZE, compute_dtype="float32")
    fmodel = build_model(cfg)
    variables = fmodel.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, SIZE, SIZE, 3)), train=False,
    )
    params, batch_stats = convert_smp_pspnet_state_dict(
        sd, variables["params"], variables["batch_stats"]
    )
    out = fmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-4)


def test_evaluator_loads_reference_pspnet_pth(tmp_path):
    """End-to-end: a reference-format smp-PSPNet .pth evaluates through our
    Evaluator — beyond the reference, whose test script can't even build
    pspnet (the ``"pspnet+"`` typo)."""
    from pdac_pathological_image_segmentation_tpu.data import (
        PatchDataset,
        discover_split,
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.infer.evaluate import (
        Evaluator,
    )

    torch.manual_seed(12)
    tmodel = _TorchSmpPSPNet().eval()
    _randomize_stats(tmodel)
    ckpt = {
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": {},
        "epoch": 1,
        "previous_best": 0.4,
    }
    pth = tmp_path / "latest.pth"
    torch.save(ckpt, pth)

    data = tmp_path / "test"
    generate_synthetic_patches(str(data), n=8, size=SIZE, seed=13)
    cfg = Config(model="pspnet", img_size=SIZE, batch_size=8, num_worker=2,
                 compute_dtype="float32", test_path=str(data))
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
