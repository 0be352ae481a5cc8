"""Pretrained-encoder conversion: torchvision resnet18 spec → flax.

No network egress here, so the canonical ImageNet file can't be fetched;
instead these tests prove the *conversion chain* on a state_dict with
torchvision's exact key set and shapes (scripts/convert_torchvision_resnet18
validates real files against the same spec + sha prefix before writing):

* the offline CLI converts a torch .pth → .npz artifact;
* ``pretrained_path`` accepts the torch-free .npz;
* strict coverage: every flax encoder leaf must be overwritten — a
  truncated/renamed state_dict fails loudly instead of silently training
  from half-random weights.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.models.resnet import (
    ResNetEncoder,
)
from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
    convert_resnet_state_dict,
    load_pretrained_encoder,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from convert_torchvision_resnet18 import resnet18_spec  # noqa: E402

RNG = np.random.default_rng(7)


def _full_torchvision_sd():
    """state_dict with torchvision resnet18's exact keys/shapes."""
    sd = {}
    for k, shape in resnet18_spec().items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):
            sd[k] = (np.abs(RNG.normal(size=shape)) + 0.5).astype(np.float32)
        else:
            sd[k] = RNG.normal(size=shape).astype(np.float32)
    return sd


def _enc_variables():
    enc = ResNetEncoder(backbone="resnet18")
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    return enc, variables


def test_spec_matches_reference_twin():
    """The CLI's spec == the torch twin's actual state_dict layout."""
    from test_resunet_golden import _TorchResNet18

    twin_sd = _TorchResNet18().state_dict()
    spec = resnet18_spec()
    spec_enc = {k: v for k, v in spec.items() if not k.startswith("fc.")}
    assert set(twin_sd) == set(spec_enc)
    for k, v in twin_sd.items():
        assert tuple(v.shape) == spec_enc[k], k


def test_convert_cli_roundtrip(tmp_path):
    sd = _full_torchvision_sd()
    pth = tmp_path / "resnet18.pth"
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, pth)
    out = tmp_path / "resnet18_imagenet.npz"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "convert_torchvision_resnet18.py"),
         "--pth", str(pth), "--out", str(out), "--allow-sha-mismatch"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists()

    # the torch-free artifact loads as pretrained_path
    enc, variables = _enc_variables()
    params, batch_stats = load_pretrained_encoder(
        str(out), {"encoder": variables["params"]},
        {"encoder": variables["batch_stats"]},
    )
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
    )
    # grafted encoder still runs
    feats = enc.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        jnp.ones((1, 64, 64, 3)), train=False,
    )
    assert feats[-1].shape == (1, 2, 2, 512)


def test_convert_cli_rejects_bad_keyset(tmp_path):
    sd = _full_torchvision_sd()
    del sd["layer2.0.downsample.0.weight"]
    pth = tmp_path / "bad.pth"
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, pth)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "convert_torchvision_resnet18.py"),
         "--pth", str(pth), "--out", str(tmp_path / "o.npz"),
         "--allow-sha-mismatch"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode != 0
    assert "key-set mismatch" in r.stderr


def test_strict_coverage_rejects_partial_state_dict():
    sd = _full_torchvision_sd()
    # drop one whole block's tensors → the flax leaves it would fill stay
    # random → must raise, not silently half-graft
    sd = {k: v for k, v in sd.items() if not k.startswith("layer3.1.conv2")}
    sd = {k: v for k, v in sd.items() if not k.startswith("layer3.1.bn2")}
    _, variables = _enc_variables()
    with pytest.raises(KeyError, match="partial graft"):
        convert_resnet_state_dict(
            sd, variables["params"], variables["batch_stats"],
            encoder_key=None,
        )


def test_converted_artifact_activation_parity(tmp_path):
    """Golden-activation parity for the FULL offline chain: a real
    torch-serialized resnet18 .pth (exact torchvision layout) → CLI
    conversion → .npz → ``load_pretrained_encoder`` → flax encoder — every
    encoder stage's activations must match torch execution of the same
    weights.  This is the validation the real
    ``resnet18-f37072fd.pth`` passes through when a user converts it
    (no network egress here, so the weights are random; the chain —
    serialization, spec check, layout transforms, graft — is identical)."""
    from test_resunet_golden import _TorchResNet18

    torch.manual_seed(21)
    twin = _TorchResNet18().eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = {k: v for k, v in twin.state_dict().items()}
    # the twin has no fc head; torchvision's artifact does — add it so the
    # CLI's strict key-set check sees the canonical layout
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    pth = tmp_path / "resnet18.pth"
    torch.save(sd, pth)

    out = tmp_path / "resnet18_imagenet.npz"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "convert_torchvision_resnet18.py"),
         "--pth", str(pth), "--out", str(out), "--allow-sha-mismatch"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stdout + r.stderr

    enc, variables = _enc_variables()
    params, batch_stats = load_pretrained_encoder(
        str(out), {"encoder": variables["params"]},
        {"encoder": variables["batch_stats"]},
    )

    x = RNG.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t = torch.as_tensor(x)
        c1 = twin.relu(twin.bn1(twin.conv1(t)))
        y = twin.maxpool(c1)
        c2 = twin.layer1(y)
        c3 = twin.layer2(c2)
        c4 = twin.layer3(c3)
        c5 = twin.layer4(c4)
        torch_feats = [c.numpy() for c in (c1, c2, c3, c4, c5)]

    flax_feats = enc.apply(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    for i, (tf, ff) in enumerate(zip(torch_feats, flax_feats)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(ff), (0, 3, 1, 2)), tf,
            rtol=2e-3, atol=1e-4,
            err_msg=f"stage c{i + 1} mismatch after conversion",
        )
