#!/usr/bin/env python
"""Offline torchvision → framework pretrained-weights conversion.

The reference always trains from torchvision's ImageNet resnet18
(reference ``models/resunet.py:12`` ``ResNet18_Weights.DEFAULT``;
``train_worker.py:157`` ``encoder_weights="imagenet"``).  TPU pods have no
network egress, so conversion is a one-time offline step on any machine
that has the weights file:

    # on a machine with internet (or a cached ~/.torch/hub):
    #   https://download.pytorch.org/models/resnet18-f37072fd.pth
    python scripts/convert_torchvision_resnet18.py \
        --pth resnet18-f37072fd.pth --out resnet18_imagenet.npz

    # then point the training config at the artifact (no torch needed):
    #   pretrained_path: /path/to/resnet18_imagenet.npz

The script validates the file against torchvision's exact resnet18
state_dict spec (key set + shapes + the sha256 prefix encoded in the
canonical filename) before writing, so a wrong/truncated file fails
loudly.  The .npz keeps torch's key names; the layout transforms
(OIHW→HWIO etc.) happen at load time in utils/torch_weights.py, where they
are pinned by golden tests against torch execution.
"""

from __future__ import annotations

import argparse
import hashlib
import sys

import numpy as np

# canonical torchvision artifact (filename embeds the sha256 prefix)
CANONICAL_SHA256_PREFIX = "f37072fd"


def resnet18_spec() -> dict:
    """Exact torchvision resnet18 state_dict spec: name → shape."""
    spec = {
        "conv1.weight": (64, 3, 7, 7),
        "fc.weight": (1000, 512),
        "fc.bias": (1000,),
    }

    def bn(name, c):
        spec[f"{name}.weight"] = (c,)
        spec[f"{name}.bias"] = (c,)
        spec[f"{name}.running_mean"] = (c,)
        spec[f"{name}.running_var"] = (c,)
        spec[f"{name}.num_batches_tracked"] = ()

    bn("bn1", 64)
    chans = {1: 64, 2: 128, 3: 256, 4: 512}
    in_ch = {1: 64, 2: 64, 3: 128, 4: 256}
    for li in (1, 2, 3, 4):
        for b in (0, 1):
            pre = f"layer{li}.{b}"
            c = chans[li]
            cin = in_ch[li] if b == 0 else c
            spec[f"{pre}.conv1.weight"] = (c, cin, 3, 3)
            spec[f"{pre}.conv2.weight"] = (c, c, 3, 3)
            bn(f"{pre}.bn1", c)
            bn(f"{pre}.bn2", c)
            if b == 0 and li > 1:
                spec[f"{pre}.downsample.0.weight"] = (c, cin, 1, 1)
                bn(f"{pre}.downsample.1", c)
    return spec


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True,
                   help="torchvision resnet18 state_dict (.pth)")
    p.add_argument("--out", required=True, help="output .npz artifact")
    p.add_argument("--allow-sha-mismatch", action="store_true",
                   help="convert fine-tuned/non-canonical resnet18 weights")
    args = p.parse_args()

    sha = hashlib.sha256(open(args.pth, "rb").read()).hexdigest()
    if not sha.startswith(CANONICAL_SHA256_PREFIX):
        msg = (f"sha256 {sha[:8]}… does not match torchvision's canonical "
               f"resnet18-{CANONICAL_SHA256_PREFIX}.pth")
        if args.allow_sha_mismatch:
            print(f"warning: {msg} (continuing per --allow-sha-mismatch)")
        else:
            sys.exit(f"error: {msg}; pass --allow-sha-mismatch to override")

    import torch

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    spec = resnet18_spec()
    missing = sorted(set(spec) - set(sd))
    extra = sorted(set(sd) - set(spec))
    if missing or extra:
        sys.exit(f"error: key-set mismatch vs torchvision resnet18 spec — "
                 f"missing {missing[:5]}, extra {extra[:5]}")
    arrays = {}
    for k, shape in spec.items():
        v = sd[k].detach().cpu().numpy()
        if tuple(v.shape) != shape:
            sys.exit(f"error: {k}: shape {tuple(v.shape)} != spec {shape}")
        arrays[k] = v
    np.savez(args.out, **arrays)
    print(f"wrote {args.out}: {len(arrays)} tensors "
          f"({sum(a.nbytes for a in arrays.values()) / 1e6:.1f} MB); "
          f"set `pretrained_path: {args.out}` in the training config")


if __name__ == "__main__":
    main()
