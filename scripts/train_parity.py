#!/usr/bin/env python
"""End-to-end training-parity run: the reference pipeline (faithful torch
twin, single process — the reference's own stack isn't installable here:
torchvision/smp/albumentations are absent) vs this framework, same data,
same recipe, same batch order.

Both sides train the reference ResUNet topology with Dice loss + Adam
(lr 1e-4, torch defaults) on a synthetic H&E-like patch set, augmentation
disabled on BOTH sides (augmentation RNG is not comparable across
frameworks; inference/loss/optimizer parity is pinned bitwise by
tests/test_resunet_golden.py + tests/test_optimizer_parity.py).  Batches
follow one shared seeded permutation per epoch, so the trajectories differ
only by framework numerics (conv algorithms, BN's biased-vs-unbiased
running-var fold).

Prints a per-epoch table and a final verdict; paste the table into
BASELINE.md.  Runs on CPU: JAX_PLATFORMS=cpu recommended.

Usage: python scripts/train_parity.py [--epochs 6] [--n-train 48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--n-train", type=int, default=48)
    p.add_argument("--n-val", type=int, default=16)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--tolerance", type=float, default=0.05)
    args = p.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from pdac_pathological_image_segmentation_tpu.config import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        Config,
    )
    from pdac_pathological_image_segmentation_tpu.data import (
        PatchDataset,
        discover_split,
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.models import build_model
    from pdac_pathological_image_segmentation_tpu.ops.dice import (
        dice_loss,
        dice_score,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from test_resunet_golden import _TorchResUNet

    size, bs = args.size, args.batch

    # ---------------- shared data ----------------
    root = "/tmp/pdac_train_parity"
    for split, n, seed in (("train", args.n_train, 0), ("val", args.n_val, 1)):
        d = os.path.join(root, split)
        if not os.path.isdir(d) or len(os.listdir(d)) != 2 * n:
            generate_synthetic_patches(d, n=n, size=size, seed=seed)
    cfg = Config(model="unet", img_size=size, batch_size=bs, lr=args.lr,
                 compute_dtype="float32", seed=41)
    tr = PatchDataset(*discover_split(os.path.join(root, "train")), cfg)
    va = PatchDataset(*discover_split(os.path.join(root, "val")), cfg)

    def load_all(ds):
        imgs = np.stack([ds[i][0] for i in range(len(ds))])
        msks = np.stack([ds[i][1] for i in range(len(ds))]).astype(np.float32)
        msks = (msks > 0).astype(np.float32)
        return imgs, msks

    tr_x, tr_y = load_all(tr)
    va_x, va_y = load_all(va)
    norm = lambda u8: ((u8.astype(np.float32) / 255.0
                        - np.asarray(IMAGENET_MEAN))
                       / np.asarray(IMAGENET_STD)).astype(np.float32)

    def epoch_batches(epoch):
        order = np.random.RandomState(cfg.seed + epoch).permutation(len(tr_x))
        n_full = len(order) // bs
        for b in range(n_full):
            idx = order[b * bs:(b + 1) * bs]
            yield tr_x[idx], tr_y[idx]

    # ---------------- torch (reference-twin) side ----------------
    torch.manual_seed(cfg.seed)
    tmodel = _TorchResUNet(output_size=size)
    topt = torch.optim.Adam(tmodel.parameters(), lr=args.lr)

    def torch_dice_loss(logits, target, smooth=1e-6):
        probs = torch.sigmoid(logits).reshape(-1)
        target = target.reshape(-1)
        inter = (probs * target).sum()
        return 1.0 - (2.0 * inter + smooth) / (
            probs.sum() + target.sum() + smooth)

    def torch_val():
        tmodel.eval()
        scores = []
        with torch.no_grad():
            for s in range(0, len(va_x), bs):
                x = torch.as_tensor(
                    norm(va_x[s:s + bs]).transpose(0, 3, 1, 2))
                out = tmodel(x)[:, 0]
                pred = (torch.sigmoid(out) >= 0.5).float().numpy()
                t = va_y[s:s + bs]
                inter = (pred * t).sum()
                scores.append(
                    (2 * inter + 1e-6) / (pred.sum() + t.sum() + 1e-6))
        return float(np.mean(scores))

    # ---------------- flax side (same init? no — independent seeds; the
    # comparison is trajectory/final-Dice, not bitwise) ----------------
    # For the tightest comparison, graft the SAME initial weights.
    from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
        convert_resunet_state_dict,
    )

    fmodel = build_model(cfg)
    state = create_train_state(cfg, fmodel, jax.random.PRNGKey(cfg.seed))
    sd0 = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_resunet_state_dict(
        sd0, state.params, state.batch_stats
    )
    state = state.replace(params=params, batch_stats=batch_stats)

    @jax.jit
    def train_step(state, x, y):
        def loss_fn(p):
            out, mut = fmodel.apply(
                {"params": p, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return dice_loss(out[..., 0], y), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads).replace(batch_stats=new_bs), loss

    @jax.jit
    def val_step(state, x, y):
        out = fmodel.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        pred = (jax.nn.sigmoid(out[..., 0]) >= 0.5).astype(jnp.float32)
        return dice_score(pred, y)

    def flax_val(state):
        scores = []
        for s in range(0, len(va_x), bs):
            scores.append(float(val_step(
                state, jnp.asarray(norm(va_x[s:s + bs])),
                jnp.asarray(va_y[s:s + bs]))))
        return float(np.mean(scores))

    # ---------------- run ----------------
    print(f"| epoch | torch train_loss | flax train_loss | "
          f"torch val_dice | flax val_dice | Δdice |")
    print("|---|---|---|---|---|---|")
    t_dice = f_dice = 0.0
    for epoch in range(args.epochs):
        t_losses, f_losses = [], []
        for x_u8, y in epoch_batches(epoch):
            xn = norm(x_u8)
            tmodel.train()
            out = tmodel(torch.as_tensor(xn.transpose(0, 3, 1, 2)))[:, 0]
            tl = torch_dice_loss(out, torch.as_tensor(y))
            topt.zero_grad()
            tl.backward()
            topt.step()
            t_losses.append(float(tl))

            state, fl = train_step(state, jnp.asarray(xn), jnp.asarray(y))
            f_losses.append(float(fl))
        t_dice, f_dice = torch_val(), flax_val(state)
        print(f"| {epoch + 1} | {np.mean(t_losses):.4f} | "
              f"{np.mean(f_losses):.4f} | {t_dice:.4f} | {f_dice:.4f} | "
              f"{f_dice - t_dice:+.4f} |", flush=True)

    delta = abs(f_dice - t_dice)
    verdict = "PASS" if delta <= args.tolerance else "FAIL"
    print(f"\nfinal val Dice: torch {t_dice:.4f} vs flax {f_dice:.4f} "
          f"(|Δ| = {delta:.4f} ≤ {args.tolerance}) → {verdict}")
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
