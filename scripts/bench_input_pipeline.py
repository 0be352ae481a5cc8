#!/usr/bin/env python
"""Integrated input-pipeline benchmark: real PNG decode feeding the real
train step (VERDICT r4 item 6).

The reference's actual bottleneck is its per-sample CPU loop — PIL decode
+ albumentations per patch under a DataLoader (``/root/reference/
dataset.py:24-30``).  Rounds 1–3 benched our replacements in isolation
(``scripts/bench_decode.py`` for the native decoder, device-resident
batches for the step); this script measures the INTEGRATED pipeline on
synthetic 512² patch pairs on tmpfs:

  decode     host-only: PatchLoader batch decode (native C++ PNG pool)
  h2d        host→device upload of one uint8 batch (this harness: the
             ~20 MB/s tunnel; production: PCIe ≥16 GB/s)
  device     train step on a device-resident batch (no input pipeline)
  e2e        the real epoch loop — loader thread decoding + uploading
             batch i+1 while the device trains batch i

and derives the input-bubble fraction 1 − e2e/device plus the host-core
count at which decode stops mattering (device_rate / decode_rate_per_core
— this VM has ONE core; production TPU-VM hosts have dozens).

Run serially — one process owns the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--n", type=int, default=512, help="dataset size")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dir", default="/dev/shm/pdac_input_bench",
                   help="tmpfs dir for the synthetic PNG pairs")
    p.add_argument("--epochs", type=int, default=2,
                   help="measured e2e epochs (after a compile epoch)")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from pdac_pathological_image_segmentation_tpu.data.discovery import (
        discover_split,
    )
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        PatchDataset,
        PatchLoader,
    )
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.train.steps import (
        make_train_step,
    )
    from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
        TRAIN_COMPILER_OPTIONS,
        compile_serving,
    )

    res = {"batch": args.batch, "n_images": args.n, "size": args.size,
           "host_cores": os.cpu_count()}

    if not os.path.isdir(args.dir) or len(os.listdir(args.dir)) < 2 * args.n:
        t0 = time.perf_counter()
        generate_synthetic_patches(args.dir, n=args.n, size=args.size, seed=0)
        res["generate_s"] = round(time.perf_counter() - t0, 1)

    cfg = Config(model="unet", img_size=args.size,
                 compute_dtype="bfloat16", batch_size=args.batch)
    imgs, msks = discover_split(args.dir)
    ds = PatchDataset(imgs, msks, cfg)
    loader = PatchLoader(ds, args.batch, shuffle=True, num_workers=8)

    # --- decode-only (host) -------------------------------------------------
    nb, n_dec = 0, 0
    t0 = time.perf_counter()
    for hb in loader._host_batches(0):
        nb += 1
        n_dec += hb.image.shape[0]
    decode_s = time.perf_counter() - t0
    res["decode_patches_per_s"] = round(n_dec / decode_s, 1)
    res["native_decoder"] = loader._native_hw is not None

    # --- h2d (one batch) ----------------------------------------------------
    hb = next(iter(loader._host_batches(0)))
    # warm pass: the relay compiles the element-fetch program on first
    # use (~minutes cold) — keep that compile out of the transfer number
    warm = jax.device_put(hb.image)
    _ = int(np.asarray(warm[0, 0, 0, 0]))
    del warm
    t0 = time.perf_counter()
    dev = jax.device_put(hb.image)
    _ = int(np.asarray(dev[0, 0, 0, 0]))  # force completion (relay)
    h2d_s = time.perf_counter() - t0
    res["h2d_mb_per_s"] = round(hb.image.nbytes / 1e6 / h2d_s, 1)

    # --- device-only step ---------------------------------------------------
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)))
    step = compile_serving(
        make_train_step(model, args.size, donate=True),
        state, jax.random.PRNGKey(0), dev,
        jax.device_put(hb.mask), jax.device_put(hb.valid),
        options=TRAIN_COMPILER_OPTIONS)
    key = jax.random.PRNGKey(0)
    x = dev
    m = jax.device_put(hb.mask)
    v = jax.device_put(hb.valid)
    state, loss, _ = step(state, key, x, m, v)
    _ = float(loss)
    n_steps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 15:
        state, loss, _ = step(state, key, x, m, v)
        if (n_steps + 1) % 4 == 0:
            _ = float(loss)
        n_steps += 1
    _ = float(loss)
    dev_rate = n_steps * args.batch / (time.perf_counter() - t0)
    res["device_patches_per_s"] = round(dev_rate, 1)

    # --- end-to-end epochs (the Trainer's hot loop) -------------------------
    n_e2e, losses = 0, []
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        for bi, batch in enumerate(loader.epoch(ep)):
            state, loss, _ = step(state, key, batch.image, batch.mask,
                                  batch.valid)
            losses.append(loss)
            n_e2e += batch.image.shape[0]
    _ = float(losses[-1])
    e2e_s = time.perf_counter() - t0
    e2e_rate = n_e2e / e2e_s
    res["e2e_patches_per_s"] = round(e2e_rate, 1)
    res["input_bubble_fraction"] = round(1.0 - e2e_rate / dev_rate, 3)
    # cores where decode stops being the bottleneck (decode rate measured
    # on this host's core count, scaled linearly — the native pool scales)
    per_core = res["decode_patches_per_s"] / max(1, os.cpu_count())
    res["cores_to_hide_decode"] = round(dev_rate / per_core, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
