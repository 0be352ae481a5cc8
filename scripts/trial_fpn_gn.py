#!/usr/bin/env python
"""A/B the FPN serving and train steps with/without the Pallas GroupNorm
kernel (``fpn_pallas_gn`` extra) — the keep-whichever-wins measurement
gating the kernel's default (round-1: the kernel lost in-model, 59.9 vs
52.1 ms/step at bs=128, to Mosaic layout copies; re-measure after the
round-2 DMA variant + round-3 custom VJP).

Run serially — one process owns the TPU:
    python scripts/trial_fpn_gn.py --mode infer --pallas_gn true
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="infer", choices=("infer", "train"))
    p.add_argument("--pallas_gn", default="false")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=48)
    p.add_argument("--depth", type=int, default=8)
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    use_pallas = args.pallas_gn.lower() in ("1", "true", "yes")
    cfg = Config(model="fpn", backbone="resnet18", img_size=512,
                 compute_dtype="bfloat16")
    cfg.extras["fpn_pallas_gn"] = use_pallas
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed)))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, (args.batch, 512, 512, 3), dtype=np.uint8))

    if args.mode == "infer":
        from pdac_pathological_image_segmentation_tpu.train.steps import (
            make_infer_step,
        )
        from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
            compile_serving,
        )

        step = compile_serving(make_infer_step(model, 512), state, x)
        out = step(state, x)
        _ = float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(0, args.iters, args.depth):
            outs = [step(state, x) for _ in range(args.depth)]
            _ = float(outs[-1][0, 0, 0])
        dt = time.perf_counter() - t0
    else:
        from pdac_pathological_image_segmentation_tpu.train.steps import (
            make_train_step,
        )
        from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
            TRAIN_COMPILER_OPTIONS,
            LazyCompiled,
        )

        m = jax.device_put(
            rng.integers(0, 2, (args.batch, 512, 512), dtype=np.uint8))
        raw = make_train_step(model, 512, donate=False)
        step = LazyCompiled(raw, TRAIN_COMPILER_OPTIONS)
        key = jax.random.PRNGKey(0)
        state, loss, score = step(state, key, x, m)
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, loss, score = step(state, jax.random.fold_in(key, i), x, m)
        _ = float(loss)
        dt = time.perf_counter() - t0

    pps = args.iters * args.batch / dt
    print(json.dumps({
        "mode": args.mode, "fpn_pallas_gn": use_pallas,
        "batch": args.batch, "ms_per_step": round(1e3 * dt / args.iters, 2),
        "patches_per_s": round(pps, 1),
    }))


if __name__ == "__main__":
    main()
