#!/usr/bin/env python
"""A/B the int8 quantized serving step under per-compile XLA options.

Round-3 companion to ``trial_serving_options.py``: the int8 path's
round-2 number (5,542 patches/s) was tuned under the OLD serving options
(45 MiB scoped vmem, default fusion cost model); the bundle-aware cost
model that moved the bf16 optimum may move the int8 one too.  Run
serially — one process owns the TPU.

Examples:
  python scripts/trial_int8_options.py \
      --opt xla_tpu_scoped_vmem_limit_kib=46080
  python scripts/trial_int8_options.py --batch 384 --depth 16 \
      --opt xla_tpu_scoped_vmem_limit_kib=65536 \
      --opt xla_tpu_use_bundle_aware_cost_model_for_fusions=true
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--iters", type=int, default=48)
    p.add_argument("--opt", action="append", default=[],
                   help="compiler options, key=value")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.infer.quantized import (
        make_quantized_infer_step,
        quantize_model,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )
    from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
        compile_serving,
    )

    enable_compile_cache()
    opts = dict(kv.split("=", 1) for kv in args.opt)
    cfg = Config(model=args.model, backbone="resnet18", img_size=512,
                 compute_dtype="float32", use_pallas=False)
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed)))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, (args.batch, 512, 512, 3), dtype=np.uint8))
    calib = rng.integers(0, 256, (32, 512, 512, 3), dtype=np.uint8)
    kw = ({"atrous_rates": tuple(cfg.dilations)}
          if args.model == "deeplabv3+" else {})
    bundle, forward = quantize_model(
        args.model, state.params, state.batch_stats, [calib], 512, **kw)
    t0 = time.perf_counter()
    step = compile_serving(
        make_quantized_infer_step(state.params, state.batch_stats,
                                  bundle, 512, forward=forward),
        x, options=opts)
    out = step(x)
    _ = float(out[0, 0, 0])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(0, args.iters, args.depth):
        outs = [step(x) for _ in range(args.depth)]
        _ = float(outs[-1][0, 0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "model": args.model, "opts": args.opt, "batch": args.batch,
        "depth": args.depth, "compile_s": round(compile_s, 1),
        "pps": round(args.iters * args.batch / dt, 1),
        "ms": round(dt / args.iters * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
