#!/usr/bin/env python
"""A/B the serving step under config extras + per-compile XLA options.

The round-2 optimization loop that found the +7–9% scoped-vmem win and
measured/rejected the einsum-upconv, planar-augmentation, bs=768 and
fused-stem variants (BASELINE.md "Serving-path optimization log").  Run
serially — one process owns the TPU.

Examples:
  python scripts/trial_serving_options.py \
      --opt xla_tpu_scoped_vmem_limit_kib=49152
  python scripts/trial_serving_options.py --extra layer1_barrier=true \
      --opt xla_tpu_scoped_vmem_limit_kib=49152 --batch 512 --depth 16
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--iters", type=int, default=96)
    p.add_argument("--extra", action="append", default=[],
                   help="config extras, key=value (value parsed as yaml)")
    p.add_argument("--opt", action="append", default=[],
                   help="compiler options, key=value")
    args = p.parse_args()

    import yaml

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.train.steps import (
        make_infer_step,
    )

    cfg = Config(model="unet", backbone="resnet18", img_size=512,
                 compute_dtype="bfloat16")
    cfg.extras["head_dtype"] = "bfloat16"
    for kv in args.extra:
        k, v = kv.split("=", 1)
        cfg.extras[k] = yaml.safe_load(v)
    opts = dict(kv.split("=", 1) for kv in args.opt)

    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed)))
    step = make_infer_step(model, cfg.img_size)
    rng = np.random.default_rng(0)
    fmt = Format(Layout(major_to_minor=(1, 2, 3, 0)),
                 SingleDeviceSharding(jax.devices()[0]))
    x = jax.jit(lambda a: a, out_shardings=fmt)(jax.device_put(
        rng.integers(0, 256, (args.batch, 512, 512, 3), dtype=np.uint8)))
    jitted = jax.jit(lambda s, im: step(s, im), in_shardings=(None, fmt))
    t0 = time.perf_counter()
    step_l = (jitted.lower(state, x).compile(compiler_options=opts)
              if opts else jitted)
    out = step_l(state, x)
    _ = float(out[0, 0, 0])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(0, args.iters, args.depth):
        outs = [step_l(state, x) for _ in range(args.depth)]
        _ = float(outs[-1][0, 0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "extras": args.extra, "opts": args.opt, "batch": args.batch,
        "depth": args.depth, "compile_s": round(compile_s, 1),
        "pps": round(args.iters * args.batch / dt, 1),
        "ms": round(dt / args.iters * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
