#!/usr/bin/env python
"""A/B the TRAIN step (fwd+bwd+Adam + fused augmentation) under
per-compile XLA options and config extras.

Train-side sibling of ``trial_serving_options.py`` — the harness behind
the round-3 train-program option sweep (BASELINE.md).  Run serially —
one process owns the TPU.

Examples:
  python scripts/trial_train_options.py \
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
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seconds", type=float, default=25.0)
    p.add_argument("--extra", action="append", default=[],
                   help="config extras, key=value (value parsed as yaml)")
    p.add_argument("--opt", action="append", default=[],
                   help="compiler options, key=value (default: "
                        "TRAIN_COMPILER_OPTIONS)")
    args = p.parse_args()

    import yaml

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
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
    )

    cfg = Config(model="unet", img_size=512, compute_dtype="bfloat16")
    for kv in args.extra:
        k, v = kv.split("=", 1)
        cfg.extras[k] = yaml.safe_load(v)
    opts = (dict(kv.split("=", 1) for kv in args.opt)
            if args.opt else dict(TRAIN_COMPILER_OPTIONS))

    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed)))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, (args.batch, 512, 512, 3), dtype=np.uint8))
    m = jax.device_put(
        rng.integers(0, 2, (args.batch, 512, 512), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    jitted = make_train_step(model, cfg.img_size, donate=True)
    t0 = time.perf_counter()
    step = jitted.lower(state, key, x, m).compile(compiler_options=opts)
    state, loss, _ = step(state, key, x, m)
    _ = float(loss)
    compile_s = time.perf_counter() - t0

    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        state, loss, _ = step(state, key, x, m)
        if (n + 1) % 4 == 0:  # chained through donation; fetch every 4th
            _ = float(loss)
        n += 1
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "extras": args.extra, "opts": sorted(opts.items()),
        "batch": args.batch, "compile_s": round(compile_s, 1),
        "pps": round(n * args.batch / dt, 1),
        "ms": round(dt / n * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
