#!/usr/bin/env python
"""Profile the training step (device-side augmentation + fwd/bwd + Adam)."""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--trace", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--serving_opts", action="store_true",
                   help="apply utils/compile_options.py compiler options")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.train.steps import (
        make_train_step,
    )
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )
    from pdac_pathological_image_segmentation_tpu.utils.profiling import (
        device_op_summary,
        trace,
    )

    enable_compile_cache()
    cfg = Config(model="unet", img_size=512, compute_dtype="bfloat16")
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)))
    step = make_train_step(model, 512, donate=True, remat=args.remat)

    rng = np.random.default_rng(0)
    b = args.batch
    x = jax.device_put(rng.integers(0, 256, (b, 512, 512, 3), dtype=np.uint8))
    m = jax.device_put(rng.integers(0, 2, (b, 512, 512), dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    if args.serving_opts:
        from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
            TRAIN_COMPILER_OPTIONS,
            compile_serving,
        )

        step = compile_serving(step, state, key, x, m,
                               options=TRAIN_COMPILER_OPTIONS)

    t0 = time.perf_counter()
    state, loss, score = step(state, key, x, m)
    _ = float(loss)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"(remat={args.remat})", flush=True)

    n = args.iters
    t0 = time.perf_counter()
    for i in range(n):
        state, loss, score = step(state, key, x, m)
        if (i + 1) % 4 == 0:  # pipeline: steps chain on device via the
            _ = float(loss)   # donated state; fetch only every 4th loss
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(f"train batch={b}: {dt / n * 1e3:.1f} ms/step, "
          f"{n * b / dt:.0f} patches/s", flush=True)

    if args.trace:
        tdir = "/tmp/pdac_profile_train"
        with trace(tdir):
            for _ in range(2):
                state, loss, score = step(state, key, x, m)
            _ = float(loss)
        rows = device_op_summary(tdir, top=35)
        total = sum(r[0] for r in rows)
        print(f"\ntop device ops ({total/1e3:.1f} ms over 2 steps):")
        for us, name, long_name in rows:
            print(f"{us/1e3:9.2f} ms  {name}  | {long_name[:120]}")


if __name__ == "__main__":
    main()
