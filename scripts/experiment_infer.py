#!/usr/bin/env python
"""Throughput experiments for the flagship infer step (run serially on TPU).

Variants:
  depth   — deeper dispatch pipelining (relay dispatch-gap check)
  batch   — larger device batch
  layout  — feed the uint8 batch in the stem conv's preferred input layout
            (kills the full-image relayout copy XLA otherwise inserts)
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    return float(out.ravel()[0])


def bench(step, state, x, iters=48, depth=3):
    out = step(state, x)
    fetch(out)
    t0 = time.perf_counter()
    for i in range(0, iters, depth):
        outs = [step(state, x) for _ in range(depth)]
        fetch(outs[-1])
    dt = time.perf_counter() - t0
    b = x.shape[0]
    return dt / iters * 1e3, iters * b / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="depth,batch,layout")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.train.steps import (
        make_infer_step,
    )
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = Config(model="unet", img_size=512, compute_dtype="bfloat16")
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)))
    step = make_infer_step(model, 512)
    rng = np.random.default_rng(0)
    variants = args.variants.split(",")

    if "depth" in variants:
        x = jax.device_put(
            rng.integers(0, 256, (512, 512, 512, 3), dtype=np.uint8))
        for depth in (3, 6):
            ms, pps = bench(step, state, x, depth=depth)
            print(f"bs=512 depth={depth}: {ms:.1f} ms/step, {pps:.0f} p/s",
                  flush=True)

    if "batch" in variants:
        for b in (768,):
            xb = jax.device_put(
                rng.integers(0, 256, (b, 512, 512, 3), dtype=np.uint8))
            try:
                ms, pps = bench(step, state, xb, iters=24, depth=3)
                print(f"bs={b} depth=3: {ms:.1f} ms/step, {pps:.0f} p/s",
                      flush=True)
            except Exception as e:
                print(f"bs={b}: FAILED {type(e).__name__}: {e}", flush=True)
            del xb

    if "layout" in variants:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        # stem conv input wants minor-to-major {0,3,2,1} (N minormost);
        # Layout takes MAJOR-to-minor → (1,2,3,0)
        fmt = Format(Layout(major_to_minor=(1, 2, 3, 0)),
                     SingleDeviceSharding(jax.devices()[0]))
        try:
            xl = jax.device_put(
                rng.integers(0, 256, (512, 512, 512, 3), dtype=np.uint8),
                fmt)
            step_l = jax.jit(
                lambda s, im: step(s, im),
                in_shardings=(None, fmt),
            )
            ms, pps = bench(step_l, state, xl, depth=6)
            print(f"bs=512 layout-fed depth=6: {ms:.1f} ms/step, "
                  f"{pps:.0f} p/s", flush=True)
        except Exception as e:
            print(f"layout variant FAILED: {type(e).__name__}: {e}",
                  flush=True)

    if "bf16head" in variants:
        cfg2 = Config(model="unet", img_size=512, compute_dtype="bfloat16")
        cfg2.extras["head_dtype"] = "bfloat16"
        model2 = build_model(cfg2)
        step2 = make_infer_step(model2, 512)
        x = jax.device_put(
            rng.integers(0, 256, (512, 512, 512, 3), dtype=np.uint8))
        out = step2(state, x)
        print("bf16head out dtype:", out.dtype, flush=True)
        ms, pps = bench(step2, state, x, depth=6)
        print(f"bs=512 bf16-head depth=6: {ms:.1f} ms/step, {pps:.0f} p/s",
              flush=True)

    if "fusedstem" in variants:
        # the default make_infer_step picks the Pallas fused stem on TPU
        x = jax.device_put(
            rng.integers(0, 256, (512, 512, 512, 3), dtype=np.uint8))
        t0 = time.perf_counter()
        out = step(state, x)
        fetch(out)
        print(f"fused-stem compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        ms, pps = bench(step, state, x, depth=6)
        print(f"bs=512 fused-stem depth=6: {ms:.1f} ms/step, {pps:.0f} p/s",
              flush=True)

    if "batch1024" in variants:
        xb = jax.device_put(
            rng.integers(0, 256, (1024, 512, 512, 3), dtype=np.uint8))
        try:
            ms, pps = bench(step, state, xb, iters=24, depth=3)
            print(f"bs=1024 depth=3: {ms:.1f} ms/step, {pps:.0f} p/s",
                  flush=True)
        except Exception as e:
            print(f"bs=1024: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
