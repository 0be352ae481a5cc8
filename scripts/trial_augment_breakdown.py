#!/usr/bin/env python
"""Break down the fused train-time augmentation cost on the real chip.

The round-3 roofline (BASELINE.md) shows the fused augmentation at
25.9 ms of the 225 ms bs=256/512² train step — yet its HBM traffic
(~0.9 GB total) prices at ~1.1 ms on v5e.  Before attempting any
schedule-level overlap (VERDICT r4 item 1), measure WHERE those
milliseconds actually go:

  scalars   draw_augment_scalars alone (XLA threefry + per-sample draws)
  kernel    fused_augment_planar alone (planar u8 in, scalars precomputed)
  fused     fused_train_transform (transposes + scalars + kernel)
  xla       train_transform (the non-Pallas chain) for reference

Run serially — one process owns the TPU.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, fetch, seconds: float = 10.0, depth: int = 8):
    """Median-of-dispatch-pipelined wall clock; ``fetch(result)`` forces
    completion (the axon relay ignores block_until_ready)."""
    out = fn()
    fetch(out)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        outs = [fn() for _ in range(depth)]
        fetch(outs[-1])
        n += depth
    dt = time.perf_counter() - t0
    return dt / n * 1e3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--stages", default="scalars,kernel,fused,xla")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        train_transform,
    )
    from pdac_pathological_image_segmentation_tpu.ops.pallas.fused_augment import (
        draw_augment_scalars,
        fused_augment_planar,
        fused_train_transform,
    )

    n, s = args.batch, args.size
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (n, s, s, 3), dtype=np.uint8))
    xp = jax.device_put(np.ascontiguousarray(
        rng.integers(0, 256, (n, 3, s, s), dtype=np.uint8)))
    m = jax.device_put(rng.integers(0, 2, (n, s, s), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    results = {}
    stages = args.stages.split(",")

    if "scalars" in stages:
        f = jax.jit(lambda k: draw_augment_scalars(k, n))
        results["scalars_ms"] = round(timeit(
            lambda: f(key), lambda o: float(o[0][0, 0]), args.seconds), 3)

    if "kernel" in stages:
        from pdac_pathological_image_segmentation_tpu.ops.augment import (
            geom_bits,
            jitter_slot_params,
        )

        facs, ints = jax.jit(lambda k: draw_augment_scalars(k, n))(key)
        a_mats, gammas = jax.jit(jitter_slot_params)(facs, ints)
        geom = jax.jit(geom_bits)(ints)
        a_mats, gammas, ints, geom = map(
            jax.device_put, (a_mats, gammas, ints, geom))
        results["kernel_ms"] = round(timeit(
            lambda: fused_augment_planar(xp, m, a_mats, gammas, ints, geom),
            lambda o: float(o[0][0, 0, 0, 0]), args.seconds), 3)

    if "fused" in stages:
        f = jax.jit(lambda k, im, ms: fused_train_transform(k, im, ms))
        results["fused_ms"] = round(timeit(
            lambda: f(key, x, m), lambda o: float(o[0][0, 0, 0, 0]),
            args.seconds), 3)

    if "xla" in stages:
        f = jax.jit(lambda k, im, ms: train_transform(
            k, im, ms, img_size=s, dtype=jnp.bfloat16))
        results["xla_ms"] = round(timeit(
            lambda: f(key, x, m), lambda o: float(o[0][0, 0, 0, 0]),
            args.seconds), 3)

    print(json.dumps({"batch": n, "size": s, **results}))


if __name__ == "__main__":
    main()
