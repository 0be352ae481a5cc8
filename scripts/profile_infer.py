#!/usr/bin/env python
"""Profile the flagship tile→mask inference step on the real chip.

Produces the per-op device-time breakdown used to direct kernel work
(ROADMAP #1).  Run serially — only one process may own the TPU.

Usage: python scripts/profile_infer.py [--batch 512] [--variant base|bf16out|batch1024]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    # jax.block_until_ready is a no-op on the axon relay: force completion
    # by fetching one element
    return float(out.ravel()[0])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--model", default="unet")
    p.add_argument("--trace", action="store_true")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--serving", action="store_true",
                   help="bf16 head + serving compiler options "
                        "(utils/compile_options.py) — the bench.py config")
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
    from pdac_pathological_image_segmentation_tpu.utils.profiling import (
        device_op_summary,
        trace,
    )

    enable_compile_cache()
    cfg = Config(model=args.model, backbone="resnet18", img_size=512,
                 compute_dtype="bfloat16")
    if args.serving:
        cfg.extras["head_dtype"] = "bfloat16"
    model = build_model(cfg)
    state = jax.device_put(create_train_state(cfg, model, jax.random.PRNGKey(0)))
    step = make_infer_step(model, cfg.img_size)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, (args.batch, 512, 512, 3), dtype=np.uint8)
    )
    if args.serving:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
            compile_serving,
        )

        fmt = Format(Layout(major_to_minor=(1, 2, 3, 0)),
                     SingleDeviceSharding(jax.devices()[0]))
        # on-device relayout — device_put(..., Format) is unreliable for
        # multi-GB transfers on the relay (see bench.py)
        x = jax.jit(lambda a: a, out_shardings=fmt)(x)
        inner = step
        step = compile_serving(
            jax.jit(lambda s, im: inner(s, im), in_shardings=(None, fmt)),
            state, x,
        )

    t0 = time.perf_counter()
    out = step(state, x)
    fetch(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s; out {out.shape} {out.dtype}")

    # steady state
    n, depth = args.iters, 3
    t0 = time.perf_counter()
    for i in range(0, n, depth):
        outs = [step(state, x) for _ in range(depth)]
        fetch(outs[-1])
    dt = time.perf_counter() - t0
    print(f"batch={args.batch}: {dt / n * 1e3:.1f} ms/step, "
          f"{n * args.batch / dt:.0f} patches/s")

    if args.trace:
        tdir = "/tmp/pdac_profile_infer"
        with trace(tdir):
            for _ in range(3):
                out = step(state, x)
            fetch(out)
        rows = device_op_summary(tdir, top=40)
        total = sum(r[0] for r in rows)
        print(f"\ntop device ops (total listed {total/1e3:.1f} ms over 3 steps):")
        for us, name, long_name in rows:
            print(f"{us/1e3:9.2f} ms  {name}  | {long_name[:110]}")


if __name__ == "__main__":
    main()
