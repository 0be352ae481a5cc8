#!/usr/bin/env python
"""A/B the int8 serving activation storage: bf16 (shipped) vs int8
producer-quantized inter-site tensors (VERDICT r4 item 4).

The round-4 roofline diagnosis: int8 serving is bandwidth-bound (63.9%
of peak HBM BW) because "activations stay bf16" — the MXU time halved
but bytes/patch barely moved.  ``act_storage="int8"`` halves the
encoder's inter-site activation bytes (``infer/quantized._QT``); this
trial measures both modes under the pinned INT8_COMPILER_OPTIONS with
the same depth-16 dispatch pipelining as ``bench.py --mode int8``, plus
an int8-storage run at bs=512 (the freed HBM may admit it where bf16
storage OOMed on in-flight outputs).

Run serially — one process owns the TPU.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def bench_step(step, x, batch: int, n_iters: int = 96, depth: int = 16):
    out = step(x)
    _ = float(out[0, 0, 0])  # compile + completion (relay: fetch)
    t0 = time.perf_counter()
    for i in range(0, n_iters, depth):
        outs = [step(x) for _ in range(depth)]
        _ = float(outs[-1][0, 0, 0])
    dt = time.perf_counter() - t0
    return round(n_iters * batch / dt, 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet")
    p.add_argument("--cells", default="bf16_256,int8_256,int8_512")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from pdac_pathological_image_segmentation_tpu.infer.quantized import (
        make_quantized_infer_step,
        quantize_from_config,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
        INT8_COMPILER_OPTIONS,
        compile_serving,
    )

    cfg = Config(model=args.model, backbone="resnet18", img_size=512,
                 compute_dtype="float32", use_pallas=False)
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed)))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (32, 512, 512, 3), dtype=np.uint8)
    bundle, forward = quantize_from_config(
        cfg, state.params, state.batch_stats, [calib])

    results = {"model": args.model}
    batches = {}
    for cell in args.cells.split(","):
        # cell syntax: <storage>_<bs>[_d<depth>], e.g. int8_512_d8
        parts = cell.split("_")
        depth = 16
        if parts[-1].startswith("d"):
            depth = int(parts.pop()[1:])
        storage, bs = "_".join(parts[:-1]), int(parts[-1])
        if bs not in batches:
            batches[bs] = jax.device_put(
                rng.integers(0, 256, (bs, 512, 512, 3), dtype=np.uint8))
        x = batches[bs]
        try:
            step = compile_serving(
                make_quantized_infer_step(
                    state.params, state.batch_stats, bundle, 512,
                    forward=forward, act_storage=storage),
                x, options=INT8_COMPILER_OPTIONS)
            results[cell] = bench_step(step, x, bs, depth=depth)
        except Exception as e:  # OOM cells report instead of aborting
            results[cell] = f"failed: {type(e).__name__}: {str(e)[:200]}"
        print(cell, results[cell], flush=True)
        del step

    print(json.dumps(results))


if __name__ == "__main__":
    main()
