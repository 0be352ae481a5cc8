#!/usr/bin/env python
"""Serving-daemon load-test sweep — the harness behind BASELINE.md's
serving table (VERDICT r4 item 3).

Sweeps concurrency × micro-batching config against an in-process
:class:`SegmentationServer` on the local chip and prints one JSON line
per cell.  The A/B that matters: ``buckets=(1,)`` with ``max_wait_ms=0``
is single-request dispatch (one bs=1 XLA program per request — the
no-micro-batching strawman); the default ``(1, 8, 32)``/5 ms coalesces
concurrent clients into shared MXU work.

Run serially — one process owns the TPU.

Examples:
  python scripts/loadtest_serve.py                      # full sweep
  python scripts/loadtest_serve.py --concurrency 32 \
      --buckets 1,8,32 --max_wait_ms 5                  # one cell
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="unet")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--requests", type=int, default=640)
    p.add_argument("--concurrency", type=int, default=None,
                   help="run a single cell at this concurrency")
    p.add_argument("--buckets", default=None,
                   help="comma-separated buckets for the single cell")
    p.add_argument("--max_wait_ms", type=float, default=None)
    p.add_argument("--u8", action="store_true",
                   help="request uint8 probability responses "
                   "(Accept: application/octet-stream;repr=u8 — 4x "
                   "smaller; the response-bytes lever on thin hosts)")
    args = p.parse_args()

    import jax

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import os
    import tempfile

    from pdac_pathological_image_segmentation_tpu.infer.export import (
        export_serving_artifact,
        load_serving_artifact,
    )
    from pdac_pathological_image_segmentation_tpu.infer.loadtest import (
        serve_and_loadtest,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )

    cfg = Config(model=args.model, backbone="resnet18",
                 img_size=args.tile, compute_dtype="bfloat16")
    cfg.extras["head_dtype"] = "bfloat16"
    model = build_model(cfg)
    state = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed)))
    platform = jax.devices()[0].platform
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "sweep.pdacsrv")
        export_serving_artifact(cfg, state, path, platforms=(platform,))
        del model, state
        artifact = load_serving_artifact(path)

    if args.concurrency is not None:
        buckets = tuple(
            int(b) for b in (args.buckets or "1,8,32").split(","))
        wait = 5.0 if args.max_wait_ms is None else args.max_wait_ms
        cells = [(args.concurrency, buckets, wait)]
    else:
        micro = ((1, 8, 32), 5.0)
        single = ((1,), 0.0)
        cells = [
            # micro-batching vs single-dispatch A/B across concurrency
            (1, *micro), (8, *micro), (32, *micro),
            (1, *single), (8, *single), (32, *single),
            # max_wait tuning at the high-concurrency point
            (32, (1, 8, 32), 0.0),
            (32, (1, 8, 32), 2.0),
            (32, (1, 8, 32), 15.0),
        ]

    accept = ("application/octet-stream;repr=u8" if args.u8
              else "application/octet-stream")
    for conc, buckets, wait in cells:
        res = serve_and_loadtest(
            artifact, buckets=buckets, max_wait_ms=wait,
            concurrency=conc, n_requests=args.requests, accept=accept)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
