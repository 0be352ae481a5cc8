"""Serving daemon CLI — HTTP segmentation from a portable artifact.

An extension beyond the reference (which has no serving story — its
deployment path is unpickling ``best.pth`` into the training codebase,
``/root/reference/test.py:94-135``):

    python -m pdac_pathological_image_segmentation_tpu.cli.serve \\
        --artifact model.pdacsrv --port 8000

then

    curl -s -X POST --data-binary @tile.png -H 'Content-Type: image/png' \\
        http://127.0.0.1:8000/v1/segment -o mask.png -D -

Concurrent requests are micro-batched into static bucket-sized device
dispatches (``infer/server.py``); ``GET /v1/stats`` reports occupancy and
latency percentiles.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="pathology_project")
    parser.add_argument("--artifact", required=True,
                        help=".pdacsrv file from cli.export")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--buckets", default="1,8,32",
                        help="comma-separated batch buckets "
                        "(one XLA program each, AOT-compiled at startup)")
    parser.add_argument("--max_wait_ms", type=float, default=5.0,
                        help="micro-batching window")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="probability threshold for X-Tumor-Fraction")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip startup compile+run of each bucket")
    parser.add_argument("--verbose", action="store_true",
                        help="log each request")
    args = parser.parse_args(argv)

    from pdac_pathological_image_segmentation_tpu.infer.export import (
        load_serving_artifact,
    )
    from pdac_pathological_image_segmentation_tpu.infer.server import (
        SegmentationServer,
    )
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    artifact = load_serving_artifact(args.artifact)
    buckets = tuple(int(b) for b in args.buckets.split(",") if b.strip())
    server = SegmentationServer(
        (args.host, args.port), artifact,
        buckets=buckets, max_wait_ms=args.max_wait_ms,
        threshold=args.threshold, verbose=args.verbose)
    server.start(warmup=not args.no_warmup)
    meta = artifact.meta
    print(f"serving {meta.get('model')}/{meta.get('backbone')}"
          f"{' int8' if meta.get('int8') else ''} "
          f"(tile {artifact.tile}) on http://{args.host}:{server.server_address[1]} "
          f"— buckets {list(buckets)}, window {args.max_wait_ms} ms",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
