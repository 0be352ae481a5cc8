#!/usr/bin/env python
"""Host PNG-decode throughput: native C++ loader vs PIL.

Measures the data-pipeline decode rate that feeds the device (the
reference's DataLoader bottleneck, reference ``dataset.py:24-30``).
Generates H&E-textured 512x512 tiles (``data/synthetic.py`` — realistic
filter mix from PIL's encoder), then times:

  * native ``decode_batch`` at 1 thread and at ``os.cpu_count()`` threads
  * PIL ``Image.open``/``convert("RGB")`` loop (the fallback path)

Prints one JSON line.  CPU-only — safe to run while no TPU work is live
(but this VM has 1 core: multi-thread numbers only scale on real hosts).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64, help="tiles per pass")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--passes", type=int, default=3, help="best-of passes")
    args = p.parse_args()

    import numpy as np

    from pdac_pathological_image_segmentation_tpu.data import native_loader
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )

    assert native_loader.native_available(), "native loader failed to build"

    with tempfile.TemporaryDirectory() as d:
        generate_synthetic_patches(d, n=args.n, size=args.size, seed=0)
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.startswith("patch_") and f.endswith(".png")
        )
        sizes = [os.path.getsize(pth) for pth in paths]

        def bench(fn) -> float:
            best = float("inf")
            for _ in range(args.passes):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return len(paths) / best

        out = np.empty((len(paths), args.size, args.size, 3), np.uint8)
        native_1 = bench(lambda: native_loader.decode_batch(
            paths, args.size, args.size, 3, threads=1, out=out))
        nthreads = os.cpu_count() or 1
        native_n = bench(lambda: native_loader.decode_batch(
            paths, args.size, args.size, 3, threads=nthreads, out=out))

        from PIL import Image

        def pil_pass():
            for i, pth in enumerate(paths):
                out[i] = np.asarray(Image.open(pth).convert("RGB"))

        pil = bench(pil_pass)

    print(json.dumps({
        "tiles": len(paths), "size": args.size,
        "mean_png_kb": round(sum(sizes) / len(sizes) / 1024, 1),
        "native_1t_img_s": round(native_1, 1),
        f"native_{nthreads}t_img_s": round(native_n, 1),
        "pil_img_s": round(pil, 1),
        "speedup_vs_pil_1t": round(native_1 / pil, 2),
    }))

    _bench_jpeg_slide(args)


def _bench_jpeg_slide(args) -> None:
    """JPEG-tile slide decode rate: native/jpegdec.cpp via the tiffreader
    thread pool vs the per-tile PIL splice path it replaced."""
    import numpy as np
    from PIL import Image

    from pdac_pathological_image_segmentation_tpu.data.tiffslide import (
        TiffSlide,
    )

    side = 2048
    yy, xx = np.mgrid[0:side, 0:side]
    img = np.stack([
        200 + 40 * np.sin(xx / 31.0), 120 + 60 * np.cos(yy / 23.0),
        180 + 50 * np.sin((xx + yy) / 41.0),
    ], -1).clip(0, 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.tiff")
        Image.fromarray(img).save(path, compression="jpeg", quality=90)
        with TiffSlide(path) as s:
            info = s.level_info[0]

            def native_pass():
                s.read_region(0, 0, 0, side, side)

            def pil_pass():
                for ty in range(info["tiles_y"]):
                    for tx in range(info["tiles_x"]):
                        s._decode_jpeg_tile(0, tx, ty)

            def best(fn):
                b = float("inf")
                for _ in range(args.passes):
                    t0 = time.perf_counter()
                    fn()
                    b = min(b, time.perf_counter() - t0)
                return side * side / b / 1e6

            native = best(native_pass)
            pil = best(pil_pass)
    print(json.dumps({
        "jpeg_slide_px": side,
        "native_mp_s": round(native, 1),
        "pil_mp_s": round(pil, 1),
        "native_vs_pil": round(native / pil, 2),
    }))


if __name__ == "__main__":
    main()
