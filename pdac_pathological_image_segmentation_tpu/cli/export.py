"""Export CLI — serialize the serving step to a portable artifact.

An extension beyond the reference (whose deployment story is unpickling
``best.pth`` into the Python model class, ``/root/reference/test.py:94-135``):

    python -m pdac_pathological_image_segmentation_tpu.cli.export \\
        --config cfg.yaml --pth_path out/pth --out model.pdacsrv

writes ONE self-contained StableHLO artifact (weights baked in, symbolic
batch dimension, lowered for tpu+cpu) that serves with no model code:

    from pdac_pathological_image_segmentation_tpu.infer.export import \\
        load_serving_artifact
    infer = load_serving_artifact("model.pdacsrv")
    probs = infer(images_u8)          # [b, tile, tile, 3] -> [b, tile, tile]

``--int8`` exports the quantized MXU serving program instead (calibrated
on patches from ``cfg.test_path`` or ``--calib_path``).
"""

from __future__ import annotations

import argparse

from pdac_pathological_image_segmentation_tpu.config import load_config


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="pathology_project")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--pth_path", required=True,
                        help="Orbax pth dir / latest / best, or a reference "
                        ".pth file (converted on the fly)")
    parser.add_argument("--out", required=True,
                        help="output artifact path (suggest .pdacsrv)")
    parser.add_argument("--tile", type=int, default=None,
                        help="tile size (default: cfg.img_size)")
    parser.add_argument("--batch", type=int, default=None,
                        help="pin the batch size; default exports a "
                        "symbolic batch dimension (any size at load)")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering platforms")
    parser.add_argument("--int8", action="store_true",
                        help="export the int8 quantized serving program")
    parser.add_argument("--calib_path", type=str, default=None,
                        help="patch dir for int8 calibration "
                        "(default: cfg.test_path)")
    args = parser.parse_args(argv)

    from pdac_pathological_image_segmentation_tpu.infer.evaluate import (
        load_serving_state,
    )
    from pdac_pathological_image_segmentation_tpu.infer.export import (
        calib_batches_from_dir,
        export_serving_artifact,
    )
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = load_config(args.config)
    _, state, _, _ = load_serving_state(cfg, args.pth_path)

    tile = args.tile or cfg.img_size
    calib = None
    if args.int8:
        calib = calib_batches_from_dir(args.calib_path or cfg.test_path,
                                       tile)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p)
    size = export_serving_artifact(
        cfg, state, args.out, tile=tile, batch=args.batch,
        platforms=platforms, int8=args.int8, calib_batches=calib,
    )
    batch = args.batch if args.batch is not None else "any"
    print(f"serving artifact written to {args.out} "
          f"({size / 1e6:.1f} MB, tile {tile}, batch {batch}, "
          f"platforms {','.join(platforms)}"
          f"{', int8' if args.int8 else ''})")
    return {"path": args.out, "bytes": size}


if __name__ == "__main__":
    main()
