"""Evaluation CLI — same interface as the reference's ``test.py:22-26``:
``--config <yaml> --save_path <dir> --pth_path <checkpoint>``.
Emits mean Test Score / Test Loss and per-sample triptych figures into
``<save_path>/figure`` (reference ``test.py:34-35,152-178``)."""

from __future__ import annotations

import argparse
import os

from pdac_pathological_image_segmentation_tpu.config import load_config
from pdac_pathological_image_segmentation_tpu.data.discovery import discover_split
from pdac_pathological_image_segmentation_tpu.data.loader import PatchDataset
from pdac_pathological_image_segmentation_tpu.infer.evaluate import Evaluator


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="pathology_project")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--pth_path", required=True)
    parser.add_argument("--max_figures", type=int, default=None,
                        help="cap figure output (reference renders all)")
    parser.add_argument("--metrics_csv", default="auto",
                        help="per-sample dice/iou/precision/recall/"
                        "specificity/accuracy CSV (+macro/micro summary "
                        "rows); 'auto' = <save_path>/metrics.csv, 'none' "
                        "disables (the reference prints only the mean "
                        "Dice, test.py:182)")
    parser.add_argument("--sweep_csv", default="auto",
                        help="operating-point calibration CSV (binary "
                        "models): pooled metrics at all 257 thresholds "
                        "k/256, plus a printed Dice-optimal threshold; "
                        "'auto' = <save_path>/threshold_sweep.csv, 'none' "
                        "disables (the reference hard-codes 0.5, "
                        "test.py:143)")
    args = parser.parse_args(argv)

    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    cfg = load_config(args.config)
    test_imgs, test_masks = discover_split(cfg.test_path)
    test_set = PatchDataset(test_imgs, test_masks, cfg)

    evaluator = Evaluator(cfg, args.pth_path)
    figure_path = os.path.join(args.save_path, "figure")
    metrics_csv = args.metrics_csv
    if metrics_csv == "auto":
        metrics_csv = os.path.join(args.save_path, "metrics.csv")
    elif metrics_csv == "none":
        metrics_csv = None
    sweep_csv = args.sweep_csv
    if sweep_csv == "auto":
        sweep_csv = os.path.join(args.save_path, "threshold_sweep.csv")
    elif sweep_csv == "none":
        sweep_csv = None
    result = evaluator.run(test_set, figure_path=figure_path,
                           max_figures=args.max_figures,
                           metrics_csv=metrics_csv,
                           sweep_csv=sweep_csv)
    if "best_threshold" in result:
        print(f"Best threshold: {result['best_threshold']:.6f} "
              f"(dice {result['best_dice']:.6f}; "
              f"dice@0.5 {result['dice_at_0.5']:.6f})")
    return result


if __name__ == "__main__":
    main()
