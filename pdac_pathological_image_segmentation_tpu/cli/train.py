"""Training CLI — same interface as the reference launcher
(``train_main.py:15-19``): ``--config <yaml> --save_path <dir>``.

Unlike the reference there is no ``mp.spawn`` fan-out
(``train_main.py:103-110``): a single process drives all local TPU chips
through the mesh, and multi-host pods run one of these per host (the runtime
provides rendezvous — no ``tcp://`` port key needed).
"""

from __future__ import annotations

import argparse

from pdac_pathological_image_segmentation_tpu.config import load_config
from pdac_pathological_image_segmentation_tpu.data.discovery import discover_split
from pdac_pathological_image_segmentation_tpu.data.loader import PatchDataset
from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
    initialize_distributed,
)
from pdac_pathological_image_segmentation_tpu.train.loop import Trainer


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="pathology_project")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--save_path", required=True)
    args = parser.parse_args(argv)

    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    initialize_distributed()
    cfg = load_config(args.config)

    if cfg.extras.get("debug_nans"):
        # SURVEY.md §5 sanitizer equivalent: trap NaNs at the op that
        # produced them (re-runs the offending op un-jitted)
        import jax

        jax.config.update("jax_debug_nans", True)

    train_imgs, train_masks = discover_split(cfg.train_path)
    val_imgs, val_masks = discover_split(cfg.val_path)
    train_set = PatchDataset(train_imgs, train_masks, cfg)
    val_set = PatchDataset(val_imgs, val_masks, cfg)

    trainer = Trainer(cfg, args.save_path, train_set, val_set)
    return trainer.train()


if __name__ == "__main__":
    main()
