#!/usr/bin/env python
"""Entry point mirroring the reference's ``train_main.py`` CLI."""
from pdac_pathological_image_segmentation_tpu.cli.train import main

if __name__ == "__main__":
    main()
