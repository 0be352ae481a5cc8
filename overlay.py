#!/usr/bin/env python
"""Entry point for WSI overlay visualization (replaces the reference's
missing ``visualize/predict_overlay.ipynb``)."""
from pdac_pathological_image_segmentation_tpu.cli.overlay import main

if __name__ == "__main__":
    main()
