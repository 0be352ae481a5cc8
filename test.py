#!/usr/bin/env python
"""Entry point mirroring the reference's ``test.py`` CLI."""
from pdac_pathological_image_segmentation_tpu.cli.test import main

if __name__ == "__main__":
    main()
