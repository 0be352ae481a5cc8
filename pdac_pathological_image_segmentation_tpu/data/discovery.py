"""Dataset path discovery: the reference's filesystem contract.

A directory of ``*.png`` patches where mask files end in ``labelled.png`` and
everything else is an image (QuPath export layout, reference
``train_main.py:46-67``, ``test.py:51-60``; the QuPath exporter pairs
``<name>.png`` with ``<name>-labelled.png``, ``QuPath_WSI_to_Patch.groovy``).
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple


def discover_split(root: str) -> Tuple[List[str], List[str]]:
    """Return (image_paths, mask_paths), both sorted, suffix-split exactly
    like the reference (``labelled.png`` suffix → mask, any other ``.png`` →
    image)."""
    if not os.path.isdir(root):
        raise FileNotFoundError(f"dataset directory does not exist: {root}")
    paths = sorted(glob.glob(os.path.join(root, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no .png patches found in {root}")
    img_paths: List[str] = []
    mask_paths: List[str] = []
    for p in paths:
        if p.endswith("labelled.png"):
            mask_paths.append(p)
        elif p.endswith(".png"):
            img_paths.append(p)
    if len(img_paths) != len(mask_paths):
        raise ValueError(
            f"unpaired patches in {root}: {len(img_paths)} images vs "
            f"{len(mask_paths)} masks (mask files must end in 'labelled.png')"
        )
    return img_paths, mask_paths
