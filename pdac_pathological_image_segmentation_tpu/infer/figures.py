"""Per-sample original/label/prediction figure triptychs.

Reference ``test.py:128-178``: denormalize the input, render three panels
("original", "label", "predicted") with the ``inferno`` colormap for the
mask panels, save as ``figure_{N}.png``.  matplotlib work happens on host
after a single device→host fetch per batch (the reference's per-sample
``.cpu()`` calls sync per panel).
"""

from __future__ import annotations

import os

import numpy as np


def save_triptych(
    figure_path: str,
    index: int,
    image01: np.ndarray,  # H,W,3 float in [0,1] (already denormalized)
    label: np.ndarray,  # H,W
    pred: np.ndarray,  # H,W
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    matplotlib.rcParams["image.cmap"] = "inferno"  # reference test.py:134

    fig = plt.figure()
    ax = fig.add_subplot(1, 3, 1)
    ax.set_title("original")
    ax.imshow(np.clip(image01, 0, 1))
    ax.set_xticks([]), ax.set_yticks([])

    ax = fig.add_subplot(1, 3, 2)
    ax.set_title("label")
    ax.imshow(label)
    ax.set_xticks([]), ax.set_yticks([])

    ax = fig.add_subplot(1, 3, 3)
    ax.set_title("predicted")
    ax.imshow(pred)
    ax.set_xticks([]), ax.set_yticks([])

    fig.tight_layout()
    out = os.path.join(figure_path, f"figure_{index}.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out
