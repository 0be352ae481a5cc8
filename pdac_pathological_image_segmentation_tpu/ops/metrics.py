"""Per-sample segmentation metrics from confusion counts.

The reference reports a single number — mean hard Dice over the test set
(``/root/reference/test.py:145-150,182``).  Pathology evaluations
normally want more (IoU/Jaccard, precision, recall/sensitivity,
specificity, pixel accuracy) and want them *per patch* so outliers can
be inspected.  This module computes all of them from one pass of
confusion counts, inside the eval jit:

* :func:`per_sample_confusion` — (N, C, 4) ``[tp, fp, fn, tn]`` per
  sample per class, from hard predictions; lowers to a handful of
  batched reductions (no host round-trips per metric).
* :func:`derive_metrics` — the metric family from those counts, with the
  reference's Dice smoothing (``SMOOTH`` = 1e-6, ``util.py:6-26``) so
  the per-sample Dice here agrees with the reference's formula applied
  per sample.

Binary models (``num_classes == 1``) report the tumor class
(``pred > 0``); multi-class models report one-vs-rest per class.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.ops.dice import SMOOTH

METRIC_NAMES = ("dice", "iou", "precision", "recall", "specificity",
                "accuracy")


def per_sample_confusion(preds: jax.Array, masks: jax.Array,
                         valid: Optional[jax.Array] = None,
                         num_classes: int = 1) -> jax.Array:
    """Confusion counts per sample and class.

    ``preds``/``masks``: (N, H, W) hard labels (any numeric dtype).
    Returns float32 (N, C, 4) = [tp, fp, fn, tn]; C == 1 for binary
    (class = tumor, ``> 0``), else one-vs-rest over ``num_classes``.
    Padded samples (``valid == 0``) get all-zero counts.
    """
    if num_classes <= 1:
        p = (preds > 0)[..., None]  # N,H,W,1
        m = (masks > 0)[..., None]
    else:
        cls = jnp.arange(num_classes)
        p = preds.astype(jnp.int32)[..., None] == cls  # N,H,W,C
        m = masks.astype(jnp.int32)[..., None] == cls
    axes = (1, 2)
    f32 = jnp.float32
    tp = jnp.sum((p & m).astype(f32), axis=axes)
    fp = jnp.sum((p & ~m).astype(f32), axis=axes)
    fn = jnp.sum((~p & m).astype(f32), axis=axes)
    tn = jnp.sum((~p & ~m).astype(f32), axis=axes)
    counts = jnp.stack([tp, fp, fn, tn], axis=-1)  # N,C,4
    if valid is not None:
        counts = counts * valid.astype(f32)[:, None, None]
    return counts


def derive_metrics(counts: jax.Array | "object",
                   smooth: float = SMOOTH) -> Dict[str, jax.Array]:
    """Metric family from ``[..., 4]`` = [tp, fp, fn, tn] counts.

    Works on per-sample (N, C, 4) arrays and on aggregated (C, 4) totals
    (micro averaging); NumPy arrays work too.  Every ratio uses the
    reference's additive smoothing so empty-mask/empty-pred samples give
    1.0 rather than NaN (matching ``dice_score``'s behavior on empty
    pairs, ``util.py:22-26``).
    """
    tp, fp, fn, tn = (counts[..., i] for i in range(4))
    return {
        "dice": (2 * tp + smooth) / (2 * tp + fp + fn + smooth),
        "iou": (tp + smooth) / (tp + fp + fn + smooth),
        "precision": (tp + smooth) / (tp + fp + smooth),
        "recall": (tp + smooth) / (tp + fn + smooth),
        "specificity": (tn + smooth) / (tn + fp + smooth),
        "accuracy": (tp + tn + smooth) / (tp + fp + fn + tn + smooth),
    }
