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

#: default threshold-sweep resolution: thresholds ``k / SWEEP_BINS`` for
#: ``k = 0..SWEEP_BINS`` (histograms carry ``SWEEP_BINS + 1`` buckets so
#: ``prob == 1.0`` gets its own bucket — see :func:`prob_histograms`)
SWEEP_BINS = 256


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


def prob_histograms(probs: jax.Array, masks: jax.Array,
                    valid: Optional[jax.Array] = None,
                    bins: int = SWEEP_BINS) -> jax.Array:
    """Class-split probability histograms for threshold sweeps.

    ``probs``: (N, H, W) predicted tumor probabilities in [0, 1]
    (the sigmoid the reference thresholds at 0.5, ``test.py:143``);
    ``masks``: (N, H, W) ground truth.  Returns int32 ``(2, bins + 1)`` —
    row 0 counts pixels whose ground truth is negative, row 1 positive,
    bucketed by ``min(floor(prob * bins), bins)``: ``prob == 1.0``
    (float32 sigmoid saturates for logits ≳ 16.6) lands in its own
    bucket ``bins``, so ``prob >= k/bins  ⇔  bucket >= k`` holds exactly
    for **every** ``k = 0..bins``, including the threshold-1.0 row.

    One scatter-add pass over the pixels buys the confusion counts at
    *every* threshold ``k / bins`` at once (see :func:`threshold_sweep`)
    — no per-threshold re-pass over the image, which is the TPU-friendly
    way to sweep operating points.  Counts accumulate in int32 (exact up
    to 2^31 − 1 pixels per bin per batch; float32 would silently lose
    counts past 2^24).

    Padded samples (``valid == 0``) contribute zero weight.
    """
    probs = probs.astype(jnp.float32)
    idx = jnp.clip((probs * bins).astype(jnp.int32), 0, bins)
    pos = (masks > 0).astype(jnp.int32)
    flat = (pos * (bins + 1) + idx).reshape(-1)
    if valid is None:
        w = jnp.ones(flat.shape, jnp.int32)
    else:
        w = jnp.broadcast_to(
            valid.astype(jnp.int32)[:, None, None], probs.shape
        ).reshape(-1)
    hist = jnp.zeros((2 * (bins + 1),), jnp.int32).at[flat].add(w)
    return hist.reshape(2, bins + 1)


def threshold_sweep(hists, smooth: float = SMOOTH) -> Dict[str, "object"]:
    """Metric family at every threshold from class-split histograms.

    ``hists``: ``(2, bins + 1)`` totals from :func:`prob_histograms`
    (accumulated over the whole test set).  Returns a dict of numpy
    arrays of shape ``(bins + 1,)``: ``"threshold"`` (``k / bins`` for
    ``k = 0..bins``, predicted positive iff ``prob >= threshold``) plus
    every :data:`METRIC_NAMES` entry derived from the exact pooled
    confusion counts at that threshold.  Runs host-side — the inputs
    are tiny once the pixel pass is done on device.
    """
    import numpy as np

    hists = np.asarray(hists, np.float64)
    neg, pos = hists[0], hists[1]
    bins = neg.shape[0] - 1
    # suffix sums: predicted positive at threshold k/bins ⇔ bucket >= k
    # (exact for every k incl. k == bins: prob == 1.0 owns bucket `bins`)
    tp = np.cumsum(pos[::-1])[::-1]
    fp = np.cumsum(neg[::-1])[::-1]
    fn = pos.sum() - tp
    tn = neg.sum() - fp
    counts = np.stack([tp, fp, fn, tn], axis=-1)  # (bins+1, 4)
    out = {k: np.asarray(v) for k, v in
           derive_metrics(counts, smooth=smooth).items()}
    out["threshold"] = np.arange(bins + 1, dtype=np.float64) / bins
    return out


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
