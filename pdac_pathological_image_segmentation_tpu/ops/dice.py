"""Dice loss and score.

Matches the reference's ``util.py:6-26`` semantics exactly:

* ``dice_loss``: sigmoid *inside* the loss, flatten the whole batch into one
  vector (global dice, not per-sample mean), soft intersection/union with
  ``smooth=1e-6``, return ``1 - dice``  (reference ``DiceLoss.forward``,
  ``util.py:10-19``).
* ``dice_score``: hard dice on already-thresholded predictions, same smooth
  (reference ``util.py:22-26``).

All reductions happen on device; under a data-parallel mesh the ``jnp.sum``
over a batch-sharded array lowers to a local reduction + ``psum`` over ICI,
so every chip sees the *global* batch dice (strictly better than the
reference, which never all-reduces metrics — SURVEY.md §5).

Implemented in plain XLA: these are bandwidth-bound single-pass reductions
that XLA fuses into one kernel (sigmoid + multiply + three sums share the
input read) — profiling shows them fully fused into adjacent passes, so no
Pallas variant is warranted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-6


def dice_loss(logits: jax.Array, targets: jax.Array, smooth: float = SMOOTH) -> jax.Array:
    """Soft dice loss with sigmoid applied to ``logits``.

    Shapes broadcast-agnostic: both args are flattened (reference
    ``util.py:12-13``).  Computed in float32 regardless of input dtype so the
    global reduction is stable in bfloat16 training.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(probs * targets)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs) + jnp.sum(targets) + smooth)
    return 1.0 - dice


def dice_score(pred: jax.Array, target: jax.Array, smooth: float = SMOOTH) -> jax.Array:
    """Hard dice on thresholded predictions (reference ``util.py:22-26``)."""
    pred = pred.astype(jnp.float32).reshape(-1)
    target = target.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target)
    return (2.0 * intersection + smooth) / (union + smooth)


def per_sample_dice_score(
    pred: jax.Array, target: jax.Array, smooth: float = SMOOTH
) -> jax.Array:
    """Per-sample hard dice (leading axis is batch). Framework extension used
    by the WSI sweep; the reference only computes batch-global dice."""
    pred = pred.astype(jnp.float32).reshape(pred.shape[0], -1)
    target = target.astype(jnp.float32).reshape(target.shape[0], -1)
    intersection = jnp.sum(pred * target, axis=1)
    union = jnp.sum(pred, axis=1) + jnp.sum(target, axis=1)
    return (2.0 * intersection + smooth) / (union + smooth)


def weighted_dice_ce_loss(
    logits: jax.Array,
    targets: jax.Array,
    dice_weight: float = 0.5,
    ce_weight: float = 0.5,
    class_weights: jax.Array | None = None,
    smooth: float = SMOOTH,
) -> jax.Array:
    """Weighted Dice + cross-entropy loss (framework extension; the deeper
    training variant in BASELINE.json config #3).

    For ``num_classes == 1`` logits this is dice + BCE-with-logits; for
    multi-class NHWC logits it is mean soft-dice-per-class + softmax CE with
    optional per-class weights.
    """
    logits = logits.astype(jnp.float32)
    if logits.ndim == targets.ndim + 1 and logits.shape[-1] > 1:
        # multi-class: targets are integer labels, logits NHW C
        num_classes = logits.shape[-1]
        onehot = jax.nn.one_hot(targets.astype(jnp.int32), num_classes, dtype=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        p = probs.reshape(-1, num_classes)
        t = onehot.reshape(-1, num_classes)
        inter = jnp.sum(p * t, axis=0)
        denom = jnp.sum(p, axis=0) + jnp.sum(t, axis=0)
        dice_per_class = (2.0 * inter + smooth) / (denom + smooth)
        if class_weights is not None:
            w = class_weights / jnp.sum(class_weights)
            dice = jnp.sum(dice_per_class * w)
            ce = -jnp.mean(jnp.sum(t * jax.nn.log_softmax(logits.reshape(-1, num_classes)) * w, axis=-1))
        else:
            dice = jnp.mean(dice_per_class)
            ce = -jnp.mean(jnp.sum(t * jax.nn.log_softmax(logits.reshape(-1, num_classes)), axis=-1))
        return dice_weight * (1.0 - dice) + ce_weight * ce

    # binary
    d = dice_loss(logits, targets, smooth)
    t = targets.astype(jnp.float32).reshape(-1)
    x = logits.reshape(-1)
    # numerically stable BCE with logits
    bce = jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
    return dice_weight * d + ce_weight * bce
