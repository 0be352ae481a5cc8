"""Training objective: loss + score as pure functions of (logits, masks).

The reference is binary-only with plain Dice loss (``util.py:6-26``,
``train_worker.py:245``).  This module keeps that as the default and adds
the BASELINE.json config #2/#3 extensions: multi-class segmentation
(softmax/argmax, macro Dice) and weighted Dice+CE.

All functions reduce over the *global* batch; under a data mesh the sums
lower to psums so every host computes identical values.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.ops.dice import (
    SMOOTH,
    weighted_dice_ce_loss,
)


class Objective(NamedTuple):
    loss_fn: Callable  # (logits NHWC, masks NHW, valid N|None) -> scalar
    score_fn: Callable  # (logits NHWC, masks NHW, valid N|None) -> scalar
    predict_fn: Callable  # (logits NHWC) -> hard labels NHW
    num_classes: int


def _vmask(x: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    if valid is None:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return x * valid.astype(x.dtype).reshape(shape)


def _binary_dice_loss(logits, masks, valid=None):
    probs = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
    probs = _vmask(probs, valid)
    masks = _vmask(masks.astype(jnp.float32), valid)
    inter = jnp.sum(probs * masks)
    return 1.0 - (2.0 * inter + SMOOTH) / (
        jnp.sum(probs) + jnp.sum(masks) + SMOOTH
    )


def _binary_dice_score(logits, masks, valid=None):
    probs = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
    preds = _vmask((probs >= 0.5).astype(jnp.float32), valid)
    masks = _vmask(masks.astype(jnp.float32), valid)
    inter = jnp.sum(preds * masks)
    return (2.0 * inter + SMOOTH) / (jnp.sum(preds) + jnp.sum(masks) + SMOOTH)


def _multiclass_macro_dice(logits, masks, valid=None):
    """Macro-averaged hard Dice over classes (argmax predictions)."""
    nc = logits.shape[-1]
    preds = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    pred_oh = jax.nn.one_hot(preds, nc, dtype=jnp.float32)
    mask_oh = jax.nn.one_hot(masks.astype(jnp.int32), nc, dtype=jnp.float32)
    pred_oh = _vmask(pred_oh, valid)
    mask_oh = _vmask(mask_oh, valid)
    axes = tuple(range(pred_oh.ndim - 1))
    inter = jnp.sum(pred_oh * mask_oh, axis=axes)
    denom = jnp.sum(pred_oh, axis=axes) + jnp.sum(mask_oh, axis=axes)
    return jnp.mean((2.0 * inter + SMOOTH) / (denom + SMOOTH))


def make_objective(cfg: Config) -> Objective:
    nc = cfg.num_classes
    loss_name = str(cfg.extras.get("loss", "dice")).lower()
    dice_w = float(cfg.extras.get("dice_weight", 0.5))
    ce_w = float(cfg.extras.get("ce_weight", 0.5))
    cw = cfg.extras.get("class_weights")
    class_weights = jnp.asarray(cw, jnp.float32) if cw is not None else None

    if nc == 1:
        if loss_name == "dice":
            loss_fn = _binary_dice_loss
        elif loss_name in ("dice_ce", "dice+ce"):
            def loss_fn(logits, masks, valid=None):
                logits1 = _vmask(logits[..., 0].astype(jnp.float32), valid)
                masks1 = _vmask(masks.astype(jnp.float32), valid)
                return weighted_dice_ce_loss(
                    logits1, masks1, dice_weight=dice_w, ce_weight=ce_w
                )
        else:
            raise ValueError(f"unknown loss {loss_name!r}")

        def predict_fn(logits):
            return (jax.nn.sigmoid(logits[..., 0].astype(jnp.float32)) >= 0.5
                    ).astype(jnp.float32)

        return Objective(loss_fn, _binary_dice_score, predict_fn, 1)

    # multi-class: always Dice(+CE)
    def loss_fn(logits, masks, valid=None):
        logits = _vmask(logits.astype(jnp.float32), valid)
        masks = masks.astype(jnp.int32)
        if valid is not None:
            masks = masks * valid.astype(jnp.int32).reshape(
                (masks.shape[0],) + (1,) * (masks.ndim - 1)
            )
        return weighted_dice_ce_loss(
            logits, masks,
            dice_weight=dice_w if loss_name != "dice" else 1.0,
            ce_weight=ce_w if loss_name != "dice" else 0.0,
            class_weights=class_weights,
        )

    def predict_fn(logits):
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    return Objective(loss_fn, _multiclass_macro_dice, predict_fn, nc)
