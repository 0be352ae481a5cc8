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
                logits1 = logits[..., 0].astype(jnp.float32)
                masks1 = masks.astype(jnp.float32)
                if valid is None:
                    return weighted_dice_ce_loss(
                        logits1, masks1, dice_weight=dice_w, ce_weight=ce_w
                    )
                # Mask *after* the sigmoid (masking logits would make padded
                # samples contribute sigmoid(0)=0.5 per pixel to the Dice
                # denominator and log(2) per pixel to BCE) and average BCE
                # over valid pixels only — mirrors _binary_dice_loss.
                probs = _vmask(jax.nn.sigmoid(logits1), valid)
                tgt = _vmask(masks1, valid)
                inter = jnp.sum(probs * tgt)
                d = 1.0 - (2.0 * inter + SMOOTH) / (
                    jnp.sum(probs) + jnp.sum(tgt) + SMOOTH
                )
                per_px = (jnp.maximum(logits1, 0) - logits1 * masks1
                          + jnp.log1p(jnp.exp(-jnp.abs(logits1))))
                per_px = _vmask(per_px, valid)
                px_per_sample = float(per_px[0].size)
                n_valid_px = jnp.maximum(
                    jnp.sum(valid.astype(jnp.float32)), 1.0
                ) * px_per_sample
                bce = jnp.sum(per_px) / n_valid_px
                return dice_w * d + ce_w * bce
        else:
            raise ValueError(f"unknown loss {loss_name!r}")

        def predict_fn(logits):
            return (jax.nn.sigmoid(logits[..., 0].astype(jnp.float32)) >= 0.5
                    ).astype(jnp.float32)

        return Objective(loss_fn, _binary_dice_score, predict_fn, 1)

    # multi-class: always Dice(+CE)
    def loss_fn(logits, masks, valid=None):
        logits = logits.astype(jnp.float32)
        masks = masks.astype(jnp.int32)
        d_w = dice_w if loss_name != "dice" else 1.0
        c_w = ce_w if loss_name != "dice" else 0.0
        if valid is None:
            return weighted_dice_ce_loss(
                logits, masks, dice_weight=d_w, ce_weight=c_w,
                class_weights=class_weights,
            )
        # Mask probabilities/per-pixel CE after the softmax (masking logits
        # would give padded samples a uniform softmax that biases both the
        # per-class Dice denominators and the CE mean).
        num_classes = logits.shape[-1]
        onehot = _vmask(
            jax.nn.one_hot(masks, num_classes, dtype=jnp.float32), valid
        )
        probs = _vmask(jax.nn.softmax(logits, axis=-1), valid)
        p = probs.reshape(-1, num_classes)
        t = onehot.reshape(-1, num_classes)
        inter = jnp.sum(p * t, axis=0)
        denom = jnp.sum(p, axis=0) + jnp.sum(t, axis=0)
        dice_per_class = (2.0 * inter + SMOOTH) / (denom + SMOOTH)
        log_p = jax.nn.log_softmax(logits).reshape(-1, num_classes)
        if class_weights is not None:
            w = class_weights / jnp.sum(class_weights)
            dice = jnp.sum(dice_per_class * w)
            per_px = -jnp.sum(t * log_p * w, axis=-1)
        else:
            dice = jnp.mean(dice_per_class)
            per_px = -jnp.sum(t * log_p, axis=-1)
        px_per_sample = float(masks[0].size)
        n_valid_px = jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0
        ) * px_per_sample
        ce = jnp.sum(per_px) / n_valid_px
        return d_w * (1.0 - dice) + c_w * ce

    def predict_fn(logits):
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    return Objective(loss_fn, _multiclass_macro_dice, predict_fn, nc)
