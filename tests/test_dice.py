import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pdac_pathological_image_segmentation_tpu.ops import (
    dice_loss,
    dice_score,
    weighted_dice_ce_loss,
)
from pdac_pathological_image_segmentation_tpu.ops.dice import per_sample_dice_score


def _torch_dice_loss(logits, targets, smooth=1e-6):
    # exact reference semantics, util.py:10-19
    inputs = torch.sigmoid(torch.as_tensor(logits)).reshape(-1)
    targets = torch.as_tensor(targets).float().reshape(-1)
    intersection = (inputs * targets).sum()
    dice = (2.0 * intersection + smooth) / (inputs.sum() + targets.sum() + smooth)
    return float(1 - dice)


def _torch_dice_score(pred, target, smooth=1e-6):
    pred = torch.as_tensor(pred).float()
    target = torch.as_tensor(target).float()
    intersection = (pred * target).sum()
    union = pred.sum() + target.sum()
    return float((2.0 * intersection + smooth) / (union + smooth))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dice_loss_matches_reference(seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(4, 64, 64)).astype(np.float32)
    targets = (rng.random((4, 64, 64)) > 0.5).astype(np.float32)
    ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = _torch_dice_loss(logits, targets)
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("seed", [0, 3])
def test_dice_score_matches_reference(seed):
    rng = np.random.default_rng(seed)
    pred = (rng.random((4, 64, 64)) > 0.5).astype(np.float32)
    target = (rng.random((4, 64, 64)) > 0.5).astype(np.float32)
    ours = float(dice_score(jnp.asarray(pred), jnp.asarray(target)))
    ref = _torch_dice_score(pred, target)
    assert abs(ours - ref) < 1e-6


def test_dice_perfect_and_empty():
    t = jnp.ones((2, 8, 8))
    assert float(dice_score(t, t)) == pytest.approx(1.0, abs=1e-6)
    z = jnp.zeros((2, 8, 8))
    # both empty → smooth/smooth = 1
    assert float(dice_score(z, z)) == pytest.approx(1.0, abs=1e-6)
    assert float(dice_score(t, z)) == pytest.approx(0.0, abs=1e-4)


def test_per_sample_dice():
    pred = jnp.stack([jnp.ones((8, 8)), jnp.zeros((8, 8))])
    target = jnp.ones((2, 8, 8))
    s = per_sample_dice_score(pred, target)
    assert s.shape == (2,)
    assert float(s[0]) == pytest.approx(1.0, abs=1e-6)
    assert float(s[1]) == pytest.approx(0.0, abs=1e-4)


def test_weighted_dice_ce_binary_matches_bce():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 16, 16)).astype(np.float32)
    targets = (rng.random((2, 16, 16)) > 0.5).astype(np.float32)
    ours = float(
        weighted_dice_ce_loss(jnp.asarray(logits), jnp.asarray(targets),
                              dice_weight=0.0, ce_weight=1.0)
    )
    ref = float(
        F.binary_cross_entropy_with_logits(
            torch.as_tensor(logits), torch.as_tensor(targets)
        )
    )
    assert abs(ours - ref) < 1e-5


def test_weighted_dice_ce_multiclass_runs():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 3, size=(2, 16, 16)))
    loss = weighted_dice_ce_loss(logits, targets)
    assert np.isfinite(float(loss))
