"""Inference-step optimizations must not change the math.

* normalize-folding: make_infer_step folds ImageNet normalization into the
  stem conv + bn1 mean (train/steps.py:_fold_normalize_into_stem); its output
  must match the unfolded eval_transform + forward + sigmoid path.
* partial train batches: wrap-padded samples (valid=False) must not change
  the loss/score (the reference keeps partial batches, drop_last=False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.ops.augment import eval_transform
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)
from pdac_pathological_image_segmentation_tpu.train.steps import (
    _can_fold_stem,
    make_infer_step,
    make_train_step,
)

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("model_name", ["unet", "fpn"])
def test_infer_step_fold_matches_unfolded(model_name):
    cfg = Config(model=model_name, img_size=64, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    assert _can_fold_stem(state.params)

    image = jnp.asarray(RNG.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    probs = make_infer_step(model, 64)(state, image)

    imgs, _ = eval_transform(image, jnp.zeros((2, 1, 1), jnp.uint8),
                             img_size=64, dtype=jnp.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=False,
    )
    ref = jax.nn.sigmoid(out[..., 0].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_infer_step_fold_with_resize():
    cfg = Config(model="unet", img_size=64, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(RNG.integers(0, 256, (2, 96, 96, 3)), jnp.uint8)
    probs = make_infer_step(model, 64)(state, image)
    imgs, _ = eval_transform(image, jnp.zeros((2, 1, 1), jnp.uint8),
                             img_size=64, dtype=jnp.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=False,
    )
    ref = jax.nn.sigmoid(out[..., 0].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_train_step_invalid_mask_labels_do_not_affect_metrics():
    """Labels of wrap-padded (valid=False) samples must not leak into the
    reported loss/score.  (Their *images* still pass through train-mode
    BatchNorm batch statistics by design — the loader wrap-pads with real
    duplicated images, see train/steps.py — so only the mask content is
    invariant here.)"""
    cfg = Config(model="unet", img_size=32, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(model, 32, donate=False)
    key = jax.random.PRNGKey(7)

    image = np.asarray(RNG.integers(0, 256, (4, 32, 32, 3)), np.uint8)
    mask_a = np.asarray(RNG.integers(0, 2, (4, 32, 32)), np.uint8)
    mask_b = mask_a.copy()
    mask_b[2:] = 1 - mask_b[2:]
    valid = jnp.asarray([True, True, False, False])

    new_a, loss_a, score_a = step(state, key, jnp.asarray(image),
                                  jnp.asarray(mask_a), valid)
    new_b, loss_b, score_b = step(state, key, jnp.asarray(image),
                                  jnp.asarray(mask_b), valid)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(float(score_a), float(score_b), rtol=1e-6)
    # gradients (hence the update) are invariant too: padded samples' probs
    # are masked out of the dice
    pa = jax.tree_util.tree_leaves(new_a.params)[0]
    pb = jax.tree_util.tree_leaves(new_b.params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-7)


@pytest.mark.slow
def test_trainer_keeps_partial_final_batch(tmp_path):
    """drop_last=False semantics: a dataset size not divisible by the batch
    still trains on every sample (the final batch is wrap-padded + masked,
    reference train_worker.py:218-225 keeps partial batches)."""
    from pdac_pathological_image_segmentation_tpu.data import (
        PatchDataset,
        discover_split,
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.train.loop import Trainer

    data = tmp_path / "train"
    generate_synthetic_patches(str(data), n=10, size=32, seed=0)
    cfg = Config(model="unet", img_size=32, batch_size=8, epochs=1,
                 num_worker=2, compute_dtype="float32",
                 train_path=str(data), val_path=str(data))
    tr_set = PatchDataset(*discover_split(str(data)), cfg)
    trainer = Trainer(cfg, str(tmp_path / "out"), tr_set, tr_set)
    assert len(trainer.train_loader) == 2  # 10 samples / bs 8 → 2 batches
    result = trainer.train()
    assert np.isfinite(result["history"][0]["train_loss"])
