import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.train.objective import (
    make_objective,
)
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)
from pdac_pathological_image_segmentation_tpu.train.steps import (
    make_predict_step,
    make_train_step,
)

RNG = np.random.default_rng(0)


def test_binary_objective_matches_reference_dice():
    cfg = Config(model="unet")
    obj = make_objective(cfg)
    logits = jnp.asarray(RNG.normal(size=(2, 16, 16, 1)), jnp.float32)
    masks = jnp.asarray(RNG.integers(0, 2, (2, 16, 16)), jnp.float32)
    from pdac_pathological_image_segmentation_tpu.ops.dice import (
        dice_loss,
        dice_score,
    )
    np.testing.assert_allclose(
        float(obj.loss_fn(logits, masks)),
        float(dice_loss(logits[..., 0], masks)), rtol=1e-6,
    )
    preds = (jax.nn.sigmoid(logits[..., 0]) >= 0.5).astype(jnp.float32)
    np.testing.assert_allclose(
        float(obj.score_fn(logits, masks)),
        float(dice_score(preds, masks)), rtol=1e-6,
    )


def test_binary_dice_ce_objective():
    cfg = Config.from_dict({"model": "unet", "loss": "dice_ce",
                            "dice_weight": 0.7, "ce_weight": 0.3})
    obj = make_objective(cfg)
    logits = jnp.asarray(RNG.normal(size=(2, 8, 8, 1)), jnp.float32)
    masks = jnp.asarray(RNG.integers(0, 2, (2, 8, 8)), jnp.float32)
    assert np.isfinite(float(obj.loss_fn(logits, masks)))


def test_binary_dice_ce_valid_mask_matches_valid_subset():
    """Regression: padded samples must not contribute sigmoid(0)=0.5 Dice
    mass or log(2) BCE — the masked loss over [valid, padded] must equal the
    unmasked loss over just the valid samples."""
    cfg = Config.from_dict({"model": "unet", "loss": "dice_ce",
                            "dice_weight": 0.7, "ce_weight": 0.3})
    obj = make_objective(cfg)
    logits = jnp.asarray(RNG.normal(size=(4, 8, 8, 1)), jnp.float32)
    masks = jnp.asarray(RNG.integers(0, 2, (4, 8, 8)), jnp.float32)
    valid = jnp.asarray([True, True, False, False])
    masked = float(obj.loss_fn(logits, masks, valid))
    subset = float(obj.loss_fn(logits[:2], masks[:2]))
    np.testing.assert_allclose(masked, subset, rtol=1e-6)


def test_multiclass_dice_ce_valid_mask_matches_valid_subset():
    cfg = Config.from_dict({"model": "unet", "num_classes": 3,
                            "loss": "dice_ce"})
    obj = make_objective(cfg)
    logits = jnp.asarray(RNG.normal(size=(4, 8, 8, 3)), jnp.float32)
    masks = jnp.asarray(RNG.integers(0, 3, (4, 8, 8)))
    valid = jnp.asarray([True, True, True, False])
    masked = float(obj.loss_fn(logits, masks, valid))
    subset = float(obj.loss_fn(logits[:3], masks[:3]))
    np.testing.assert_allclose(masked, subset, rtol=1e-6)


def test_multiclass_objective_perfect_prediction():
    cfg = Config(model="unet", num_classes=3)
    obj = make_objective(cfg)
    masks = jnp.asarray(RNG.integers(0, 3, (2, 8, 8)))
    logits = jax.nn.one_hot(masks, 3) * 10.0  # near-perfect
    assert float(obj.score_fn(logits, masks)) > 0.99
    preds = obj.predict_fn(logits)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(masks))
    assert float(obj.loss_fn(logits, masks)) < 0.1


def test_multiclass_valid_mask():
    cfg = Config(model="unet", num_classes=3)
    obj = make_objective(cfg)
    masks = jnp.asarray(RNG.integers(0, 3, (4, 8, 8)))
    logits = jax.nn.one_hot(masks, 3) * 10.0
    # corrupt the last two samples, then mark them invalid
    bad_logits = logits.at[2:].set(-logits[2:])
    valid = jnp.asarray([True, True, False, False])
    assert float(obj.score_fn(bad_logits, masks, valid)) > 0.99


def test_multiclass_model_trains_one_step():
    cfg = Config(model="fpn", num_classes=4, img_size=64,
                 compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    obj = make_objective(cfg)
    step = make_train_step(model, cfg.img_size, objective=obj, donate=False)
    image = jnp.asarray(RNG.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    mask = jnp.asarray(RNG.integers(0, 4, (2, 64, 64)), jnp.uint8)
    new_state, loss, score = step(state, jax.random.PRNGKey(1), image, mask)
    assert np.isfinite(float(loss)) and 0.0 <= float(score) <= 1.0
    pred = make_predict_step(model, cfg.img_size, objective=obj)(
        new_state, image
    )
    assert pred.shape == (2, 64, 64)
    assert int(pred.max()) <= 3


@pytest.mark.parametrize("model_name", ["unet++"])
def test_unetplusplus_contract(model_name):
    cfg = Config(model=model_name, img_size=64, compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 64, 64, 1)


@pytest.mark.slow
def test_remat_train_step_matches_plain():
    """jax.checkpoint remat changes memory, not math."""
    cfg = Config(model="unet", img_size=32, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(RNG.integers(0, 256, (2, 32, 32, 3)), jnp.uint8)
    mask = jnp.asarray(RNG.integers(0, 2, (2, 32, 32)), jnp.uint8)
    key = jax.random.PRNGKey(5)
    plain = make_train_step(model, 32, donate=False)
    rem = make_train_step(model, 32, donate=False, remat=True)
    _, loss_a, score_a = plain(state, key, image, mask)
    _, loss_b, score_b = rem(state, key, image, mask)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    np.testing.assert_allclose(float(score_a), float(score_b), rtol=1e-5)


@pytest.mark.slow
def test_grad_accum_step_runs_and_k1_matches_plain():
    cfg = Config(model="unet", img_size=32, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(RNG.integers(0, 256, (4, 32, 32, 3)), jnp.uint8)
    mask = jnp.asarray(RNG.integers(0, 2, (4, 32, 32)), jnp.uint8)
    key = jax.random.PRNGKey(9)
    plain = make_train_step(model, 32, donate=False)
    k1 = make_train_step(model, 32, donate=False, grad_accum_steps=1)
    k2 = make_train_step(model, 32, donate=False, grad_accum_steps=2)
    s_plain, loss_p, _ = plain(state, key, image, mask)
    s_k1, loss_1, _ = k1(state, key, image, mask)
    np.testing.assert_allclose(float(loss_p), float(loss_1), rtol=1e-6)
    s_k2, loss_2, score_2 = k2(state, key, image, mask)
    assert np.isfinite(float(loss_2)) and 0.0 <= float(score_2) <= 1.0
    # params moved in both cases
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(s_k2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
