"""int8 quantized serving for DeepLabV3+ and PSPNet — completing int8
coverage of all four reference architectures (reference ``test.py:94-111``).
Same contract as the unet/FPN mirrors: the float-mode mirror must equal
``model.apply`` exactly (drift pin), and the int8 masks must agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.quantized import (
    deeplab_forward,
    make_float_infer_step,
    make_quantized_infer_step,
    pspnet_forward,
    quantize_model,
)
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

RNG = np.random.default_rng(23)
SIZE = 64


def _setup(model_name, **cfg_kw):
    cfg = Config(model=model_name, img_size=SIZE, compute_dtype="float32",
                 use_pallas=False, **cfg_kw)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(
        RNG.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8))
    return cfg, model, state, image


def _model_ref(model, state, image):
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        eval_transform,
    )

    imgs, _ = eval_transform(image, jnp.zeros((4, 1, 1), jnp.uint8),
                             img_size=SIZE)
    return jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=False)[..., 0])


@pytest.mark.parametrize("model_name,forward", [
    ("deeplabv3+", deeplab_forward),
    ("pspnet", pspnet_forward),
])
@pytest.mark.slow
def test_float_mirror_matches_model(model_name, forward):
    _, model, state, image = _setup(model_name)
    ref = _model_ref(model, state, image)
    got = make_float_infer_step(state.params, state.batch_stats, SIZE,
                                forward=forward)(image)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_deeplab_nondefault_rates_mirror():
    """cfg.dilations flows through quantize_model(**model_kw) — the mirror
    must track a non-default atrous configuration."""
    cfg, model, state, image = _setup("deeplabv3+", dilations=(2, 4))
    ref = _model_ref(model, state, image)
    bundle, forward = quantize_model(
        "deeplabv3+", state.params, state.batch_stats, [image], SIZE,
        atrous_rates=tuple(cfg.dilations))
    assert "aspp.r1.pointwise" in bundle["qweights"]
    assert "aspp.r2.pointwise" not in bundle["qweights"]
    got = make_float_infer_step(state.params, state.batch_stats, SIZE,
                                forward=forward)(image)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_name,expect_sites", [
    ("deeplabv3+", ("stem", "aspp.1x1", "aspp.r2.pointwise",
                    "fuse.pointwise", "layer4_0.conv1")),
    ("pspnet", ("stem", "bottleneck", "layer2_1.conv2")),
])
@pytest.mark.slow
def test_quantized_masks_agree(model_name, expect_sites):
    _, model, state, image = _setup(model_name)
    bundle, forward = quantize_model(
        model_name, state.params, state.batch_stats, [image], SIZE)
    for site in expect_sites:
        assert site in bundle["qweights"], site
    if model_name == "pspnet":  # depth-3 encoder: layers 3/4 never run
        assert "layer3_0.conv1" not in bundle["qweights"]
    fprob = np.asarray(make_float_infer_step(
        state.params, state.batch_stats, SIZE, forward=forward)(image))
    qprob = np.asarray(make_quantized_infer_step(
        state.params, state.batch_stats, bundle, SIZE,
        forward=forward)(image))
    assert np.mean(np.abs(qprob - fprob)) < 0.05
    agree = np.mean((qprob >= 0.5) == (fprob >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"
