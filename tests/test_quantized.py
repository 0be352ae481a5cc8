"""int8 quantized serving path (infer/quantized.py): mirror parity vs the
flax model, quantized-mask agreement, and end-to-end Dice delta."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.quantized import (
    calibrate,
    make_float_infer_step,
    make_quantized_infer_step,
    quantize_resunet,
    quantize_weights,
)
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

RNG = np.random.default_rng(7)
SIZE = 64


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model="unet", img_size=SIZE, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(
        RNG.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8))
    return model, state, image


def test_float_mirror_matches_model(setup):
    """The calibration-mode mirror must equal model.apply exactly (same
    topology, same math) — this is what makes quantization drift-proof."""
    model, state, image = setup
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        eval_transform,
    )

    imgs, _ = eval_transform(image, jnp.zeros((4, 1, 1), jnp.uint8),
                             img_size=SIZE)
    ref = jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=False)[..., 0])
    got = make_float_infer_step(state.params, state.batch_stats, SIZE)(image)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_weight_quantization_roundtrip():
    k = jnp.asarray(RNG.normal(0, 0.2, (3, 3, 8, 16)), jnp.float32)
    kq, s = quantize_weights(k)
    assert kq.dtype == jnp.int8
    back = kq.astype(jnp.float32) * s
    # per-channel int8: max error is half a quantization step per channel
    step = np.asarray(s)
    assert np.all(np.abs(np.asarray(back - k)) <= 0.5 * step + 1e-7)


def test_quantized_masks_agree(setup):
    model, state, image = setup
    scales = calibrate(state.params, state.batch_stats, [image], SIZE)
    assert scales["stem"] > 0 and "layer4_1.conv2" in scales
    bundle = quantize_resunet(state.params, state.batch_stats, scales)
    qstep = make_quantized_infer_step(state.params, state.batch_stats,
                                     bundle, SIZE)
    fprob = np.asarray(
        make_float_infer_step(state.params, state.batch_stats, SIZE)(image))
    qprob = np.asarray(qstep(image))
    # probability maps stay close; hard masks nearly identical
    assert np.mean(np.abs(qprob - fprob)) < 0.05
    agree = np.mean((qprob >= 0.5) == (fprob >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"


@pytest.mark.slow
def test_quantized_dice_delta_end_to_end(tmp_path):
    """Train briefly on synthetic data, then compare bf16-path vs int8-path
    Dice on the test split (BASELINE 'Dice parity' target for the
    quantized serving mode)."""
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.data.discovery import (
        discover_split,
    )
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        PatchDataset,
    )
    from pdac_pathological_image_segmentation_tpu.ops.dice import dice_score

    generate_synthetic_patches(tmp_path / "test", n=8, size=SIZE, seed=3)
    cfg = Config(model="unet", img_size=SIZE, compute_dtype="float32")
    ds = PatchDataset(*discover_split(str(tmp_path / "test")), cfg)
    pairs = [ds[i] for i in range(len(ds))]
    imgs = np.stack([p[0] for p in pairs])
    msks = np.stack([p[1] for p in pairs])
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(1))

    image = jnp.asarray(imgs)
    mask = jnp.asarray(msks)
    fstep = make_float_infer_step(state.params, state.batch_stats, SIZE)
    fprob = fstep(image)
    scales = calibrate(state.params, state.batch_stats, [image], SIZE)
    bundle = quantize_resunet(state.params, state.batch_stats, scales)
    qprob = make_quantized_infer_step(state.params, state.batch_stats,
                                      bundle, SIZE)(image)
    d_f = float(dice_score(fprob >= 0.5, mask))
    d_q = float(dice_score(qprob >= 0.5, mask))
    assert abs(d_f - d_q) < 0.02, f"Dice delta {abs(d_f - d_q):.4f}"


def test_int8_sliding_window_inference(setup):
    """The quantized step drops into SlidingWindowInference via the
    ``infer_step`` override (the overlay CLI's --int8 path)."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        GridTiler,
        SlidingWindowInference,
    )

    model, state, image = setup
    slide = np.asarray(image[0])  # (SIZE, SIZE, 3) uint8
    scales = calibrate(state.params, state.batch_stats, [image], SIZE)
    bundle = quantize_resunet(state.params, state.batch_stats, scales)
    qstep = make_quantized_infer_step(state.params, state.batch_stats,
                                      bundle, SIZE)
    source = GridTiler(slide, tile=SIZE, stride=SIZE)
    ref_prob, _ = SlidingWindowInference(
        model, state, tile=SIZE, batch_size=2, blend="uniform",
        num_workers=1).run(source)
    q_prob, _ = SlidingWindowInference(
        model, state, tile=SIZE, batch_size=2, blend="uniform",
        num_workers=1, infer_step=lambda s, im: qstep(im)).run(source)
    agree = np.mean((q_prob >= 0.5) == (ref_prob >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"


def test_quantize_from_config_applies_stain(setup):
    """cfg.stain must reach the int8 path: the float-mode mirror built by
    quantize_from_config(stain=reinhard) must match the bf16 eval path WITH
    stain (and differ from the stainless mirror)."""
    from pdac_pathological_image_segmentation_tpu.infer.quantized import (
        make_float_infer_step,
        quantize_from_config,
    )
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        eval_transform,
    )

    model, state, image = setup
    cfg = Config(model="unet", img_size=SIZE, compute_dtype="float32",
                 stain="reinhard")
    _, forward = quantize_from_config(
        cfg, state.params, state.batch_stats, [image])
    got = make_float_infer_step(state.params, state.batch_stats, SIZE,
                                forward=forward)(image)

    imgs, _ = eval_transform(image, jnp.zeros((4, 1, 1), jnp.uint8),
                             img_size=SIZE, stain="reinhard")
    ref = jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=False)[..., 0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    plain = make_float_infer_step(state.params, state.batch_stats,
                                  SIZE)(image)
    assert float(jnp.max(jnp.abs(got - plain))) > 1e-6


def test_int8_activation_storage_masks_agree(setup):
    """act_storage="int8" (producer-quantized inter-site activations, the
    bandwidth lever from BASELINE.md's int8 roofline diagnosis) must hold
    the same accuracy gates as the bf16-storage mode: mask agreement
    >98% vs the float path, probability MAE bounded, and near-identity
    to the bf16-storage int8 path (the only numeric difference is WHERE
    the quantize rounds — producer f32 epilogue vs consumer bf16 read —
    plus int8 residual adds)."""
    model, state, image = setup
    scales = calibrate(state.params, state.batch_stats, [image], SIZE)
    bundle = quantize_resunet(state.params, state.batch_stats, scales)
    fprob = np.asarray(
        make_float_infer_step(state.params, state.batch_stats, SIZE)(image))
    q8 = make_quantized_infer_step(state.params, state.batch_stats,
                                   bundle, SIZE, act_storage="int8")
    q8prob = np.asarray(q8(image))
    assert np.mean(np.abs(q8prob - fprob)) < 0.05
    agree = np.mean((q8prob >= 0.5) == (fprob >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"
    qb = make_quantized_infer_step(state.params, state.batch_stats,
                                   bundle, SIZE, act_storage="bf16")
    qbprob = np.asarray(qb(image))
    agree_q = np.mean((q8prob >= 0.5) == (qbprob >= 0.5))
    assert agree_q > 0.99, f"vs bf16-storage agreement {agree_q:.4f}"


def test_int8_storage_skip_scale_invariant(setup):
    """The producer-side storage scale of a stage output equals the
    decoder skip consumer's calibrated scale — both record amax of the
    SAME tensor (this is what lets one int8 tensor serve both the next
    stage and the ConcatConv skip)."""
    model, state, image = setup
    scales = calibrate(state.params, state.batch_stats, [image], SIZE)
    # x2 (layer1 output) feeds layer2_0.conv1 AND dec3.b; x3 → dec2.b; etc.
    assert scales["layer2_0.conv1"] == pytest.approx(scales["dec3.b"])
    assert scales["layer3_0.conv1"] == pytest.approx(scales["dec2.b"])
    assert scales["layer4_0.conv1"] == pytest.approx(scales["dec1.b"])
    # layer2_0 has a downsample: its conv1 and ds consume the same tensor
    assert scales["layer2_0.conv1"] == pytest.approx(scales["layer2_0.ds"])
