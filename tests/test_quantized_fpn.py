"""int8 quantized serving for FPN (the reference's DEFAULT model,
``configs/train_config.yaml:22``) and the int8 path through the
banded/sharded WSI runners: mirror parity vs the flax model, quantized-mask
agreement, and runner integration via ``infer_step`` overrides."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.quantized import (
    fpn_forward,
    make_float_infer_step,
    make_quantized_infer_fn,
    make_quantized_infer_step,
    quantize_model,
)
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

RNG = np.random.default_rng(17)
SIZE = 64


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model="fpn", img_size=SIZE, compute_dtype="float32",
                 use_pallas=False)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(
        RNG.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8))
    return model, state, image


def test_fpn_float_mirror_matches_model(setup):
    """The calibration-mode FPN mirror must equal model.apply exactly —
    the drift-pin that made the unet mirror safe, applied to FPN."""
    model, state, image = setup
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        eval_transform,
    )

    imgs, _ = eval_transform(image, jnp.zeros((4, 1, 1), jnp.uint8),
                             img_size=SIZE)
    ref = jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs, train=False)[..., 0])
    got = make_float_infer_step(state.params, state.batch_stats, SIZE,
                                forward=fpn_forward)(image)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fpn_quantized_masks_agree(setup):
    model, state, image = setup
    bundle, forward = quantize_model(
        "fpn", state.params, state.batch_stats, [image], SIZE)
    assert "stem" in bundle["qweights"]
    assert "lateral5" in bundle["qweights"]
    assert "seg0_2.conv" in bundle["qweights"]
    qstep = make_quantized_infer_step(state.params, state.batch_stats,
                                      bundle, SIZE, forward=forward)
    fprob = np.asarray(make_float_infer_step(
        state.params, state.batch_stats, SIZE, forward=forward)(image))
    qprob = np.asarray(qstep(image))
    assert np.mean(np.abs(qprob - fprob)) < 0.05
    agree = np.mean((qprob >= 0.5) == (fprob >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"


def test_quantize_model_rejects_unsupported():
    with pytest.raises(ValueError, match="no int8 path"):
        quantize_model("unet++", {}, {}, [], SIZE)


def test_quantize_model_rejects_non_resnet18_backbone():
    """The int8 encoder mirror is resnet18-topology; any other backbone
    must fail loudly instead of silently tracing the wrong topology over a
    subset of the weights."""
    with pytest.raises(ValueError, match="resnet18"):
        quantize_model("fpn", {}, {}, [], SIZE, backbone="resnet34")
    with pytest.raises(ValueError, match="resnet18"):
        quantize_model("unet", {}, {}, [], SIZE, backbone="mobilenet_v2")


TILE = 32


def test_int8_banded_sliding_window():
    """The int8 step drops into BandedSlidingWindow via ``infer_step`` —
    the gigapixel streaming path serves quantized."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
        GridTiler,
    )

    cfg = Config(model="unet", img_size=TILE, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(2))
    slide = np.asarray(
        RNG.integers(0, 256, (TILE * 3, TILE * 2, 3), dtype=np.uint8))
    calib = jnp.asarray(slide[:TILE, :TILE][None])
    bundle, forward = quantize_model(
        "unet", state.params, state.batch_stats, [calib], TILE)
    qfn = make_quantized_infer_fn(state.params, state.batch_stats, bundle,
                                  TILE, forward=forward)
    source = GridTiler(slide, tile=TILE, stride=TILE)
    ref_prob, _ = BandedSlidingWindow(
        model, state, tile=TILE, batch_size=2, band_h=TILE,
        blend="uniform", num_workers=1).run(source)
    q_prob, _ = BandedSlidingWindow(
        model, state, tile=TILE, batch_size=2, band_h=TILE,
        blend="uniform", num_workers=1, infer_step=qfn).run(source)
    agree = np.mean((q_prob >= 0.5) == (ref_prob >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"


@pytest.mark.slow
def test_int8_sharded_sliding_window():
    """The int8 step traces inside ShardedSlidingWindow's per-device
    shard_map program (``infer_step`` override) — multi-chip WSI serving
    runs quantized end-to-end."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import GridTiler
    from pdac_pathological_image_segmentation_tpu.infer.wsi_sharded import (
        ShardedSlidingWindow,
    )
    from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
        create_mesh,
    )

    cfg = Config(model="unet", img_size=TILE, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(3))
    mesh = create_mesh()  # 8 fake CPU devices
    rng = np.random.default_rng(5)
    slide = rng.integers(0, 256, (320, 96, 3), dtype=np.uint8)
    calib = jnp.asarray(slide[:TILE, :TILE][None])
    bundle, forward = quantize_model(
        "unet", state.params, state.batch_stats, [calib], TILE)
    qfn = make_quantized_infer_fn(state.params, state.batch_stats, bundle,
                                  TILE, forward=forward)
    tiler = GridTiler(slide, tile=TILE, stride=TILE)

    ref = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                               batch_per_device=4, blend="uniform")
    prob_ref, _ = ref.run(tiler)
    quant = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                 batch_per_device=4, blend="uniform",
                                 infer_step=qfn)
    prob_q, _ = quant.run(tiler)

    assert prob_q.shape == prob_ref.shape == (320, 96)
    agree = np.mean((prob_q >= 0.5) == (prob_ref >= 0.5))
    assert agree > 0.98, f"mask agreement {agree:.4f}"
