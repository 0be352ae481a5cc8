"""Sharded (8 virtual devices) sliding-window WSI inference must match the
single-device path exactly — same tiles, same blend, halo exchange over the
mesh instead of a single canvas."""

import jax
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.wsi import (
    GridTiler,
    SlidingWindowInference,
)
from pdac_pathological_image_segmentation_tpu.infer.wsi_sharded import (
    ShardedSlidingWindow,
)
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.parallel.mesh import create_mesh
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

TILE = 32


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model="unet", img_size=TILE, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    mesh = create_mesh()  # 8 fake CPU devices
    return model, state, mesh


@pytest.mark.parametrize("blend,stride", [("hann", 16), ("uniform", 32)])
def test_sharded_matches_single_device(setup, blend, stride):
    model, state, mesh = setup
    rng = np.random.default_rng(0)
    # 8 devices × band_h ≥ 32 → slide taller than 256
    slide = rng.integers(0, 256, (320, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=stride)

    single = SlidingWindowInference(model, state, tile=TILE, batch_size=8,
                                    blend=blend, num_workers=2)
    prob_ref, mask_ref = single.run(tiler)

    sharded = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                   batch_per_device=4, blend=blend)
    prob, mask = sharded.run(tiler)

    assert prob.shape == prob_ref.shape == (320, 96)
    np.testing.assert_allclose(prob, prob_ref, atol=2e-5)
    # binary masks may differ only on knife-edge 0.5 pixels; require none
    np.testing.assert_array_equal(mask, mask_ref)


def test_sharded_short_slide_pads_empty_bands(setup):
    """A slide shorter than devices×tile still works: trailing bands get no
    tiles and their padded canvas rows are cropped away."""
    model, state, mesh = setup
    rng = np.random.default_rng(1)
    slide = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=TILE)
    single = SlidingWindowInference(model, state, tile=TILE, batch_size=4,
                                    blend="uniform", num_workers=2)
    prob_ref, _ = single.run(tiler)
    sharded = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                   batch_per_device=2, blend="uniform")
    prob, _ = sharded.run(tiler)
    assert prob.shape == (64, 64)
    np.testing.assert_allclose(prob, prob_ref, atol=2e-5)


@pytest.mark.slow
def test_sharded_tta(setup):
    model, state, mesh = setup
    rng = np.random.default_rng(2)
    slide = rng.integers(0, 256, (288, 64, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=TILE)
    single = SlidingWindowInference(model, state, tile=TILE, batch_size=8,
                                    blend="uniform", tta=True, num_workers=2)
    prob_ref, _ = single.run(tiler)
    sharded = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                   batch_per_device=2, blend="uniform",
                                   tta=True)
    prob, _ = sharded.run(tiler)
    np.testing.assert_allclose(prob, prob_ref, atol=2e-5)


def test_sharded_band_input_matches_window_upload(setup):
    """band_input=True (one device-sharded band upload + on-device window
    slicing) == per-window upload, and auto mode picks band input for a
    read_region-capable source."""
    model, state, mesh = setup
    rng = np.random.default_rng(5)
    slide = rng.integers(0, 256, (320, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=16)

    p_win, m_win = ShardedSlidingWindow(
        model, state, mesh, tile=TILE, batch_per_device=4, blend="hann",
        band_input=False).run(tiler)
    p_band, m_band = ShardedSlidingWindow(
        model, state, mesh, tile=TILE, batch_per_device=4, blend="hann",
        band_input=True).run(tiler)
    np.testing.assert_allclose(p_band, p_win, atol=2e-5)
    np.testing.assert_array_equal(m_band, m_win)


def test_sharded_band_input_requires_read_region(setup):
    model, state, mesh = setup

    class WindowsOnly:
        def __init__(self, tiler):
            self._t = tiler
            self.canvas_hw = tiler.canvas_hw
            self.tile = tiler.tile

        def __len__(self):
            return len(self._t)

        def get(self, i):
            return self._t.get(i)

    rng = np.random.default_rng(6)
    slide = rng.integers(0, 256, (320, 96, 3), dtype=np.uint8)
    src = WindowsOnly(GridTiler(slide, tile=TILE, stride=TILE))
    runner = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                  batch_per_device=4, band_input=True)
    with pytest.raises(ValueError, match="read_region"):
        runner.run(src)


def test_sharded_band_input_never_decodes_windows(setup):
    """Band-input mode must plan from ``source.coords`` — calling
    ``get(i)`` would decode every overlapping window on host, the exact
    cost the band path exists to avoid (regression)."""
    model, state, mesh = setup
    rng = np.random.default_rng(7)
    slide = rng.integers(0, 256, (320, 96, 3), dtype=np.uint8)

    class CountingTiler(GridTiler):
        gets = 0

        def get(self, i):
            type(self).gets += 1
            return super().get(i)

    tiler = CountingTiler(slide, tile=TILE, stride=16)
    prob_b, _ = ShardedSlidingWindow(
        model, state, mesh, tile=TILE, batch_per_device=4,
        band_input=True).run(tiler)
    assert CountingTiler.gets == 0
    prob_ref, _ = SlidingWindowInference(
        model, state, tile=TILE, batch_size=8, num_workers=2).run(
        GridTiler(slide, tile=TILE, stride=16))
    np.testing.assert_allclose(prob_b, prob_ref, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("band_input", [False, True])
def test_sharded_uncertainty_matches_single_device(setup, band_input):
    """uncertainty=True over the mesh (incl. the variance halo exchange)
    equals the single-canvas runner's three maps."""
    model, state, mesh = setup
    rng = np.random.default_rng(3)
    slide = rng.integers(0, 256, (320, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=16)  # 2x overlap

    single = SlidingWindowInference(model, state, tile=TILE, batch_size=8,
                                    blend="hann", num_workers=2, tta=True,
                                    uncertainty=True)
    prob_ref, mask_ref, unc_ref = single.run(tiler)

    sharded = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                   batch_per_device=4, blend="hann",
                                   tta=True, uncertainty=True,
                                   band_input=band_input)
    prob, mask, unc = sharded.run(tiler)
    np.testing.assert_allclose(prob, prob_ref, atol=2e-5)
    np.testing.assert_array_equal(mask, mask_ref)
    assert unc.shape == unc_ref.shape
    np.testing.assert_allclose(unc, unc_ref, atol=2e-5)


@pytest.mark.parametrize("band_input", [False, True])
def test_rolled_sharded_matches_single_device(setup, band_input):
    """Rolled-band mode (roll_h ≪ per-chip region): each chip streams its
    ceil(h/D) rows through an O(roll_h) canvas; result equals the
    single-device runner.  Slide: 768 rows / 8 chips = 96-row regions,
    rolled through 32-row canvases (3 rolls per chip, slide_h/D ≫ roll_h),
    overlapping stride so tiles cross both roll AND chip boundaries."""
    model, state, mesh = setup
    rng = np.random.default_rng(11)
    slide = rng.integers(0, 256, (768, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=16)

    single = SlidingWindowInference(model, state, tile=TILE, batch_size=8,
                                    blend="hann", num_workers=2)
    prob_ref, mask_ref = single.run(tiler)

    rolled = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                  batch_per_device=4, blend="hann",
                                  band_input=band_input, roll_h=TILE)
    prob, mask = rolled.run(tiler)
    assert prob.shape == prob_ref.shape == (768, 96)
    # prob streams to host as float16 (the O(band) output dtype);
    # the mask is thresholded on f32 rows BEFORE the cast — exact
    np.testing.assert_allclose(np.asarray(prob, np.float32), prob_ref,
                               atol=1e-3)
    np.testing.assert_array_equal(mask, mask_ref)


def test_rolled_sharded_crops_irregular_height(setup):
    """Slide height not a multiple of D×roll_h: trailing rolls/regions are
    empty and cropped; equality still holds everywhere."""
    model, state, mesh = setup
    rng = np.random.default_rng(12)
    slide = rng.integers(0, 256, (700, 64, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=TILE)
    single = SlidingWindowInference(model, state, tile=TILE, batch_size=8,
                                    blend="uniform", num_workers=2)
    prob_ref, mask_ref = single.run(tiler)
    rolled = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                  batch_per_device=2, blend="uniform",
                                  roll_h=TILE)
    prob, mask = rolled.run(tiler)
    assert prob.shape == prob_ref.shape
    np.testing.assert_allclose(np.asarray(prob, np.float32), prob_ref,
                               atol=1e-3)
    np.testing.assert_array_equal(mask, mask_ref)


@pytest.mark.slow
def test_rolled_sharded_uncertainty(setup):
    """TTA-variance canvases roll and halo-exchange like the probability
    canvas."""
    model, state, mesh = setup
    rng = np.random.default_rng(13)
    slide = rng.integers(0, 256, (768, 64, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=16)
    single = SlidingWindowInference(model, state, tile=TILE, batch_size=8,
                                    blend="hann", num_workers=2, tta=True,
                                    uncertainty=True)
    prob_ref, mask_ref, unc_ref = single.run(tiler)
    rolled = ShardedSlidingWindow(model, state, mesh, tile=TILE,
                                  batch_per_device=4, blend="hann",
                                  tta=True, uncertainty=True, roll_h=TILE)
    prob, mask, unc = rolled.run(tiler)
    np.testing.assert_allclose(np.asarray(prob, np.float32), prob_ref,
                               atol=1e-3)
    np.testing.assert_array_equal(mask, mask_ref)
    np.testing.assert_allclose(np.asarray(unc, np.float32), unc_ref,
                               atol=1e-3)


def test_rolled_roll_h_smaller_than_tile_rejected(setup):
    model, state, mesh = setup
    with pytest.raises(ValueError, match="roll_h"):
        ShardedSlidingWindow(model, state, mesh, tile=TILE, roll_h=16)
