import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.ops.stitch import (
    blend_window,
    finalize_canvas,
    stitch_tiles,
    stitch_tiles_into,
)
from pdac_pathological_image_segmentation_tpu.infer.wsi import (
    GridTiler,
    PyHISTTileSource,
    SlidingWindowInference,
    overlay_figure,
)
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

TILE = 32


def test_stitch_nonoverlapping_uniform_reproduces_paste():
    # stride == tile, uniform blend → exact tile paste (reference behavior)
    rng = np.random.default_rng(0)
    probs = jnp.asarray(rng.random((4, TILE, TILE)), jnp.float32)
    coords = jnp.asarray(
        [[0, 0], [0, TILE], [TILE, 0], [TILE, TILE]], jnp.int32
    )
    accum, weight = stitch_tiles(probs, coords, canvas_hw=(64, 64),
                                 blend="uniform")
    prob, mask = finalize_canvas(accum, weight)
    out = np.asarray(prob)
    np.testing.assert_allclose(out[:TILE, :TILE], np.asarray(probs[0]), rtol=1e-6)
    np.testing.assert_allclose(out[TILE:, TILE:], np.asarray(probs[3]), rtol=1e-6)


def test_stitch_overlap_blends_to_constant():
    # constant-probability tiles overlapping anywhere must blend back to the
    # same constant (partition-of-unity check for every blend mode)
    for blend in ("uniform", "hann", "pyramid"):
        probs = jnp.full((3, TILE, TILE), 0.7, jnp.float32)
        coords = jnp.asarray([[0, 0], [0, 16], [0, 32]], jnp.int32)
        accum, weight = stitch_tiles(probs, coords, canvas_hw=(TILE, 64),
                                     blend=blend)
        prob, _ = finalize_canvas(accum, weight)
        covered = np.asarray(weight) > 0
        np.testing.assert_allclose(
            np.asarray(prob)[covered], 0.7, rtol=1e-5,
            err_msg=f"blend={blend}",
        )


def test_stitch_chunked_streaming_matches_single_shot():
    rng = np.random.default_rng(1)
    probs = jnp.asarray(rng.random((6, TILE, TILE)), jnp.float32)
    coords = jnp.asarray([[0, 16 * i] for i in range(6)], jnp.int32)
    a1, w1 = stitch_tiles(probs, coords, canvas_hw=(TILE, 16 * 5 + TILE),
                          blend="hann")
    a2, w2 = stitch_tiles(probs[:3], coords[:3],
                          canvas_hw=(TILE, 16 * 5 + TILE), blend="hann")
    a2, w2 = stitch_tiles_into(a2, w2, probs[3:], coords[3:], blend="hann")
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5)


def test_blend_window_positive():
    for mode in ("uniform", "hann", "pyramid"):
        w = np.asarray(blend_window(64, mode))
        assert (w > 0).all() and w.shape == (64, 64)


def test_grid_tiler_covers_edges():
    slide = np.zeros((100, 70, 3), np.uint8)
    t = GridTiler(slide, tile=TILE, stride=TILE)
    ys = {c[0] for c in t.coords}
    xs = {c[1] for c in t.coords}
    assert max(ys) + TILE == 100 and max(xs) + TILE == 70
    img, (y, x) = t.get(0)
    assert img.shape == (TILE, TILE, 3) and (y, x) == (0, 0)


@pytest.fixture(scope="module")
def model_and_state():
    cfg = Config(model="unet", img_size=TILE, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    return model, state


def test_sliding_window_end_to_end(model_and_state):
    model, state = model_and_state
    rng = np.random.default_rng(0)
    slide = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=16)  # 2× overlap
    runner = SlidingWindowInference(model, state, tile=TILE, batch_size=4,
                                    blend="hann", num_workers=2)
    prob, mask = runner.run(tiler)
    assert prob.shape == (96, 96) and mask.shape == (96, 96)
    assert prob.min() >= 0.0 and prob.max() <= 1.0
    assert set(np.unique(mask)).issubset({0, 1})


def test_tta_matches_manual_dihedral_average(model_and_state):
    """TTA output == mean over the 8 dihedral transforms of
    inverse-transform(model(transform(x))), computed manually on host."""
    model, state = model_and_state
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (2, TILE, TILE, 3), dtype=np.uint8)
    plain = SlidingWindowInference(model, state, tile=TILE, tta=False)
    tta = SlidingWindowInference(model, state, tile=TILE, tta=True)

    expected = np.zeros((2, TILE, TILE), np.float32)
    for flip in (False, True):
        base = img[:, :, ::-1, :] if flip else img
        for k in range(4):
            rot = np.rot90(base, k, axes=(1, 2))
            p = np.asarray(plain._infer(state, jnp.asarray(rot.copy())))
            p = np.rot90(p, -k, axes=(1, 2))
            if flip:
                p = p[:, :, ::-1]
            expected += p
    expected /= 8.0

    p_tta = np.asarray(tta._infer(state, jnp.asarray(img)))
    np.testing.assert_allclose(p_tta, expected, atol=1e-5)


def test_pyhist_source_and_overlay(tmp_path, model_and_state):
    model, state = model_and_state
    rng = np.random.default_rng(0)
    tile_dir = tmp_path / "tiles"
    tile_dir.mkdir()
    rows = []
    for r in range(2):
        for c in range(3):
            name = f"tile_{r}_{c}.png"
            arr = rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tile_dir / name)
            keep = 0 if (r, c) == (1, 2) else 1
            rows.append((name, r, c, keep))
    tsv = tmp_path / "tile_selection.tsv"
    with open(tsv, "w") as f:
        f.write("Tile\tRow\tColumn\tKeep\n")
        for row in rows:
            f.write("\t".join(str(v) for v in row) + "\n")

    source = PyHISTTileSource(str(tile_dir), str(tsv), tile=TILE)
    assert len(source) == 5  # Keep=0 tile dropped
    assert source.canvas_hw == (64, 96)

    runner = SlidingWindowInference(model, state, tile=TILE, batch_size=4,
                                    blend="uniform", num_workers=2)
    prob, mask = runner.run(source)
    # the dropped tile's region is uncovered → probability 0
    assert prob[TILE:, 2 * TILE:].max() == 0.0

    thumb = np.full((48, 72, 3), 255, np.uint8)
    out = overlay_figure(thumb, mask, str(tmp_path / "overlay.png"))
    assert os.path.exists(out)


def test_tissue_thresholding_skips_background():
    from pdac_pathological_image_segmentation_tpu.ops.tissue import (
        tissue_fraction,
        tissue_fraction_np,
        tissue_mask_np,
    )

    rng = np.random.default_rng(0)
    # left half: white background; right half: pink/purple tissue
    slide = np.full((64, 128, 3), 248, np.uint8)
    tissue = np.stack([
        rng.integers(150, 220, (64, 64)),
        rng.integers(60, 140, (64, 64)),
        rng.integers(140, 200, (64, 64)),
    ], axis=-1).astype(np.uint8)
    slide[:, 64:] = tissue

    assert tissue_fraction_np(slide[:, :64]) < 0.05
    assert tissue_fraction_np(slide[:, 64:]) > 0.8
    # jax/np agreement
    fj = np.asarray(tissue_fraction(jnp.asarray(slide[None])))
    np.testing.assert_allclose(fj[0], tissue_fraction_np(slide), atol=1e-3)
    assert tissue_mask_np(slide).shape == (64, 128)

    all_tiles = GridTiler(slide, tile=32, stride=32)
    tissue_tiles = GridTiler(slide, tile=32, stride=32, tissue_threshold=0.5)
    assert len(all_tiles) == 8
    assert len(tissue_tiles) == 4  # only the right half survives
    assert all(x >= 64 for (_, x) in tissue_tiles.coords)


def test_grid_tiler_pads_slides_smaller_than_tile(model_and_state):
    """Regression: slides smaller than one tile used to emit short tiles
    that shape-error in the compiled infer step; now the tiler edge-pads
    and the runner crops the canvas back to the original size."""
    model, state = model_and_state
    rng = np.random.default_rng(1)
    slide = rng.integers(0, 256, (20, 50, 3), dtype=np.uint8)  # < TILE each
    tiler = GridTiler(slide, tile=TILE, stride=TILE)
    img, (y, x) = tiler.get(0)
    assert img.shape == (TILE, TILE, 3)
    runner = SlidingWindowInference(model, state, tile=TILE, batch_size=4,
                                    blend="uniform", num_workers=2)
    prob, mask = runner.run(tiler)
    assert prob.shape == (20, 50) and mask.shape == (20, 50)
    assert np.isfinite(prob).all()


def test_pyhist_source_tissue_threshold(tmp_path):
    """PyHISTTileSource drops background tiles below tissue_threshold —
    the same keep/skip stage GridTiler has."""
    rng = np.random.default_rng(2)
    tile_dir = tmp_path / "tiles"
    tile_dir.mkdir()
    rows = ["Tile\tRow\tColumn\tKeep"]
    for i, (r, c) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        if i < 2:  # white background tiles
            img = np.full((TILE, TILE, 3), 250, np.uint8)
        else:  # stained tissue tiles
            img = np.stack([
                rng.integers(150, 220, (TILE, TILE)),
                rng.integers(60, 140, (TILE, TILE)),
                rng.integers(140, 200, (TILE, TILE)),
            ], axis=-1).astype(np.uint8)
        name = f"t_{i}.png"
        Image.fromarray(img).save(tile_dir / name)
        rows.append(f"{name}\t{r}\t{c}\t1")
    tsv = tmp_path / "tile_selection.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    src_all = PyHISTTileSource(str(tile_dir), str(tsv), tile=TILE)
    src_tissue = PyHISTTileSource(str(tile_dir), str(tsv), tile=TILE,
                                  tissue_threshold=0.5, num_workers=2)
    assert len(src_all) == 4
    assert len(src_tissue) == 2
    names = {e[0] for e in src_tissue.entries}
    assert names == {"t_2.png", "t_3.png"}


def test_banded_sliding_window_matches_plain(model_and_state):
    """O(band)-memory banded runner == whole-canvas runner on the same
    slide (incl. tiles spilling across band boundaries)."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )

    model, state = model_and_state
    rng = np.random.default_rng(4)
    slide = rng.integers(0, 256, (160, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=16)  # 2x overlap
    plain = SlidingWindowInference(model, state, tile=TILE, batch_size=4,
                                   blend="hann", num_workers=2)
    banded = BandedSlidingWindow(model, state, tile=TILE, batch_size=4,
                                 band_h=64, blend="hann", num_workers=2)
    p_ref, m_ref = plain.run(tiler)
    p_band, m_band = banded.run(tiler, prob_dtype=np.float32)
    np.testing.assert_allclose(p_band, p_ref, atol=2e-5)
    np.testing.assert_array_equal(m_band, m_ref)


def test_synthetic_slide_source_streams(model_and_state):
    """Procedural slide source: deterministic tiles, no O(slide) memory,
    runs through the banded pipeline end-to-end."""
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        SyntheticSlideSource,
    )
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )

    model, state = model_and_state
    src = SyntheticSlideSource(size=128, tile=TILE, stride=TILE, seed=1)
    t0, c0 = src.get(0)
    t0b, c0b = src.get(0)
    np.testing.assert_array_equal(t0, t0b)  # deterministic
    assert t0.shape == (TILE, TILE, 3) and c0 == (0, 0)
    runner = BandedSlidingWindow(model, state, tile=TILE, batch_size=4,
                                 band_h=64, blend="uniform", num_workers=2)
    prob, mask = runner.run(src)
    assert prob.shape == (128, 128) and prob.dtype == np.float16
    assert np.isfinite(prob.astype(np.float32)).all()


def test_synthetic_source_region_coherence():
    """get() windows and read_region() bands view the SAME virtual slide
    (cell-grid generation): windows equal region crops, regions compose,
    reads past the slide edge zero-fill."""
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        SyntheticSlideSource,
    )

    src = SyntheticSlideSource(size=160, tile=TILE, stride=TILE // 2, seed=3)
    for i in (0, 3, len(src) - 1):
        img, (y, x) = src.get(i)
        np.testing.assert_array_equal(img, src.read_region(y, x, TILE, TILE))
    whole = src.read_region(0, 0, 160, 160)
    part = src.read_region(37, 21, 80, 90)
    np.testing.assert_array_equal(part, whole[37:117, 21:111])
    over = src.read_region(160 - TILE // 2, 0, TILE, TILE)
    np.testing.assert_array_equal(over[:TILE // 2],
                                  whole[160 - TILE // 2:, :TILE])
    assert (over[TILE // 2:] == 0).all()


def test_band_extract_matches_host_slices(model_and_state):
    """The on-device window extraction (vmap dynamic_slice over the
    uploaded band) is bitwise the host slice."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )

    model, state = model_and_state
    runner = BandedSlidingWindow(model, state, tile=TILE, batch_size=4,
                                 band_h=TILE, band_input=True)
    rng = np.random.default_rng(7)
    band = rng.integers(0, 256, (2 * TILE, 96, 3), dtype=np.uint8)
    coords = np.asarray(
        [[0, 0], [TILE // 2, 5], [TILE, 96 - TILE], [0, 96 - TILE]],
        np.int32,
    )
    got = np.asarray(runner._extract(jnp.asarray(band), jnp.asarray(coords)))
    for i, (y, x) in enumerate(coords):
        np.testing.assert_array_equal(got[i], band[y:y + TILE, x:x + TILE])


def test_banded_band_input_matches_window_upload(model_and_state):
    """band_input=True (one H2D per band + on-device window slicing, the
    ~4x H2D reduction) produces the same canvas as per-window upload —
    including padded partial batches and a window-free band that must not
    be uploaded."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )

    model, state = model_and_state
    rng = np.random.default_rng(11)
    slide = rng.integers(0, 256, (5 * TILE, 3 * TILE, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=TILE // 2)
    # empty a whole band: drop every window whose top edge lands in band 1
    tiler.coords = [(y, x) for (y, x) in tiler.coords
                    if not (2 * TILE <= y < 4 * TILE)]
    kw = dict(tile=TILE, batch_size=4, band_h=2 * TILE, blend="hann",
              num_workers=2)
    p_win, m_win = BandedSlidingWindow(
        model, state, band_input=False, **kw).run(tiler,
                                                  prob_dtype=np.float32)
    p_band, m_band = BandedSlidingWindow(
        model, state, band_input=True, **kw).run(tiler,
                                                 prob_dtype=np.float32)
    np.testing.assert_allclose(p_band, p_win, atol=2e-5)
    np.testing.assert_array_equal(m_band, m_win)


def test_band_input_requires_read_region(model_and_state):
    """Explicit band_input=True on a source without read_region is a clear
    error (auto mode silently falls back to window upload)."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )

    class WindowsOnly:
        def __init__(self, tiler):
            self._t = tiler
            self.coords = tiler.coords
            self.canvas_hw = tiler.canvas_hw
            self.tile = tiler.tile

        def __len__(self):
            return len(self._t)

        def get(self, i):
            return self._t.get(i)

    model, state = model_and_state
    rng = np.random.default_rng(2)
    slide = rng.integers(0, 256, (2 * TILE, 2 * TILE, 3), dtype=np.uint8)
    src = WindowsOnly(GridTiler(slide, tile=TILE, stride=TILE))
    runner = BandedSlidingWindow(model, state, tile=TILE, batch_size=4,
                                 band_h=TILE, band_input=True)
    with pytest.raises(ValueError, match="read_region"):
        runner.run(src)
    auto = BandedSlidingWindow(model, state, tile=TILE, batch_size=4,
                               band_h=TILE)
    prob, mask = auto.run(src)
    assert prob.shape == src.canvas_hw


def test_tta_uncertainty_map(model_and_state):
    """uncertainty=True returns a third map equal to the hand-computed
    population variance across the 8 dihedral predictions, and the
    prob/mask outputs are unchanged vs uncertainty=False."""
    model, state = model_and_state
    rng = np.random.default_rng(7)
    slide = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=TILE)  # 4 disjoint tiles

    # batch_size < n tiles: exercises the stitch_tiles_into accumulation
    # path (separate donated canvases for prob and variance)
    base = SlidingWindowInference(model, state, tile=TILE, batch_size=2,
                                  tta=True, blend="uniform", num_workers=1)
    with_unc = SlidingWindowInference(model, state, tile=TILE, batch_size=2,
                                      tta=True, blend="uniform",
                                      num_workers=1, uncertainty=True)
    prob0, mask0 = base.run(tiler)
    prob1, mask1, unc = with_unc.run(tiler)
    np.testing.assert_allclose(prob1, prob0, atol=1e-6, rtol=0)
    np.testing.assert_array_equal(mask1, mask0)
    assert unc.shape == prob1.shape
    assert (unc >= 0).all() and unc.max() <= 0.25 + 1e-6

    # hand-compute the 8-transform variance for the first tile
    img, _ = tiler.get(0)
    imgs = img[None]
    plain = SlidingWindowInference(model, state, tile=TILE, batch_size=1,
                                   tta=False, blend="uniform", num_workers=1)
    preds = []
    for flip in (False, True):
        b = imgs[:, :, ::-1, :] if flip else imgs
        for k in range(4):
            rot = np.rot90(b, k, axes=(1, 2))
            p = np.asarray(plain._infer(state, jnp.asarray(rot.copy())))
            p = np.rot90(p, -k, axes=(1, 2))
            if flip:
                p = p[:, :, ::-1]
            preds.append(p[0])
    stack = np.stack(preds)
    want_var = stack.var(axis=0)
    np.testing.assert_allclose(unc[:TILE, :TILE], want_var, atol=1e-5)


def test_uncertainty_requires_tta(model_and_state):
    model, state = model_and_state
    with pytest.raises(ValueError, match="tta"):
        SlidingWindowInference(model, state, tile=TILE, tta=False,
                               uncertainty=True)


@pytest.mark.slow
def test_banded_uncertainty_matches_plain(model_and_state):
    """BandedSlidingWindow(uncertainty=True) over multiple bands equals
    the single-canvas runner's maps (incl. the band-input path)."""
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )

    model, state = model_and_state
    rng = np.random.default_rng(11)
    slide = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    tiler = GridTiler(slide, tile=TILE, stride=TILE // 2)  # 2x overlap

    plain = SlidingWindowInference(model, state, tile=TILE, batch_size=4,
                                   tta=True, blend="hann", num_workers=1,
                                   uncertainty=True)
    prob0, mask0, unc0 = plain.run(tiler)
    for band_input in (False, True):
        banded = BandedSlidingWindow(
            model, state, tile=TILE, batch_size=4, band_h=TILE,
            tta=True, blend="hann", num_workers=1, uncertainty=True,
            band_input=band_input)
        prob1, mask1, unc1 = banded.run(tiler, prob_dtype=np.float32)
        np.testing.assert_allclose(prob1, prob0, atol=1e-5, rtol=0,
                                   err_msg=f"band_input={band_input}")
        np.testing.assert_array_equal(mask1, mask0)
        np.testing.assert_allclose(unc1, unc0, atol=1e-5, rtol=0,
                                   err_msg=f"band_input={band_input}")


def test_device_slide_source_consistency():
    """DeviceSlideSource (the zero-H2D chip-bound bench source) is a pure
    function of global pixel coordinates: overlapping band reads agree
    exactly, and the banded runner consumes it through the band-input
    path."""
    import numpy as np

    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        DeviceSlideSource,
    )

    src = DeviceSlideSource(size=256, tile=64, stride=32, seed=3)
    a = np.asarray(src.read_region(0, 0, 128, 256))
    b = np.asarray(src.read_region(64, 0, 128, 256))
    np.testing.assert_array_equal(a[64:], b[:64])
    t, (y, x) = src.get(5)
    np.testing.assert_array_equal(
        t, np.asarray(src.read_region(y, x, 64, 64)))
    assert t.dtype == np.uint8 and 0 < t.mean() < 255


def test_banded_runner_on_device_source():
    import jax
    import numpy as np

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        DeviceSlideSource,
    )
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        BandedSlidingWindow,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )

    cfg = Config(model="unet", img_size=64, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    src = DeviceSlideSource(size=192, tile=64, stride=64, seed=1)
    runner = BandedSlidingWindow(model, state, tile=64, batch_size=4,
                                 band_h=64, num_workers=1)
    prob, mask = runner.run(src)
    assert prob.shape == (192, 192) and mask.shape == (192, 192)
    assert np.all(np.isfinite(prob.astype(np.float32)))
