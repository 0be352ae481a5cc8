import os

import numpy as np
import pytest
from PIL import Image

from pdac_pathological_image_segmentation_tpu.data import native_loader


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    gray = rng.integers(0, 2, (64, 64), dtype=np.uint8)
    rgba = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    pal = Image.fromarray(gray * 255).convert("P")
    paths = {}
    Image.fromarray(rgb).save(d / "rgb.png")
    Image.fromarray(gray).save(d / "gray.png")
    Image.fromarray(rgba).save(d / "rgba.png")
    pal.save(d / "pal.png")
    return d, rgb, gray, rgba


def test_native_builds():
    assert native_loader.native_available()


def test_png_info(pngs):
    d, *_ = pngs
    assert native_loader.png_info(str(d / "rgb.png")) == (64, 64)
    assert native_loader.png_info("/nonexistent.png") is None


def test_decode_rgb_bit_exact(pngs):
    d, rgb, gray, rgba = pngs
    out = native_loader.decode_batch([str(d / "rgb.png")], 64, 64, 3)
    np.testing.assert_array_equal(out[0], rgb)


def test_decode_gray_mask(pngs):
    d, rgb, gray, rgba = pngs
    out = native_loader.decode_batch([str(d / "gray.png")], 64, 64, 1)
    np.testing.assert_array_equal(out[0, ..., 0], gray)


def test_decode_rgba_drops_alpha(pngs):
    d, rgb, gray, rgba = pngs
    out = native_loader.decode_batch([str(d / "rgba.png")], 64, 64, 3)
    np.testing.assert_array_equal(out[0], rgba[..., :3])


def test_decode_palette(pngs):
    d, rgb, gray, rgba = pngs
    out = native_loader.decode_batch([str(d / "pal.png")], 64, 64, 3)
    np.testing.assert_array_equal(out[0, ..., 0], gray * 255)


def test_decode_batch_mixed(pngs):
    d, rgb, gray, rgba = pngs
    paths = [str(d / "rgb.png"), str(d / "rgba.png"), str(d / "rgb.png")]
    out = native_loader.decode_batch(paths, 64, 64, 3, threads=2)
    np.testing.assert_array_equal(out[0], rgb)
    np.testing.assert_array_equal(out[2], rgb)


def test_decode_missing_file_raises(pngs):
    with pytest.raises(IOError):
        native_loader.decode_batch(["/no/such/file.png"], 64, 64, 3)


def test_size_mismatch_falls_back_to_pil(pngs, tmp_path):
    # a 32×32 PNG requested at 64×64 → native rejects, PIL fallback also
    # rejects (different size) → IOError
    small = tmp_path / "small.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(small)
    with pytest.raises(IOError):
        native_loader.decode_batch([str(small)], 64, 64, 3)


def test_loader_uses_native_path(tmp_path):
    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data import (
        PatchDataset,
        PatchLoader,
        discover_split,
        generate_synthetic_patches,
    )

    generate_synthetic_patches(str(tmp_path), n=6, size=64, seed=0)
    cfg = Config(model="unet", img_size=64)
    ds = PatchDataset(*discover_split(str(tmp_path)), cfg)
    loader = PatchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    assert loader._native_hw == (64, 64)
    b = next(iter(loader.epoch(0)))
    assert np.asarray(b.image).shape == (4, 64, 64, 3)
    # parity with the PIL path
    img_pil, mask_pil = ds[0]
    idx = list(ds.img_paths).index(ds.img_paths[0])
    np.testing.assert_array_equal(np.asarray(b.image)[0], img_pil)
    np.testing.assert_array_equal(np.asarray(b.mask)[0], mask_pil)
