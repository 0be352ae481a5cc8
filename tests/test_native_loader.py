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


def _write_png(path, arr, filters, color_type):
    """Hand-assemble a PNG with a FORCED per-row filter sequence.

    PIL's encoder picks filters heuristically, so the SIMD unfilter
    kernels (native/pngloader.cpp: SSSE3 Sub prefix-sum, pixel-wise
    Average/Paeth) would go unexercised by encoder-chosen files alone.
    """
    import struct
    import zlib

    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    rows = arr.reshape(h, w * c).astype(np.int32)
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        row = rows[y]
        ft = filters[y % len(filters)]
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            filt = row - pred
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


@pytest.mark.parametrize("shape,color_type", [
    ((67, 61, 3), 2),   # RGB, odd width → SIMD tails exercised
    ((64, 64, 4), 6),   # RGBA
    ((33, 49), 0),      # gray
])
@pytest.mark.parametrize("filters", [
    [1], [2], [3], [4], [0, 1, 2, 3, 4],
])
def test_forced_filters_native_bit_exact(tmp_path, shape, color_type,
                                         filters):
    import ctypes

    rng = np.random.default_rng(hash((shape, tuple(filters))) % 2**32)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    name = f"f{'-'.join(map(str, filters))}.png"
    _write_png(tmp_path / name, arr, filters, color_type)
    # sanity: PIL agrees the file is valid and holds `arr`
    pil = np.asarray(Image.open(tmp_path / name))
    np.testing.assert_array_equal(pil, arr)

    # call the C entry point directly so a PIL fallback can't mask a
    # native decode bug
    lib = native_loader._get_lib()
    assert lib is not None
    h, w = shape[:2]
    c = 1 if len(shape) == 2 else shape[2]
    out = np.empty((1, h, w, c), np.uint8)
    status = np.zeros(1, np.int32)
    paths = (ctypes.c_char_p * 1)(str(tmp_path / name).encode())
    failures = lib.decode_png_batch(
        paths, 1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c, 1, status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert failures == 0 and status[0] == 0
    np.testing.assert_array_equal(out[0].reshape(shape), arr)


def test_truncated_file_rejected(tmp_path):
    arr = np.zeros((16, 16, 3), np.uint8)
    _write_png(tmp_path / "ok.png", arr, [4], 2)
    data = open(tmp_path / "ok.png", "rb").read()
    # drop the last 24 bytes of the file: the IDAT chunk framing itself is
    # now short, so the chunk parser must reject the file
    open(tmp_path / "trunc.png", "wb").write(data[:-24])
    with pytest.raises(IOError):
        native_loader.decode_batch([str(tmp_path / "trunc.png")], 16, 16, 3)


def test_truncated_zlib_stream_rejected(tmp_path):
    # Valid chunk framing, truncated DEFLATE payload: unlike the file-level
    # truncation above, this reaches the streaming-inflate loop, which must
    # fail cleanly (y < height at stream end), not hang or report the
    # partially-unfiltered rows as success.
    import struct
    import zlib

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (16, 16, 3), np.uint8)
    raw = bytearray()
    for y in range(16):
        raw.append(0)
        raw.extend(arr[y].tobytes())
    z = zlib.compress(bytes(raw))

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", z[:len(z) // 2])  # well-framed, half the stream
           + chunk(b"IEND", b""))
    open(tmp_path / "zcut.png", "wb").write(png)
    with pytest.raises(IOError):
        native_loader.decode_batch([str(tmp_path / "zcut.png")], 16, 16, 3)
