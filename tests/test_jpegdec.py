"""Native baseline-JPEG decoder (native/jpegdec.cpp): parity vs PIL across
color spaces / subsampling / restart markers, abbreviated TIFF datastreams
(JPEGTables), and clean rejection of out-of-scope streams (the PIL-fallback
contract of data/tiffslide.py)."""

import ctypes
import io

import numpy as np
import pytest
from PIL import Image

from pdac_pathological_image_segmentation_tpu.data.tiffslide import (
    TiffSlide,
    _get_lib,
)

_JPEG_TILE = 6  # tiffreader.cpp kJpegTile: "fall back to PIL"


def _decode(data, w, h, tables=b"", hint=-1):
    lib = _get_lib()
    out = np.zeros((h, w, 3), np.uint8)
    iw, ih = ctypes.c_int32(0), ctypes.c_int32(0)
    rc = lib.jpeg_decode_rgb(
        tables or None, len(tables), data, len(data),
        out.ctypes.data_as(ctypes.c_char_p), w, h,
        ctypes.byref(iw), ctypes.byref(ih), hint)
    return rc, out, iw.value, ih.value


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        120 + 80 * np.sin(xx / 13.0 + seed) + 30 * np.cos(yy / 7.0),
        90 + 60 * np.cos(xx / 9.0 + yy / 11.0),
        140 + 50 * np.sin(yy / 17.0 - seed),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def _jpeg_bytes(arr, **save_kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("subsampling,quality,tol", [
    ("4:4:4", 95, 3),   # no chroma upsampling: IDCT/rounding differences only
    ("4:2:0", 90, 4),   # centered-bilinear vs libjpeg fancy upsampling
    ("4:2:2", 85, 4),
    ("4:4:4", 50, 3),
])
def test_ycbcr_parity_vs_pil(subsampling, quality, tol):
    img = _smooth(96, 80)
    data = _jpeg_bytes(img, quality=quality, subsampling=subsampling)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, iw, ih = _decode(data, 80, 96)
    assert rc == 0 and (iw, ih) == (80, 96)
    d = np.abs(ours.astype(int) - pil.astype(int))
    assert d.max() <= tol, f"max diff {d.max()}"
    assert d.mean() < 0.5


def test_noise_image_parity():
    # random noise at 4:4:4: every AC coefficient populated, all Huffman
    # code paths and ZRL runs exercised
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    data = _jpeg_bytes(img, quality=95, subsampling="4:4:4")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, _, _ = _decode(data, 64, 64)
    assert rc == 0
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 3


def test_grayscale_single_component():
    img = _smooth(80, 72)[:, :, 0]
    data = _jpeg_bytes(img, quality=90)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, _, _ = _decode(data, 72, 80)
    assert rc == 0
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_restart_markers():
    img = _smooth(128, 120, seed=2)
    data = _jpeg_bytes(img, quality=92, subsampling="4:2:0",
                       restart_marker_blocks=2)
    assert b"\xff\xdd" in data  # DRI present
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, _, _ = _decode(data, 120, 128)
    assert rc == 0
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 4


def test_non_multiple_of_mcu_dimensions():
    # 67x61 at 4:2:0: partial MCUs on both edges
    img = _smooth(67, 61, seed=3)
    data = _jpeg_bytes(img, quality=95, subsampling="4:2:0")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, iw, ih = _decode(data, 61, 67)
    assert rc == 0 and (iw, ih) == (61, 67)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 4


@pytest.mark.parametrize("subsampling,quality", [
    ("4:4:4", 90), ("4:2:0", 85), ("4:2:2", 95),
])
def test_progressive_parity_vs_pil(subsampling, quality):
    """Progressive (SOF2) streams decode natively: spectral-selection +
    successive-approximation scans accumulate into coefficient buffers,
    IDCT at EOI."""
    img = _smooth(96, 80, seed=4)
    data = _jpeg_bytes(img, quality=quality, progressive=True,
                       subsampling=subsampling)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, iw, ih = _decode(data, 80, 96)
    assert rc == 0 and (iw, ih) == (80, 96)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 4


def test_progressive_grayscale_exact():
    img = _smooth(80, 72)[:, :, 0]
    data = _jpeg_bytes(img, quality=90, progressive=True)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    rc, ours, _, _ = _decode(data, 72, 80)
    assert rc == 0
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_12bit_rejected_for_fallback():
    """Out-of-scope precision must still route to PIL: rewrite a baseline
    stream's SOF precision byte to 12."""
    img = _smooth(64, 64)
    d = bytearray(_jpeg_bytes(img, quality=90))
    sof = bytes(d).find(b"\xff\xc0")
    d[sof + 4] = 12  # precision field
    rc, _, _, _ = _decode(bytes(d), 64, 64)
    assert rc == 4


def test_truncated_scan_rejected():
    img = _smooth(64, 64)
    data = _jpeg_bytes(img, quality=90)
    rc, _, _, _ = _decode(data[: len(data) // 2], 64, 64)
    assert rc in (3, 7)  # corrupt / decode error, never "success"


def test_garbage_rejected():
    rc, _, _, _ = _decode(b"\xff\xd8" + b"\x00" * 100, 8, 8)
    assert rc in (3, 7)


def test_tiff_jpeg_tiles_decode_natively(tmp_path):
    """PIL-written JPEG TIFF (RGB component ids + JPEGTables tag): the C
    tile path must decode it itself — rc 0, not the kJpegTile fallback."""
    img = _smooth(300, 520, seed=1)
    path = str(tmp_path / "j.tiff")
    Image.fromarray(img).save(path, compression="jpeg", quality=95)
    with TiffSlide(path) as s:
        assert s.level_info[0]["compression"] == 7
        assert s.level_info[0]["jpeg_tables_len"] > 0
        lib = _get_lib()
        info = s.level_info[0]
        out = np.empty((info["tile_h"], info["tile_w"], 3), np.uint8)
        rc = lib.tiff_read_tile(s._h, 0, 0, 0,
                                out.ctypes.data_as(ctypes.c_char_p))
        assert rc == 0, f"native JPEG tile decode fell back (rc={rc})"
        # and it matches the PIL-spliced decode of the same tile
        pil_tile = s._decode_jpeg_tile(0, 0, 0)
        assert np.abs(out.astype(int) - pil_tile.astype(int)).max() <= 3

        # full-region read runs on the native thread pool now
        r = s.read_region(0, 0, 0, 520, 300)
    err = np.abs(r.astype(np.int16) - img.astype(np.int16)).mean()
    assert err < 1.0


@pytest.mark.fuzz
def test_fuzz_mutated_streams_never_crash():
    """Robustness smoke (a 21k-case ASan/UBSan fuzz of this generator ran
    clean offline; this keeps a fast regression in the suite): randomly
    mutated/truncated/spliced streams must return an error code or decode,
    never crash or hang."""
    import random

    rng = random.Random(0)
    img = _smooth(64, 64)
    seeds = [
        bytearray(_jpeg_bytes(img, quality=90)),
        bytearray(_jpeg_bytes(img, quality=90, subsampling="4:2:0")),
        bytearray(_jpeg_bytes(img, quality=50, subsampling="4:2:2",
                              restart_marker_blocks=2)),
        bytearray(_jpeg_bytes(img, quality=85, progressive=True,
                              subsampling="4:2:0")),
    ]
    for _ in range(300):
        s = bytearray(rng.choice(seeds))
        op = rng.random()
        if op < 0.5:
            for _ in range(rng.randint(1, 8)):
                s[rng.randrange(len(s))] = rng.randrange(256)
        elif op < 0.75:
            s = s[:rng.randrange(2, len(s))]
        else:
            i = rng.randrange(len(s))
            j = rng.randrange(len(s))
            s = (s[:i]
                 + bytes(rng.randrange(256) for _ in range(rng.randint(1, 64)))
                 + s[j:])
        rc, _, _, _ = _decode(bytes(s), 64, 64)
        assert rc in (0, 3, 4, 5, 7)
    for _ in range(100):
        t = bytes(rng.randrange(256) for _ in range(rng.randint(0, 300)))
        rc, _, _, _ = _decode(bytes(seeds[0]), 64, 64,
                              tables=b"\xff\xd8" + t + b"\xff\xd9")
        assert rc in (0, 3, 4, 5, 7)


def test_partial_scan_rejected_for_fallback():
    """A multi-scan sequential stream (SOS over 1 of 3 frame components)
    must return kUnsupported (PIL fallback), never decode one scan and
    report success with zeroed chroma."""
    img = _smooth(96, 80)
    d = bytearray(_jpeg_bytes(img, quality=90, subsampling="4:4:4"))
    sos = bytes(d).find(b"\xff\xda")
    ln = (d[sos + 2] << 8) | d[sos + 3]
    hdr = d[sos + 4:sos + 2 + ln]
    new_sos = b"\xff\xda\x00\x08\x01" + bytes(hdr[1:3]) + b"\x00\x3f\x00"
    d3 = bytes(d[:sos]) + new_sos + bytes(d[sos + 2 + ln:])
    rc, _, _, _ = _decode(d3, 80, 96)
    assert rc == 4


def test_truncation_before_eoi_rejected():
    """Entropy data cut short but with an intact EOI marker: phantom-bit
    accounting must flag it instead of serving garbage tail rows as OK."""
    img = _smooth(96, 80)
    d = _jpeg_bytes(img, quality=90)
    sos = d.find(b"\xff\xda")
    cut = sos + (len(d) - sos) // 2
    rc, _, _, _ = _decode(d[:cut] + b"\xff\xd9", 80, 96)
    assert rc in (3, 7)


def test_color_hint_semantics():
    """TIFF-photometric hint: breaks the tie for markerless streams, but
    in-stream evidence (JFIF / component ids) takes precedence."""
    img = _smooth(96, 80)
    d = _jpeg_bytes(img, quality=90)  # PIL: JFIF APP0, ids 1,2,3, YCbCr
    pil = np.asarray(Image.open(io.BytesIO(d)).convert("RGB"))
    for hint in (-1, 0, 1):  # JFIF wins: every hint decodes as YCbCr
        rc, ours, _, _ = _decode(d, 80, 96, hint=hint)
        assert rc == 0
        assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 3, hint

    # strip the JFIF APP0 -> markerless ids-1,2,3 stream: hint decides
    app0 = d.find(b"\xff\xe0")
    ln = (d[app0 + 2] << 8) | d[app0 + 3]
    bare = d[:app0] + d[app0 + 2 + ln:]
    rc1, as_ycc, _, _ = _decode(bare, 80, 96, hint=1)
    rc0, as_rgb, _, _ = _decode(bare, 80, 96, hint=0)
    assert rc1 == 0 and rc0 == 0
    assert np.abs(as_ycc.astype(int) - pil.astype(int)).max() <= 3
    assert np.abs(as_rgb.astype(int) - pil.astype(int)).max() > 20


def test_aperio_jpeg2000_tiles_fall_back_to_pil(tmp_path):
    """Aperio SVS J2K tiles (compression 33005): the native reader hands
    the raw codestream to PIL/openjpeg per tile instead of erroring."""
    import struct

    img = _smooth(48, 64, seed=6)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG2000", quality_mode="lossless")
    payload = buf.getvalue()

    # minimal classic little-endian TIFF: one strip, compression 33005
    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    ifd_off = 8
    n_entries = 9
    data_off = ifd_off + 2 + n_entries * 12 + 4
    ifd = b"".join([
        entry(256, 4, 1, 64),          # width
        entry(257, 4, 1, 48),          # height
        entry(258, 3, 1, 8),           # bits per sample (count 1: all 8)
        entry(259, 3, 1, 33005),       # Aperio J2K RGB
        entry(262, 3, 1, 2),           # photometric RGB
        entry(273, 4, 1, data_off),    # strip offset
        entry(277, 3, 1, 3),           # samples per pixel
        entry(278, 4, 1, 48),          # rows per strip
        entry(279, 4, 1, len(payload)),  # strip byte count
    ])
    tiff = (b"II*\0" + struct.pack("<I", ifd_off)
            + struct.pack("<H", n_entries) + ifd + struct.pack("<I", 0)
            + payload)
    path = tmp_path / "j2k.tiff"
    path.write_bytes(tiff)

    with TiffSlide(str(path)) as s:
        assert s.level_info[0]["compression"] == 33005
        tile = s.read_tile(0, 0, 0)
        region = s.read_region(0, 0, 0, 64, 48)
    np.testing.assert_array_equal(tile[:48, :64], img)  # lossless J2K
    np.testing.assert_array_equal(region, img)
