"""cli/extract.py: the headless QuPath patch exporter
(QuPath_WSI_to_Patch.groovy replacement) + slide MPP metadata.

Fixture slides are written with data/tiffwriter.py (real pyramidal
TIFFs through the native reader), annotations with data/geojson.py.
"""

import os
import re

import numpy as np
import pytest
from PIL import Image

from pdac_pathological_image_segmentation_tpu.cli.extract import main
from pdac_pathological_image_segmentation_tpu.data.discovery import (
    discover_split,
)
from pdac_pathological_image_segmentation_tpu.data.geojson import (
    write_geojson,
)
from pdac_pathological_image_segmentation_tpu.data.tiffslide import TiffSlide
from pdac_pathological_image_segmentation_tpu.data.tiffwriter import (
    write_tiff,
)

_DESC = ("Aperio Image Library v12.0.15\r\n"
         "512x512 [0,0 512x512] (240x240) JPEG/RGB Q=30"
         "|AppMag = 20|MPP = 0.25")


def _rect_geojson(path, x0, y0, x1, y1, name="Tumor"):
    ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
    return write_geojson(path, {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {"objectType": "annotation",
                           "classification": {"name": name,
                                              "color": [200, 0, 0]}},
        }],
    })


@pytest.fixture(scope="module")
def slide_and_annotations(tmp_path_factory):
    d = tmp_path_factory.mktemp("extract")
    rng = np.random.default_rng(7)
    img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
    slide_path = str(d / "case01.svs.tiff")
    # pyramid: 512 and 256 levels — downsample 2 hits level 1 exactly
    write_tiff(slide_path, img, tile=128, min_size=128, description=_DESC)
    gj_path = str(d / "case01.geojson")
    _rect_geojson(gj_path, 100, 80, 300, 220)  # level-0 coords
    return slide_path, gj_path, img


def test_slide_mpp_from_description(slide_and_annotations):
    slide_path, _, _ = slide_and_annotations
    with TiffSlide(slide_path) as s:
        assert "Aperio" in s.description
        assert s.mpp == pytest.approx(0.25)


def test_extract_contract_and_labels(slide_and_annotations, tmp_path):
    slide_path, gj_path, img = slide_and_annotations
    out = str(tmp_path / "patches")
    # pixel_size 0.5 / MPP 0.25 -> downsample 2 (Groovy:16 math)
    res = main(["--slide", slide_path, "--annotations", gj_path,
                "--out", out, "--tile", "64", "--workers", "2"])
    assert res["downsample"] == pytest.approx(2.0)
    # 512/2 = 256 export px -> 4x4 full tiles of 64
    assert res["written"] == 16

    # the reference's discovery contract accepts the layout as-is
    img_paths, mask_paths = discover_split(out)
    assert len(img_paths) == len(mask_paths) == 16

    # QuPath TileExporter naming: "{name} [d=..,x=..,y=..,w=..,h=..].png"
    pat = re.compile(r"\[d=2,x=(\d+),y=(\d+),w=128,h=128\]\.png$")
    assert all(pat.search(p) for p in img_paths)
    assert all(p.endswith("-labelled.png") for p in mask_paths)

    # label content: annotation rect (100..300, 80..220) at downsample 2
    # = export-space (50..150, 40..110); check the tile at export (64, 64)
    # -> level-0 offset (128, 128)
    stem = [p for p in mask_paths if "x=128,y=128" in p]
    assert len(stem) == 1
    mask = np.asarray(Image.open(stem[0]))
    assert mask.shape == (64, 64)
    # export pixel (r, c) of this tile covers level-0 y=128+2r, x=128+2c;
    # inside iff center (129+2c, 129+2r) in [100,300)x[80,220)
    rows = 129 + 2 * np.arange(64)
    inside_r = (rows >= 80) & (rows < 220)
    inside_c = (rows >= 100) & (rows < 300)
    want = np.outer(inside_r, inside_c).astype(np.uint8)
    assert np.array_equal(mask, want)

    # image content: downsample 2 hits pyramid level 1 exactly (the
    # writer's 2x box filter)
    stem_img = [p for p in img_paths if "x=128,y=128" in p][0]
    tile_img = np.asarray(Image.open(stem_img))
    with TiffSlide(slide_path) as s:
        # level-0 (128, 128) at level-1 (downsample 2) = (64, 64)
        want_img = s.read_region(1, 64, 64, 64, 64)
    assert np.array_equal(tile_img, want_img)


def test_extract_annotated_only(slide_and_annotations, tmp_path):
    slide_path, gj_path, _ = slide_and_annotations
    out = str(tmp_path / "patches")
    res = main(["--slide", slide_path, "--annotations", gj_path,
                "--out", out, "--tile", "64", "--annotated_only",
                "--workers", "2"])
    # annotation spans export (50..150, 40..110): tiles x in {0,64,128},
    # y in {0,64} -> 6 of 16
    assert res["written"] == 6
    img_paths, mask_paths = discover_split(out)
    assert len(img_paths) == 6
    for p in mask_paths:
        assert np.asarray(Image.open(p)).any()


def test_extract_requires_mpp_or_downsample(tmp_path):
    img = np.zeros((256, 256, 3), np.uint8)
    slide_path = str(tmp_path / "nompp.tiff")
    write_tiff(slide_path, img, tile=128, pyramid=False)  # no description
    with pytest.raises(SystemExit, match="MPP"):
        main(["--slide", slide_path, "--out", str(tmp_path / "o")])
    # explicit --downsample bypasses metadata
    res = main(["--slide", slide_path, "--out", str(tmp_path / "o2"),
                "--downsample", "1", "--tile", "128", "--workers", "1"])
    assert res["written"] == 4
    # --slide_mpp override
    res = main(["--slide", slide_path, "--out", str(tmp_path / "o3"),
                "--slide_mpp", "0.25", "--tile", "128", "--workers", "1"])
    assert res["written"] == 1  # downsample 2 -> 128 export px


def test_extract_label_order_overwrites(slide_and_annotations, tmp_path):
    slide_path, _, _ = slide_and_annotations
    # two overlapping classes: later --label wins in the overlap
    gj = str(tmp_path / "two.geojson")
    write_geojson(gj, {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0, 0], [256, 0], [256, 256], [0, 256], [0, 0]]]},
             "properties": {"classification": {"name": "Stroma"}}},
            {"type": "Feature",
             "geometry": {"type": "Polygon", "coordinates": [
                 [[128, 128], [384, 128], [384, 384], [128, 384],
                  [128, 128]]]},
             "properties": {"classification": {"name": "Tumor"}}},
        ],
    })
    out = str(tmp_path / "patches")
    main(["--slide", slide_path, "--annotations", gj, "--out", out,
          "--tile", "128", "--downsample", "2", "--workers", "1",
          "--label", "Stroma=1", "--label", "Tumor=2"])
    _, mask_paths = discover_split(out)
    m = np.asarray(Image.open(
        [p for p in mask_paths if "x=0,y=0" in p][0]))
    assert m[10, 10] == 1  # Stroma only
    assert m[100, 100] == 2  # overlap -> later label (Tumor)


def test_extract_include_partial(tmp_path):
    img = np.full((200, 200, 3), 128, np.uint8)
    slide_path = str(tmp_path / "small.tiff")
    write_tiff(slide_path, img, tile=128, pyramid=False)
    out = str(tmp_path / "o")
    res = main(["--slide", slide_path, "--out", out, "--downsample", "1",
                "--tile", "128", "--workers", "1"])
    assert res["written"] == 1  # only one full 128-tile fits in 200
    out2 = str(tmp_path / "o2")
    res = main(["--slide", slide_path, "--out", out2, "--downsample", "1",
                "--tile", "128", "--include_partial", "--workers", "1"])
    assert res["written"] == 4  # padded edge tiles included
    imgs, _ = discover_split(out2)
    edge = np.asarray(Image.open(
        [p for p in imgs if "x=128,y=128" in p][0]))
    assert edge.shape == (128, 128, 3)
    assert (edge[:72, :72] == 128).all()  # real pixels
    assert (edge[72:, 72:] == 0).all()  # zero padding outside the slide


def test_extract_trains_end_to_end(slide_and_annotations, tmp_path):
    """The extracted patches feed the training data pipeline directly."""
    slide_path, gj_path, _ = slide_and_annotations
    out = str(tmp_path / "patches")
    main(["--slide", slide_path, "--annotations", gj_path, "--out", out,
          "--tile", "64", "--workers", "2"])
    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        PatchDataset,
    )

    imgs, masks = discover_split(out)
    ds = PatchDataset(imgs, masks, Config(img_size=64))
    image, mask = ds[0]
    assert image.shape == (64, 64, 3) and image.dtype == np.uint8
    assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0, 1}
