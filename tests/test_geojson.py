"""QuPath GeoJSON interop: exact polygonization, schema, rasterization.

The load-bearing property is the bit-exact round trip
``rasterize_shapes(mask_to_polygons(m)) == m`` — polygon rings follow
pixel boundaries, so tracing and refilling must reproduce any binary
mask exactly.
"""

import json

import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.data.geojson import (
    _signed_area,
    mask_to_polygons,
    parse_geojson,
    polygons_to_geojson,
    rasterize_shapes,
    write_geojson,
)


def _roundtrip(mask):
    polys = mask_to_polygons(mask)
    shapes = [(1, [ext] + holes) for ext, holes in polys]
    return rasterize_shapes(shapes, *mask.shape).astype(bool)


def test_rectangle_exact():
    m = np.zeros((16, 20), bool)
    m[3:9, 4:15] = True
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    ext, holes = polys[0]
    assert holes == []
    # collinear collapse: a rectangle is 4 corners + closing point
    assert ext.shape == (5, 2)
    assert _signed_area(ext) == pytest.approx(6 * 11)
    xs, ys = ext[:, 0], ext[:, 1]
    assert xs.min() == 4 and xs.max() == 15
    assert ys.min() == 3 and ys.max() == 9
    assert np.array_equal(ext[0], ext[-1])


def test_donut_has_hole():
    m = np.zeros((20, 20), bool)
    m[2:18, 2:18] = True
    m[6:12, 7:14] = False
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    ext, holes = polys[0]
    assert len(holes) == 1
    assert _signed_area(ext) == pytest.approx(16 * 16)
    assert _signed_area(holes[0]) == pytest.approx(-(6 * 7))
    assert np.array_equal(_roundtrip(m), m)


def test_nested_donuts_hole_assignment():
    # island inside a hole inside a region: 3 polygons traced, the island
    # exterior must NOT swallow the outer region's hole
    m = np.zeros((30, 30), bool)
    m[1:29, 1:29] = True
    m[5:25, 5:25] = False
    m[10:20, 10:20] = True
    polys = mask_to_polygons(m)
    assert len(polys) == 2
    areas = sorted(abs(_signed_area(e)) for e, _ in polys)
    assert areas == [pytest.approx(100), pytest.approx(28 * 28)]
    outer = max(polys, key=lambda p: _signed_area(p[0]))
    assert len(outer[1]) == 1
    inner = min(polys, key=lambda p: _signed_area(p[0]))
    assert inner[1] == []
    assert np.array_equal(_roundtrip(m), m)


def test_multiple_blobs():
    m = np.zeros((12, 12), bool)
    m[1:4, 1:4] = True
    m[6:11, 5:10] = True
    polys = mask_to_polygons(m)
    assert len(polys) == 2
    # sorted by descending area
    assert _signed_area(polys[0][0]) > _signed_area(polys[1][0])


def test_diagonal_pixels_are_separate_polygons():
    # 4-connected foreground: checkerboard contact traces 2 rings
    m = np.zeros((4, 4), bool)
    m[1, 1] = m[2, 2] = True
    polys = mask_to_polygons(m)
    assert len(polys) == 2
    for ext, holes in polys:
        assert holes == []
        assert _signed_area(ext) == pytest.approx(1.0)
    assert np.array_equal(_roundtrip(m), m)


def test_diagonal_pinch_roundtrips():
    # hole connected to the outside through a diagonal gap: background is
    # 8-connected under the right-turn rule, so the "hole" merges with the
    # exterior into one self-touching ring — the fill must still be exact
    m = np.array([
        [1, 1, 1, 0],
        [1, 0, 1, 0],
        [1, 1, 0, 0],
        [1, 1, 1, 1],
    ], bool)
    assert np.array_equal(_roundtrip(m), m)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_mask_roundtrip_exact(seed):
    rng = np.random.default_rng(seed)
    # blobby mask: threshold smoothed noise
    noise = rng.random((48, 64))
    k = np.ones((5, 5)) / 25.0
    sm = np.zeros_like(noise)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            sm += np.roll(np.roll(noise, dy, 0), dx, 1) * k[dy + 2, dx + 2]
    m = sm > np.median(sm)
    assert np.array_equal(_roundtrip(m), m)


def test_empty_and_full_masks():
    assert mask_to_polygons(np.zeros((8, 8), bool)) == []
    polys = mask_to_polygons(np.ones((8, 8), bool))
    assert len(polys) == 1
    assert _signed_area(polys[0][0]) == pytest.approx(64)


def test_min_area_filters_specks():
    m = np.zeros((16, 16), bool)
    m[1, 1] = True  # 1-px speck
    m[4:12, 4:12] = True  # 64-px blob
    polys = mask_to_polygons(m, min_area=2.0)
    assert len(polys) == 1
    assert _signed_area(polys[0][0]) == pytest.approx(64)
    # min_area is in scaled units²
    polys = mask_to_polygons(m, min_area=2.0, scale=4.0)
    assert len(polys) == 2


def test_scale_and_offset_to_level0_coords():
    m = np.zeros((8, 8), bool)
    m[2:4, 3:6] = True
    polys = mask_to_polygons(m, scale=4.0, offset=(100.0, 200.0))
    ext = polys[0][0]
    assert ext[:, 0].min() == pytest.approx(3 * 4 + 100)
    assert ext[:, 0].max() == pytest.approx(6 * 4 + 100)
    assert ext[:, 1].min() == pytest.approx(2 * 4 + 200)
    assert ext[:, 1].max() == pytest.approx(4 * 4 + 200)


def test_simplify_reduces_staircase():
    m = np.tri(32, 32, dtype=bool)  # diagonal staircase
    exact = mask_to_polygons(m)[0][0]
    simp = mask_to_polygons(m, simplify_tol=1.0)[0][0]
    assert simp.shape[0] < exact.shape[0] / 3
    assert np.array_equal(simp[0], simp[-1])  # still closed


def test_geojson_schema_is_qupath_shaped(tmp_path):
    m = np.zeros((10, 10), bool)
    m[2:8, 2:8] = True
    m[4:6, 4:6] = False
    fc = polygons_to_geojson(
        mask_to_polygons(m), class_name="Tumor", color=(200, 0, 0),
        measurements={"tumor_fraction": 0.32},
    )
    assert fc["type"] == "FeatureCollection"
    (feat,) = fc["features"]
    assert feat["type"] == "Feature"
    assert feat["geometry"]["type"] == "Polygon"
    assert len(feat["geometry"]["coordinates"]) == 2  # exterior + hole
    for ring in feat["geometry"]["coordinates"]:
        assert ring[0] == ring[-1]
    props = feat["properties"]
    assert props["objectType"] == "annotation"
    assert props["classification"]["name"] == "Tumor"
    assert props["classification"]["color"] == [200, 0, 0]
    assert props["measurements"]["tumor_fraction"] == 0.32
    p = write_geojson(str(tmp_path / "a.geojson"), fc)
    with open(p) as f:
        assert json.load(f) == fc


def test_parse_geojson_roundtrip_and_label_map():
    m = np.zeros((12, 12), bool)
    m[1:6, 1:6] = True
    fc = polygons_to_geojson(mask_to_polygons(m), class_name="Tumor")
    shapes = parse_geojson(fc, label_map={"Tumor": 1})
    assert len(shapes) == 1
    assert shapes[0][0] == 1
    out = rasterize_shapes(shapes, 12, 12)
    assert np.array_equal(out.astype(bool), m)
    # unknown class → default_label; or skipped when default is None
    fc2 = polygons_to_geojson(mask_to_polygons(m), class_name="Stroma")
    assert parse_geojson(fc2, label_map={"Tumor": 1},
                         default_label=7)[0][0] == 7
    assert parse_geojson(fc2, label_map={"Tumor": 1},
                         default_label=None) == []


def test_parse_geojson_multipolygon_and_bare_geometry():
    geom = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
            [[[6, 6], [9, 6], [9, 9], [6, 9], [6, 6]]],
        ],
    }
    shapes = parse_geojson(geom)
    assert len(shapes) == 2
    out = rasterize_shapes(shapes, 10, 10)
    assert out[2, 2] == 1 and out[7, 7] == 1 and out[5, 5] == 0
    # unclosed rings are closed on parse
    shapes = parse_geojson(
        {"type": "Polygon", "coordinates": [[[0, 0], [3, 0], [3, 3], [0, 3]]]}
    )
    assert np.allclose(shapes[0][1][0][0], shapes[0][1][0][-1])


def test_rasterize_downsample_and_label_order():
    # two overlapping classes at 2× downsample: later shape overwrites
    # (the Groovy exporter's "order matters", QuPath_WSI_to_Patch.groovy:22)
    sq = lambda x0, y0, x1, y1: np.asarray(  # noqa: E731
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    shapes = [(1, [sq(0, 0, 16, 16)]), (2, [sq(8, 8, 24, 24)])]
    out = rasterize_shapes(shapes, 12, 12, scale=2.0)
    assert out[1, 1] == 1
    assert out[5, 5] == 2  # overlap → later label
    assert out[10, 10] == 2
    assert out[1, 10] == 0
    # offset shifts the window
    out2 = rasterize_shapes(shapes, 12, 12, scale=2.0, offset=(8.0, 8.0))
    assert out2[0, 0] == 2


def test_rasterize_fractional_polygon_centers():
    # non-integer coords: pixel centers decide membership
    tri = np.asarray([[0.0, 0.0], [8.0, 0.0], [0.0, 8.0], [0.0, 0.0]])
    out = rasterize_shapes([(1, [tri])], 8, 8)
    # center (x+0.5, y+0.5) vs x+y<8: strictly-inside centers are x+y<7,
    # centers exactly ON the hypotenuse (x+y=7) count inside by the
    # half-open tie convention → filled iff x+y ≤ 7
    want = np.add.outer(np.arange(8), np.arange(8)) <= 7
    assert np.array_equal(out.astype(bool), want)


def test_clean_mask_min_region_and_fill_holes():
    from pdac_pathological_image_segmentation_tpu.data.geojson import (
        clean_mask,
    )

    m = np.zeros((32, 32), bool)
    m[2:22, 2:22] = True      # 400-px region
    m[5:8, 5:8] = False       # 9-px hole (small)
    m[10:20, 10:20] = False   # 100-px hole (big)
    m[26, 26] = True          # 1-px speck

    # identity with both thresholds off
    assert np.array_equal(clean_mask(m), m)

    out = clean_mask(m, min_area=4.0)
    assert not out[26, 26]                  # speck dropped
    assert not out[6, 6] and not out[15, 15]  # holes untouched

    out = clean_mask(m, fill_holes_area=50.0)
    assert out[6, 6]        # small hole filled
    assert not out[15, 15]  # big hole kept
    assert out[26, 26]      # speck kept

    out = clean_mask(m, min_area=4.0, fill_holes_area=np.inf)
    assert out[6, 6] and out[15, 15] and not out[26, 26]
    assert out.dtype == np.bool_

    u8 = clean_mask(m.astype(np.uint8), min_area=4.0)
    assert u8.dtype == np.uint8 and set(np.unique(u8)) <= {0, 1}
