import os

import jax
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.sweep import run_sweep
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.parallel.mesh import create_mesh
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

TILE = 32


def _model_state():
    cfg = Config(model="unet", img_size=TILE, compute_dtype="float32")
    model = build_model(cfg)
    return model, create_train_state(cfg, model, jax.random.PRNGKey(0))


def test_sweep_over_cohort(tmp_path):
    model, state = _model_state()
    rng = np.random.default_rng(0)
    slides = [
        rng.integers(0, 256, (96, 64, 3), dtype=np.uint8),
        rng.integers(0, 256, (64, 96, 3), dtype=np.uint8),
    ]
    results = run_sweep(model, state, slides, tile=TILE, stride=TILE,
                        batch_size=8, out_dir=str(tmp_path))
    assert [r["slide"] for r in results] == [0, 1]
    assert results[0]["canvas_hw"] == (96, 64)
    mask = np.load(tmp_path / "slide_0000_mask.npy")
    assert mask.shape == (96, 64)
    assert all(0.0 <= r["tumor_fraction"] <= 1.0 for r in results)


@pytest.mark.slow
def test_sweep_sharded_matches_plain():
    model, state = _model_state()
    rng = np.random.default_rng(1)
    slides = [rng.integers(0, 256, (288, 64, 3), dtype=np.uint8)]
    mesh = create_mesh()
    plain = run_sweep(model, state, slides, tile=TILE, stride=16,
                      batch_size=8)
    shard = run_sweep(model, state, slides, tile=TILE, stride=16,
                      batch_size=8, mesh=mesh, sharded=True)
    np.testing.assert_allclose(plain[0]["prob"], shard[0]["prob"], atol=2e-5)


def test_sweep_geojson_export(tmp_path):
    """geojson=True writes per-slide QuPath annotations that rasterize
    back to the saved mask exactly."""
    import jax

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data.geojson import (
        parse_geojson,
        rasterize_shapes,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )

    cfg = Config(model="unet", img_size=TILE, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    slides = [rng.integers(0, 256, (2 * TILE, 2 * TILE, 3), dtype=np.uint8)
              for _ in range(2)]
    out = str(tmp_path / "sweep")
    res = run_sweep(model, state, slides, tile=TILE, batch_size=4,
                    out_dir=out, geojson=True)
    assert len(res) == 2
    for rec in res:
        i = rec["slide"]
        assert "n_regions" in rec
        mask = np.load(os.path.join(out, f"slide_{i:04d}_mask.npy"))
        gj = os.path.join(out, f"slide_{i:04d}_annotations.geojson")
        shapes = parse_geojson(gj)
        re_mask = rasterize_shapes(shapes, *mask.shape)
        assert np.array_equal(re_mask.astype(bool), mask.astype(bool))
    # in-memory mode returns the FeatureCollection on the record
    res2 = run_sweep(model, state, slides[:1], tile=TILE, batch_size=4,
                     geojson=True)
    assert res2[0]["geojson"]["type"] == "FeatureCollection"
