"""Portable serving artifacts (``infer/export.py``).

The reference's deployment story is unpickling ``best.pth`` into the
Python model class (``/root/reference/test.py:94-135``); the export path
replaces it with a self-contained ``jax.export`` StableHLO artifact.
Pinned here: exported == direct infer step (last-ulp), symbolic batch
serves multiple batch sizes from one artifact, the artifact is
self-contained bytes (roundtrips through disk with no model objects),
int8 export matches the in-process quantized step, and the CLI writes a
loadable file.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.export import (
    ServingArtifact,
    calib_batches_from_dir,
    export_serving_artifact,
    load_serving_artifact,
)
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)
from pdac_pathological_image_segmentation_tpu.train.steps import make_infer_step

TILE = 64


def _cfg(**kw):
    base = dict(model="unet", backbone="resnet18", img_size=TILE,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def cfg_state():
    cfg = _cfg()
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    return cfg, model, state


@pytest.fixture(scope="module")
def artifact_path(cfg_state, tmp_path_factory):
    cfg, _, state = cfg_state
    path = str(tmp_path_factory.mktemp("export") / "model.pdacsrv")
    size = export_serving_artifact(cfg, state, path, platforms=("cpu",))
    assert size > 0
    return path


def test_exported_matches_direct_step(cfg_state, artifact_path):
    cfg, model, state = cfg_state
    infer = load_serving_artifact(artifact_path)
    assert isinstance(infer, ServingArtifact)
    assert infer.tile == TILE
    assert infer.platforms == ("cpu",)
    assert infer.meta["model"] == "unet"
    assert infer.meta["backbone"] == "resnet18"
    assert infer.meta["int8"] is False

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, TILE, TILE, 3), dtype=np.uint8)
    direct = make_infer_step(model, TILE)(state, jnp.asarray(images))
    out = infer(images)
    # the symbolic-batch program fuses/reassociates slightly differently
    # from the static-shape jit — identical math, last-ulp float drift
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               atol=1e-5, rtol=0)


def test_symbolic_batch_serves_any_size(artifact_path):
    infer = load_serving_artifact(artifact_path)
    rng = np.random.default_rng(1)
    for bs in (1, 3, 7):
        images = rng.integers(0, 256, (bs, TILE, TILE, 3), dtype=np.uint8)
        out = infer(images)
        assert out.shape == (bs, TILE, TILE)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_pinned_batch_rejects_other_sizes(cfg_state, tmp_path):
    cfg, _, state = cfg_state
    path = str(tmp_path / "pinned.pdacsrv")
    export_serving_artifact(cfg, state, path, batch=2, platforms=("cpu",))
    infer = load_serving_artifact(path)
    assert infer.in_shape[0] == 2
    ok = np.zeros((2, TILE, TILE, 3), np.uint8)
    assert infer(ok).shape == (2, TILE, TILE)
    with pytest.raises(Exception):
        infer(np.zeros((3, TILE, TILE, 3), np.uint8))


def test_aot_compile_matches_call(artifact_path):
    """aot() pins the serving compiler options (TPU) or falls back to the
    default compile (CPU, options rejected) — output equals __call__."""
    infer = load_serving_artifact(artifact_path)
    fn = infer.aot(2)
    rng = np.random.default_rng(4)
    images = rng.integers(0, 256, (2, TILE, TILE, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(fn(jnp.asarray(images))), np.asarray(infer(images)),
        atol=1e-5, rtol=0)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.pdacsrv"
    p.write_bytes(b"definitely not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_serving_artifact(str(p))


@pytest.mark.slow
def test_int8_export_matches_quantized_step(cfg_state, tmp_path):
    from pdac_pathological_image_segmentation_tpu.infer.quantized import (
        make_quantized_infer_fn,
        quantize_from_config,
    )

    cfg, _, state = cfg_state
    rng = np.random.default_rng(2)
    calib = [rng.integers(0, 256, (2, TILE, TILE, 3), dtype=np.uint8)]
    path = str(tmp_path / "int8.pdacsrv")
    export_serving_artifact(cfg, state, path, platforms=("cpu",),
                            int8=True, calib_batches=calib)
    infer = load_serving_artifact(path)
    assert infer.meta["int8"] is True

    bundle, forward = quantize_from_config(
        cfg, state.params, state.batch_stats, calib)
    qfn = make_quantized_infer_fn(state.params, state.batch_stats, bundle,
                                  TILE, forward=forward)
    images = rng.integers(0, 256, (3, TILE, TILE, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(infer(images)),
        np.asarray(qfn(None, jnp.asarray(images))), atol=1e-5, rtol=0)


def test_int8_export_requires_calibration(cfg_state, tmp_path):
    cfg, _, state = cfg_state
    with pytest.raises(ValueError, match="calibration"):
        export_serving_artifact(cfg, state, str(tmp_path / "x"),
                                platforms=("cpu",), int8=True)


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    """End-to-end: train-state checkpoint on disk → CLI → loadable
    artifact that serves."""
    import yaml

    from pdac_pathological_image_segmentation_tpu.cli.export import main
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )

    data = tmp_path / "data"
    generate_synthetic_patches(str(data), n=4, size=TILE, seed=0)
    cfg = _cfg(test_path=str(data))
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    pth = tmp_path / "pth"
    save_checkpoint(str(pth), state, 0, 0.0,
                    {"lr": 1e-3, "best": 0.0, "num_bad_epochs": 0},
                    {"patience": 3, "delta": 0.0, "best_score": 0.0,
                     "counter": 0, "early_stop": False}, is_best=False)

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "model": "unet", "backbone": "resnet18", "img_size": TILE,
        "compute_dtype": "float32", "test_path": str(data)}))
    out = tmp_path / "model.pdacsrv"
    res = main(["--config", str(cfg_yaml), "--pth_path", str(pth),
                "--out", str(out), "--platforms", "cpu"])
    assert res["bytes"] == out.stat().st_size
    infer = load_serving_artifact(str(out))
    probs = infer(np.zeros((2, TILE, TILE, 3), np.uint8))
    assert probs.shape == (2, TILE, TILE)


class _FakeSource:
    """Minimal tile source (len/get/canvas_hw) for runner tests."""

    def __init__(self, tiles, coords, canvas_hw):
        self._tiles, self._coords = tiles, coords
        self.canvas_hw = canvas_hw

    def __len__(self):
        return len(self._tiles)

    def get(self, i):
        return self._tiles[i], self._coords[i]


def test_wsi_runner_serves_from_artifact(cfg_state, artifact_path):
    """SlidingWindowInference with the artifact as ``infer_step`` — the
    overlay ``--artifact`` wiring: model=None, state=None, weights live
    only in the artifact — matches the model/state runner."""
    from pdac_pathological_image_segmentation_tpu.infer.export import (
        load_serving_artifact,
    )
    from pdac_pathological_image_segmentation_tpu.infer.wsi import (
        SlidingWindowInference,
    )

    cfg, model, state = cfg_state
    rng = np.random.default_rng(3)
    tiles = [rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
             for _ in range(4)]
    coords = [(0, 0), (0, TILE), (TILE, 0), (TILE, TILE)]
    src = _FakeSource(tiles, coords, (2 * TILE, 2 * TILE))

    art = load_serving_artifact(artifact_path)
    from_artifact = SlidingWindowInference(
        None, None, tile=TILE, batch_size=2, blend="uniform",
        num_workers=1, infer_step=lambda state, images: art(images))
    from_state = SlidingWindowInference(
        model, state, tile=TILE, batch_size=2, blend="uniform",
        num_workers=1)
    prob_a, mask_a = from_artifact.run(src)
    prob_s, mask_s = from_state.run(src)
    np.testing.assert_allclose(prob_a, prob_s, atol=1e-5, rtol=0)
    np.testing.assert_array_equal(mask_a, mask_s)


def test_sweep_from_artifact(cfg_state, artifact_path):
    """Cohort sweep served from an artifact (model=None/state=None)
    matches the model/state sweep."""
    from pdac_pathological_image_segmentation_tpu.infer.export import (
        load_serving_artifact,
    )
    from pdac_pathological_image_segmentation_tpu.infer.sweep import run_sweep

    cfg, model, state = cfg_state
    rng = np.random.default_rng(5)
    slides = [rng.integers(0, 256, (2 * TILE, 2 * TILE, 3), dtype=np.uint8)
              for _ in range(2)]
    art = load_serving_artifact(artifact_path)
    res_a = run_sweep(None, None, slides, tile=TILE, batch_size=4,
                      infer_step=lambda s, im: art(im))
    res_s = run_sweep(model, state, slides, tile=TILE, batch_size=4)
    assert len(res_a) == len(res_s) == 2
    for a, s in zip(res_a, res_s):
        np.testing.assert_allclose(a["prob"], s["prob"], atol=1e-5, rtol=0)
        assert a["tumor_fraction"] == pytest.approx(s["tumor_fraction"])


def test_overlay_cli_artifact_validation(tmp_path):
    import yaml

    from pdac_pathological_image_segmentation_tpu.cli.overlay import main

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "model": "unet", "backbone": "resnet18", "img_size": TILE,
        "compute_dtype": "float32"}))
    base = ["--config", str(cfg_yaml), "--save_path", str(tmp_path / "o")]
    with pytest.raises(SystemExit, match="export time"):
        main(base + ["--artifact", "x.pdacsrv", "--int8"])
    with pytest.raises(SystemExit, match="--banded"):
        main(base + ["--artifact", "x.pdacsrv", "--sharded"])
    with pytest.raises(SystemExit, match="--pth_path or --artifact"):
        main(base)


def test_calib_batches_from_dir(tmp_path):
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )

    generate_synthetic_patches(str(tmp_path), n=5, size=32, seed=1)
    batches = calib_batches_from_dir(str(tmp_path), tile=TILE, n=5, batch=2)
    assert sum(b.shape[0] for b in batches) == 5
    for b in batches:
        assert b.shape[1:] == (TILE, TILE, 3) and b.dtype == np.uint8


def test_overlay_cli_geojson_export(cfg_state, artifact_path, tmp_path):
    """Full overlay CLI over a real pyramidal slide at --level 1 with
    --geojson: the exported QuPath annotations, rasterized back at the
    level's downsample, reproduce the predicted mask exactly."""
    import yaml

    from pdac_pathological_image_segmentation_tpu.cli.overlay import main
    from pdac_pathological_image_segmentation_tpu.data.geojson import (
        parse_geojson,
        rasterize_shapes,
    )
    from pdac_pathological_image_segmentation_tpu.data.tiffwriter import (
        write_tiff,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (4 * TILE, 4 * TILE, 3), dtype=np.uint8)
    slide_path = str(tmp_path / "s.tiff")
    write_tiff(slide_path, img, tile=2 * TILE, min_size=2 * TILE)
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "model": "unet", "backbone": "resnet18", "img_size": TILE,
        "compute_dtype": "float32", "batch_size": 4, "num_worker": 1}))
    out = str(tmp_path / "o")
    res = main(["--config", str(cfg_yaml), "--save_path", out,
                "--artifact", artifact_path, "--slide", slide_path,
                "--level", "1", "--geojson"])
    assert res["n_tiles"] > 0

    import os

    prob = np.load(os.path.join(out, "probability_map.npy"))
    assert prob.shape == (2 * TILE, 2 * TILE)  # level-1 resolution
    mask = prob >= 0.5
    shapes = parse_geojson(os.path.join(out, "annotations.geojson"))
    # coordinates are level-0; rasterizing back onto the level-1 grid at
    # the level downsample (2) must reproduce the mask bit-for-bit
    re_mask = rasterize_shapes(shapes, *mask.shape, scale=2.0)
    assert np.array_equal(re_mask.astype(bool), mask)
