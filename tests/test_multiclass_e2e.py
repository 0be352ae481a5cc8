"""Multi-class (num_classes=3) end-to-end integration: the same
train CLI → eval CLI → overlay CLI chain the binary path exercises
(``tests/test_train_integration.py``), driven on the 8-device CPU mesh
with softmax/argmax semantics throughout (VERDICT r4 item 7).

The reference is binary-only (``util.py:6-26``); multi-class is the
BASELINE.json config #2 extension — Dice+CE loss (``train/objective.py``),
macro-Dice score, per-class softmax canvases and an argmax class map out
of the overlay CLI (``ops/stitch.py`` channelled canvases).
"""

import os

import numpy as np
import pytest
import yaml

from pdac_pathological_image_segmentation_tpu.data.synthetic import (
    generate_synthetic_patches,
)

NUM_CLASSES = 3


@pytest.fixture(scope="module")
def mc_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mc_data")
    for split, n, seed in (("train", 24, 0), ("val", 8, 1), ("test", 8, 2)):
        generate_synthetic_patches(str(root / split), n=n, size=64,
                                   seed=seed, num_classes=NUM_CLASSES)
    return root


def _write_cfg(path, data_root, **extra):
    cfg = dict(
        model="unet", img_size=64, batch_size=8, epochs=2, lr=1e-3,
        seed=41, num_worker=2, compute_dtype="float32",
        num_classes=NUM_CLASSES, loss="dice_ce",
        train_path=str(data_root / "train"),
        val_path=str(data_root / "val"),
        test_path=str(data_root / "test"),
    )
    cfg.update(extra)
    path.write_text(yaml.safe_dump(cfg))
    return path


@pytest.fixture(scope="module")
def mc_trained(mc_data, tmp_path_factory):
    from pdac_pathological_image_segmentation_tpu.cli.train import main

    save = tmp_path_factory.mktemp("mc_run")
    cfg_yaml = _write_cfg(save / "cfg.yaml", mc_data)
    result = main(["--config", str(cfg_yaml), "--save_path", str(save)])
    return cfg_yaml, save, result


@pytest.mark.slow
def test_multiclass_training_learns(mc_trained):
    _, _, result = mc_trained
    losses = [h["train_loss"] for h in result["history"]]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # macro Dice over 3 classes is a real score, not the binary one
    assert 0.0 <= result["best_val_score"] <= 1.0


@pytest.mark.slow
def test_multiclass_eval_cli(mc_trained, tmp_path):
    from pdac_pathological_image_segmentation_tpu.cli.test import main

    cfg_yaml, save, _ = mc_trained
    out = tmp_path / "eval"
    res = main(["--config", str(cfg_yaml), "--save_path", str(out),
                "--pth_path", os.path.join(save, "pth"),
                "--max_figures", "2"])
    assert 0.0 <= res["test_score"] <= 1.0
    assert np.isfinite(res["test_loss"])
    # the sigmoid-threshold sweep is binary-only calibration
    assert "best_threshold" not in res
    # per-sample metrics CSV carries per-class columns (dice_c0..dice_c2)
    header = open(res["metrics_csv"]).readline()
    for ci in range(NUM_CLASSES):
        assert f"dice_c{ci}" in header
    figs = sorted(os.listdir(out / "figure"))
    assert figs == ["figure_1.png", "figure_2.png"]


@pytest.mark.slow
def test_multiclass_overlay_cli(mc_trained, mc_data, tmp_path):
    from pdac_pathological_image_segmentation_tpu.cli.overlay import main
    from pdac_pathological_image_segmentation_tpu.data.tiffwriter import (
        write_tiff,
    )

    cfg_yaml, save, _ = mc_trained
    # a small slide whose pixels carry the class tints (reuse a test patch
    # mosaic so the argmax map has non-background structure)
    from PIL import Image

    tiles = sorted(
        p for p in os.listdir(mc_data / "test") if "labelled" not in p)
    imgs = [np.asarray(Image.open(mc_data / "test" / p).convert("RGB"))
            for p in tiles[:6]]
    slide_px = np.concatenate([
        np.concatenate(imgs[:3], axis=1),
        np.concatenate(imgs[3:6], axis=1),
    ])  # 128 x 192 x 3
    slide = tmp_path / "slide.tiff"
    write_tiff(str(slide), slide_px, tile=64, pyramid=False)

    out = tmp_path / "ov"
    res = main(["--config", str(cfg_yaml), "--save_path", str(out),
                "--pth_path", os.path.join(save, "pth"),
                "--slide", str(slide), "--geojson"])
    prob = np.load(out / "probability_map.npy")
    cmap = np.load(out / "class_map.npy")
    assert prob.shape == (128, 192, NUM_CLASSES)
    assert cmap.shape == (128, 192)
    # softmax canvases: per-pixel class probabilities sum to 1 everywhere
    # a tile covered (here: everywhere)
    np.testing.assert_allclose(prob.sum(axis=-1), 1.0, atol=1e-3)
    assert set(np.unique(cmap)) <= set(range(NUM_CLASSES))
    # the argmax map IS the class map the CLI reported on
    np.testing.assert_array_equal(cmap, prob.argmax(axis=-1))
    assert res["tumor_fraction"] == pytest.approx(float((cmap > 0).mean()))
    assert os.path.exists(out / "overlay.png")
    # GeoJSON features are classified per class
    import json

    gj = json.load(open(out / "annotations.geojson"))
    names = {f["properties"]["classification"]["name"]
             for f in gj["features"]}
    assert names <= {f"Tumor_{k}" for k in range(1, NUM_CLASSES)}


@pytest.mark.slow
def test_multiclass_overlay_guards(mc_trained, tmp_path):
    from pdac_pathological_image_segmentation_tpu.cli.overlay import main

    cfg_yaml, save, _ = mc_trained
    base = ["--config", str(cfg_yaml), "--save_path", str(tmp_path / "x"),
            "--pth_path", os.path.join(save, "pth"), "--slide", "dummy.tiff"]
    with pytest.raises(SystemExit, match="binary-only"):
        main(base + ["--banded"])
    with pytest.raises(SystemExit, match="binary-only"):
        main(base + ["--int8"])
    with pytest.raises(SystemExit, match="argmax"):
        main(base + ["--threshold", "auto"])
