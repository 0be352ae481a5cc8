"""End-to-end integration: synthetic patches → multi-device data-parallel
training → checkpoint/resume → evaluation with figures.

Runs the SAME pjit program that runs on a TPU pod, on the 8 fake CPU devices
from conftest — the fake-backend distributed test the reference lacks
(SURVEY.md §4: its multi-GPU path is only exercisable on real GPUs).
"""

import os

import jax
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.data import (
    PatchDataset,
    discover_split,
    generate_synthetic_patches,
)
from pdac_pathological_image_segmentation_tpu.infer.evaluate import Evaluator
from pdac_pathological_image_segmentation_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    for split, n, seed in (("train", 24, 0), ("val", 8, 1), ("test", 8, 2)):
        generate_synthetic_patches(str(root / split), n=n, size=64, seed=seed)
    return root


def _cfg(**kw):
    base = dict(
        model="unet", img_size=64, batch_size=8, epochs=2, lr=1e-3,
        seed=41, num_worker=2, earlystop_patience=30,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def trained(data_root, tmp_path_factory):
    save = tmp_path_factory.mktemp("run")
    cfg = _cfg(
        train_path=str(data_root / "train"),
        val_path=str(data_root / "val"),
        test_path=str(data_root / "test"),
    )
    train_set = PatchDataset(*discover_split(cfg.train_path), cfg)
    val_set = PatchDataset(*discover_split(cfg.val_path), cfg)
    trainer = Trainer(cfg, str(save), train_set, val_set)
    result = trainer.train()
    return cfg, save, result


def test_training_runs_and_learns(trained):
    cfg, save, result = trained
    assert len(result["history"]) == 2
    losses = [h["train_loss"] for h in result["history"]]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # tinted-circle masks are easy to learn


def test_checkpoint_files_written(trained):
    _, save, _ = trained
    assert os.path.isdir(os.path.join(save, "pth", "latest"))
    assert os.path.isdir(os.path.join(save, "pth", "best"))
    # four reference TB tags present in the scalar log
    csv = open(os.path.join(save, "log_dir", "scalars.csv")).read()
    for tag in ("Score/Train_Score", "Loss/Train_Loss",
                "Score/Validation_Score", "Loss/Validation_Loss"):
        assert tag in csv


@pytest.mark.slow
def test_resume_continues_from_latest(trained, data_root):
    cfg, save, result = trained
    cfg2 = _cfg(
        train_path=str(data_root / "train"),
        val_path=str(data_root / "val"),
        epochs=3,  # one more epoch
    )
    train_set = PatchDataset(*discover_split(cfg2.train_path), cfg2)
    val_set = PatchDataset(*discover_split(cfg2.val_path), cfg2)
    trainer = Trainer(cfg2, str(save), train_set, val_set)
    res2 = trainer.train()
    # auto-resume: epochs 0-1 already done, so only epoch 2 runs
    assert [h["epoch"] for h in res2["history"]] == [2]
    # previous_best carried over (fix-forward vs reference quirk)
    assert res2["best_val_score"] >= result["best_val_score"]


def test_evaluator_and_figures(trained, data_root, tmp_path):
    cfg, save, _ = trained
    test_set = PatchDataset(*discover_split(str(data_root / "test")), cfg)
    ev = Evaluator(cfg, os.path.join(save, "pth"))
    figdir = str(tmp_path / "figure")
    res = ev.run(test_set, figure_path=figdir, max_figures=3)
    assert 0.0 <= res["test_score"] <= 1.0
    assert np.isfinite(res["test_loss"])
    figs = sorted(os.listdir(figdir))
    assert figs == ["figure_1.png", "figure_2.png", "figure_3.png"]


@pytest.mark.slow
def test_training_is_deterministic(data_root, tmp_path_factory):
    scores = []
    for run in range(2):
        save = tmp_path_factory.mktemp(f"det{run}")
        cfg = _cfg(
            train_path=str(data_root / "train"),
            val_path=str(data_root / "val"),
            epochs=1,
        )
        train_set = PatchDataset(*discover_split(cfg.train_path), cfg)
        val_set = PatchDataset(*discover_split(cfg.val_path), cfg)
        result = Trainer(cfg, str(save), train_set, val_set).train()
        scores.append(result["history"][0]["train_loss"])
    assert scores[0] == scores[1]


@pytest.mark.slow
def test_trainer_warm_resumes_from_reference_pth(data_root, tmp_path):
    """Trainer-level reference-resume contract (train_worker.py:186-201):
    a torch-format latest.pth in save_path/pth is picked up for an smp
    model too — weights AND Adam moments — and training continues from
    epoch+1."""
    import optax
    import torch

    from test_fpn_golden import _TorchSmpFPN

    torch.manual_seed(9)
    tmodel = _TorchSmpFPN().train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    x = torch.randn(2, 3, 64, 64)
    loss = tmodel(x).square().mean()
    opt.zero_grad()
    loss.backward()
    opt.step()

    save = tmp_path / "run"
    (save / "pth").mkdir(parents=True)
    torch.save({
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": opt.state_dict(),
        "epoch": 0,
        "previous_best": 0.12,
    }, save / "pth" / "latest.pth")

    cfg = _cfg(model="fpn", epochs=2,
               train_path=str(data_root / "train"),
               val_path=str(data_root / "val"))
    train_set = PatchDataset(*discover_split(cfg.train_path), cfg)
    val_set = PatchDataset(*discover_split(cfg.val_path), cfg)
    trainer = Trainer(cfg, str(save), train_set, val_set)

    adams = [
        n for n in jax.tree_util.tree_leaves(
            trainer.state.opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        if isinstance(n, optax.ScaleByAdamState)
    ]
    assert all(int(a.count) == 0 for a in adams)

    result = trainer.train()
    # resumed at epoch 1 (0-based): only epoch index 1 actually ran
    assert len(result["history"]) == 1
    assert result["history"][0]["epoch"] == 1
    assert result["best_val_score"] >= 0.12  # previous_best restored


@pytest.mark.slow
def test_midtrain_exception_waits_for_async_checkpoint(data_root, tmp_path):
    """An exception mid-epoch must not abandon the in-flight async
    checkpoint: the finally-path drains the writer, so epoch 1's
    ``latest`` is durable and resumable (regression — the wait only ran
    on the normal-return path)."""
    cfg = _cfg(
        epochs=3,
        train_path=str(data_root / "train"),
        val_path=str(data_root / "val"),
        test_path=str(data_root / "test"),
    )
    train_set = PatchDataset(*discover_split(cfg.train_path), cfg)
    val_set = PatchDataset(*discover_split(cfg.val_path), cfg)
    save = tmp_path / "boom"
    trainer = Trainer(cfg, str(save), train_set, val_set)

    real_validation = trainer._run_validation
    calls = {"n": 0}

    def failing_validation(epoch):
        calls["n"] += 1
        if calls["n"] == 2:  # epoch 2: epoch 1's save is (or was) in flight
            raise RuntimeError("injected failure")
        return real_validation(epoch)

    trainer._run_validation = failing_validation
    with pytest.raises(RuntimeError, match="injected failure"):
        trainer.train()
    # the async writer drained: no save thread alive, epoch-1 checkpoint
    # loads cleanly for auto-resume
    assert trainer._ckpt_saver._thread is None

    from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
        restore_checkpoint,
    )
    restored = restore_checkpoint(
        os.path.join(str(save), "pth"), trainer.state)
    assert restored is not None
    _, meta = restored
    assert meta["epoch"] == 0


def test_cli_test_threshold_sweep(trained, data_root, tmp_path):
    """cli/test.py emits the operating-point calibration: a 257-row sweep
    CSV plus the Dice-optimal threshold next to the reference's fixed-0.5
    score (VERDICT r3 item 8; reference hard-codes 0.5 at test.py:143)."""
    import yaml

    from pdac_pathological_image_segmentation_tpu.cli.test import main

    cfg, save, _ = trained
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "model": cfg.model, "img_size": cfg.img_size,
        "batch_size": cfg.batch_size, "seed": cfg.seed,
        "num_worker": cfg.num_worker, "compute_dtype": "float32",
        "test_path": str(data_root / "test"),
    }))
    out = tmp_path / "out"
    res = main(["--config", str(cfg_yaml), "--save_path", str(out),
                "--pth_path", os.path.join(save, "pth"),
                "--max_figures", "0"])
    assert 0.0 < res["best_threshold"] < 1.0
    # the optimum can't be worse than the fixed rule it generalizes
    assert res["best_dice"] >= res["dice_at_0.5"] > 0.0
    lines = open(res["sweep_csv"]).read().strip().split("\n")
    assert lines[0].startswith("threshold,dice,iou,")
    assert len(lines) == 258  # header + k/256 for k=0..256


@pytest.mark.slow
def test_overlay_cli_threshold_auto(trained, data_root, tmp_path):
    """overlay --threshold auto calibrates on the val split and re-derives
    every mask output at the calibrated operating point."""
    import yaml

    from pdac_pathological_image_segmentation_tpu.cli.overlay import main
    from pdac_pathological_image_segmentation_tpu.data.tiffwriter import (
        write_tiff,
    )

    cfg, save, _ = trained
    rng = np.random.default_rng(3)
    slide_px = rng.integers(0, 256, (128, 192, 3), dtype=np.uint8)
    slide = tmp_path / "slide.tiff"
    write_tiff(str(slide), slide_px, tile=64, pyramid=False)
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "model": cfg.model, "img_size": cfg.img_size,
        "batch_size": cfg.batch_size, "seed": cfg.seed,
        "num_worker": cfg.num_worker, "compute_dtype": "float32",
        "val_path": str(data_root / "val"),
    }))
    out = tmp_path / "ov"
    res = main(["--config", str(cfg_yaml), "--save_path", str(out),
                "--pth_path", os.path.join(save, "pth"),
                "--slide", str(slide), "--threshold", "auto"])
    prob = np.load(out / "probability_map.npy")
    # the overlay's tumor fraction reflects the calibrated threshold
    assert res["tumor_fraction"] == pytest.approx(
        float((prob >= res["threshold"]).mean()))
    assert 0.0 < res["threshold"] < 1.0

    with pytest.raises(SystemExit, match="in \\[0, 1\\]"):
        main(["--config", str(cfg_yaml), "--save_path", str(out),
              "--pth_path", os.path.join(save, "pth"),
              "--slide", str(slide), "--threshold", "1.5"])
