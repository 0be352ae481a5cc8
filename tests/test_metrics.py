"""ops/metrics.py: confusion counts + derived metric family, and the
Evaluator's per-sample metrics CSV."""

import numpy as np
import pytest

import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.ops.metrics import (
    METRIC_NAMES,
    SWEEP_BINS,
    derive_metrics,
    per_sample_confusion,
    prob_histograms,
    threshold_sweep,
)


def test_binary_confusion_hand_computed():
    preds = jnp.asarray([[[1, 1], [0, 0]],
                         [[1, 0], [0, 1]]], jnp.float32)
    masks = jnp.asarray([[[1, 0], [0, 0]],
                         [[1, 1], [1, 1]]], jnp.float32)
    counts = np.asarray(per_sample_confusion(preds, masks))
    assert counts.shape == (2, 1, 4)
    # sample 0: tp=1 fp=1 fn=0 tn=2
    assert counts[0, 0].tolist() == [1, 1, 0, 2]
    # sample 1: tp=2 fp=0 fn=2 tn=0
    assert counts[1, 0].tolist() == [2, 0, 2, 0]


def test_derived_metrics_match_formulas():
    counts = np.asarray([[[6.0, 2.0, 3.0, 5.0]]])  # tp fp fn tn
    m = {k: float(v) for k, v in derive_metrics(counts, smooth=0.0).items()}
    assert m["dice"] == pytest.approx(12 / 17)
    assert m["iou"] == pytest.approx(6 / 11)
    assert m["precision"] == pytest.approx(6 / 8)
    assert m["recall"] == pytest.approx(6 / 9)
    assert m["specificity"] == pytest.approx(5 / 7)
    assert m["accuracy"] == pytest.approx(11 / 16)
    # dice/iou consistency: d = 2j/(1+j)
    j = m["iou"]
    assert m["dice"] == pytest.approx(2 * j / (1 + j))


def test_empty_pair_gives_one_like_reference_dice():
    counts = np.zeros((1, 1, 4), np.float32)
    counts[0, 0, 3] = 100.0  # all true-negative
    m = derive_metrics(counts)
    assert float(m["dice"][0, 0]) == pytest.approx(1.0)
    assert float(m["iou"][0, 0]) == pytest.approx(1.0)


def test_per_sample_dice_matches_reference_formula():
    rng = np.random.default_rng(0)
    preds = (rng.random((4, 16, 16)) > 0.5).astype(np.float32)
    masks = (rng.random((4, 16, 16)) > 0.6).astype(np.float32)
    counts = np.asarray(per_sample_confusion(jnp.asarray(preds),
                                             jnp.asarray(masks)))
    dice = np.asarray(derive_metrics(counts)["dice"])[:, 0]
    for i in range(4):
        inter = (preds[i] * masks[i]).sum()
        want = (2 * inter + 1e-6) / (preds[i].sum() + masks[i].sum() + 1e-6)
        assert dice[i] == pytest.approx(want, rel=1e-5)


def test_valid_mask_zeroes_padded_samples():
    preds = jnp.ones((2, 4, 4))
    masks = jnp.ones((2, 4, 4))
    valid = jnp.asarray([1.0, 0.0])
    counts = np.asarray(per_sample_confusion(preds, masks, valid))
    assert counts[0].sum() == 16
    assert counts[1].sum() == 0


def test_multiclass_one_vs_rest():
    preds = jnp.asarray([[[0, 1], [2, 2]]])
    masks = jnp.asarray([[[0, 1], [1, 2]]])
    counts = np.asarray(per_sample_confusion(preds, masks, num_classes=3))
    assert counts.shape == (1, 3, 4)
    # class 0: tp=1 fp=0 fn=0 tn=3
    assert counts[0, 0].tolist() == [1, 0, 0, 3]
    # class 1: tp=1 fp=0 fn=1 tn=2
    assert counts[0, 1].tolist() == [1, 0, 1, 2]
    # class 2: tp=1 fp=1 fn=0 tn=2
    assert counts[0, 2].tolist() == [1, 1, 0, 2]


def test_prob_histogram_saturated_probs_own_bucket():
    """probs == 1.0 land in bucket `bins` (not clipped into bins-1), so
    the threshold-1.0 sweep row counts them as predicted-positive
    (ADVICE r3: float32 sigmoid saturates to exactly 1.0 for logits
    ≳ 16.6)."""
    probs = jnp.asarray([[[1.0, 1.0], [0.5, 0.0]]])
    masks = jnp.asarray([[[1, 0], [1, 0]]])
    hist = np.asarray(prob_histograms(probs, masks))
    assert hist.shape == (2, SWEEP_BINS + 1)
    assert hist.dtype == np.int32  # exact counts (no f32 2^24 ceiling)
    assert hist[1, SWEEP_BINS] == 1 and hist[0, SWEEP_BINS] == 1
    sweep = threshold_sweep(hist)
    # at threshold 1.0: both prob-1.0 pixels predicted positive → tp=1 fp=1
    m = {k: float(v[-1]) for k, v in sweep.items()}
    assert m["threshold"] == 1.0
    assert m["recall"] == pytest.approx(1 / 2)  # tp=1 of 2 positives
    assert m["precision"] == pytest.approx(1 / 2)  # tp=1, fp=1


def test_threshold_sweep_matches_direct_thresholding():
    """Every sweep row equals confusion counts from direct thresholding
    at k/bins (suffix-sum exactness), on random probabilities."""
    rng = np.random.default_rng(7)
    probs = rng.random((2, 8, 8)).astype(np.float32)
    probs.flat[:5] = 1.0  # include saturated values
    masks = (rng.random((2, 8, 8)) > 0.5).astype(np.int32)
    hist = np.asarray(prob_histograms(jnp.asarray(probs),
                                      jnp.asarray(masks)))
    sweep = threshold_sweep(hist, smooth=0.0)
    for k in (0, 1, 128, 255, 256):
        t = k / SWEEP_BINS
        pred = probs >= t
        tp = int((pred & (masks > 0)).sum())
        fp = int((pred & (masks == 0)).sum())
        fn = int((~pred & (masks > 0)).sum())
        denom = 2 * tp + fp + fn
        want = 2 * tp / denom if denom else 1.0
        assert float(sweep["dice"][k]) == pytest.approx(want, abs=1e-9), k


def test_prob_histogram_valid_mask_and_totals():
    probs = jnp.full((3, 4, 4), 0.7)
    masks = jnp.ones((3, 4, 4), jnp.int32)
    valid = jnp.asarray([1, 1, 0])
    hist = np.asarray(prob_histograms(probs, masks, valid))
    assert hist.sum() == 2 * 16  # padded sample contributes nothing
    assert hist[1].sum() == 32 and hist[0].sum() == 0


@pytest.mark.slow
def test_evaluator_metrics_csv(tmp_path):
    """Evaluator writes per-sample + macro/micro rows; macro dice of the
    CSV equals the mean of recomputed per-sample dices."""
    import jax

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.data.discovery import (
        discover_split,
    )
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        PatchDataset,
    )
    from pdac_pathological_image_segmentation_tpu.infer.evaluate import (
        Evaluator,
    )
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )

    data_dir = str(tmp_path / "data")
    generate_synthetic_patches(data_dir, n=5, size=32, seed=3)
    cfg = Config(model="unet", backbone="resnet18", img_size=32,
                 compute_dtype="float32", batch_size=8, num_worker=1,
                 test_path=data_dir)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    pth = str(tmp_path / "pth")
    save_checkpoint(pth, state, 0, 0.0,
                    {"lr": 1e-3, "best": 0.0, "num_bad_epochs": 0},
                    {"patience": 3, "delta": 0.0, "best_score": 0.0,
                     "counter": 0, "early_stop": False}, is_best=True)

    imgs, masks = discover_split(data_dir)
    ds = PatchDataset(imgs, masks, cfg)
    ev = Evaluator(cfg, pth)
    csv_path = str(tmp_path / "metrics.csv")
    res = ev.run(ds, metrics_csv=csv_path)
    assert res["n_samples"] == 5
    assert set(res["metrics"]) == set(METRIC_NAMES)

    with open(csv_path) as f:
        lines = [ln.strip().split(",") for ln in f if ln.strip()]
    header, rows = lines[0], lines[1:]
    assert header == ["sample", "path"] + list(METRIC_NAMES)
    assert len(rows) == 5 + 2  # samples + macro + micro
    assert rows[-2][0] == "macro" and rows[-1][0] == "micro"
    # paths recorded in dataset order
    assert all(r[1].endswith(".png") for r in rows[:5])
    dice_col = header.index("dice")
    per = [float(r[dice_col]) for r in rows[:5]]
    assert float(rows[-2][dice_col]) == pytest.approx(np.mean(per), abs=1e-5)
    for r in rows[:5]:
        for name in METRIC_NAMES:
            v = float(r[header.index(name)])
            assert 0.0 <= v <= 1.0
