"""Per-patch test/eval harness (the reference's ``test.py:137-191``).

Batched no-grad inference over the test split → mean Dice score + Dice loss
(per-batch meter average, n=1 per batch, exactly like the reference's
``AverageMeter`` usage at ``test.py:149-150``) → optional per-sample
original/label/prediction triptych figures.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.data.loader import (
    PatchDataset,
    PatchLoader,
)
from pdac_pathological_image_segmentation_tpu.infer.figures import save_triptych
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.ops.augment import (
    denormalize,
    eval_transform,
)
from pdac_pathological_image_segmentation_tpu.ops.metrics import (
    METRIC_NAMES,
    SWEEP_BINS,
    derive_metrics,
    per_sample_confusion,
    prob_histograms,
    threshold_sweep,
)
from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
    restore_checkpoint,
)
from pdac_pathological_image_segmentation_tpu.train.objective import (
    make_objective,
)
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)
from pdac_pathological_image_segmentation_tpu.utils.meters import AverageMeter


def load_serving_state(
    cfg: Config,
    pth_path: str,
    mesh: Optional[jax.sharding.Mesh] = None,
):
    """Build ``cfg``'s model and load serving weights from ``pth_path``.

    ``pth_path`` resolves like the reference's eval entry
    (``test.py:94-135``): an Orbax checkpoint directory
    (``.../pth/latest`` or ``.../pth/best``), a ``.../pth`` parent
    (``best`` preferred, then ``latest``), or a reference-pipeline torch
    ``.pth`` file (converted on the fly for all four architectures).
    Returns ``(model, state, meta, mesh)`` with the state replicated on
    ``mesh``; shared by the :class:`Evaluator` and the export CLI.
    """
    mesh = mesh if mesh is not None else create_mesh(cfg.num_devices)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed))
    state = jax.device_put(state, replicated_sharding(mesh))

    if os.path.isfile(pth_path) and pth_path.endswith((".pth", ".pt")):
        # a reference-pipeline torch checkpoint (train_worker.py:116) —
        # convert it on the fly: 'unet' (in-repo ResUNet) and 'fpn'
        # (smp layout, the reference's default config)
        from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
            load_reference_model_checkpoint,
        )

        params, batch_stats = load_reference_model_checkpoint(
            pth_path, cfg.model, state.params, state.batch_stats
        )
        restored = (
            state.replace(params=jax.device_put(params),
                          batch_stats=jax.device_put(batch_stats)),
            {"source": "reference_pth"},
        )
    elif os.path.isdir(os.path.join(pth_path, "best")):
        restored = restore_checkpoint(pth_path, state, name="best")
    elif os.path.isdir(os.path.join(pth_path, "latest")):
        restored = restore_checkpoint(pth_path, state, name="latest")
    else:
        parent, name = os.path.split(os.path.normpath(pth_path))
        restored = restore_checkpoint(parent, state, name=name)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found at {pth_path}")
    state, meta = restored
    return model, state, meta, mesh


class Evaluator:
    def __init__(
        self,
        cfg: Config,
        pth_path: str,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        """``pth_path``: an Orbax checkpoint directory (``.../pth/latest`` or
        ``.../pth/best``) or a ``.../pth`` directory (defaults to ``best``
        then ``latest``)."""
        self.cfg = cfg
        self.model, self.state, self.meta, self.mesh = load_serving_state(
            cfg, pth_path, mesh
        )
        self.data_sharding = batch_sharding(self.mesh)

        img_size = cfg.img_size
        model = self.model
        self.objective = make_objective(cfg)
        obj = self.objective
        dtype = getattr(model, "dtype", None) or jnp.float32

        stain = cfg.stain

        num_classes = obj.num_classes

        @jax.jit
        def step(state, image, mask, valid):
            imgs, msks = eval_transform(image, mask, img_size=img_size,
                                        dtype=dtype, stain=stain)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                imgs, train=False,
            )
            loss = obj.loss_fn(out, msks, valid)
            score = obj.score_fn(out, msks, valid)
            preds = obj.predict_fn(out)
            counts = per_sample_confusion(preds, msks, valid,
                                          num_classes=num_classes)
            originals = denormalize(imgs.astype(jnp.float32))
            if num_classes == 1:
                # tumor probability exactly as predict_fn thresholds it
                probs = jax.nn.sigmoid(out[..., 0].astype(jnp.float32))
                hists = prob_histograms(probs, msks, valid)
            else:
                hists = jnp.zeros((2, SWEEP_BINS + 1), jnp.int32)
            return loss, score, preds, msks, originals, counts, hists

        self._step = step

    def run(
        self,
        test_set: PatchDataset,
        figure_path: Optional[str] = None,
        max_figures: Optional[int] = None,
        metrics_csv: Optional[str] = None,
        sweep_csv: Optional[str] = None,
        verbose: bool = True,
    ) -> dict:
        """``metrics_csv``: also write per-sample dice/iou/precision/
        recall/specificity/accuracy rows (plus macro/micro summary rows)
        to this path — the per-patch detail the reference's single mean
        Dice printout (``test.py:182``) can't give.

        ``sweep_csv`` (binary models): write the operating-point sweep —
        pooled dice/iou/precision/recall/specificity/accuracy at all 257
        thresholds ``k/256`` — and report the Dice-optimal threshold in
        the result (``best_threshold``/``best_dice``).  The reference
        hard-codes 0.5 (``test.py:143``); the sweep costs one extra
        histogram pass inside the same jit step."""
        cfg = self.cfg
        loader = PatchLoader(
            test_set, cfg.batch_size, shuffle=False,
            num_workers=cfg.num_worker, drop_last=False,
            sharding=self.data_sharding,
        )
        if figure_path:
            os.makedirs(figure_path, exist_ok=True)
        loss_meter, score_meter = AverageMeter(), AverageMeter()
        count = 0
        all_counts = []  # per-sample confusion rows, in dataset order
        hist_total = np.zeros((2, SWEEP_BINS + 1), np.float64)
        for batch in loader.epoch(0):
            loss, score, preds, msks, originals, counts, hists = self._step(
                self.state, batch.image, batch.mask, batch.valid
            )
            hist_total += np.asarray(jax.device_get(hists), np.float64)
            # reference updates meters once per batch (test.py:149-150)
            loss_meter.update(float(loss))
            score_meter.update(float(score))
            counts_h = np.asarray(jax.device_get(counts))
            valid_np = np.asarray(jax.device_get(batch.valid)).astype(bool)
            all_counts.append(counts_h[valid_np])
            if figure_path:
                preds_h = np.asarray(jax.device_get(preds))
                msks_h = np.asarray(jax.device_get(msks))
                orig_h = np.asarray(jax.device_get(originals))
                valid_h = np.asarray(jax.device_get(batch.valid))
                for i in range(len(valid_h)):
                    if not valid_h[i]:
                        continue
                    if max_figures is not None and count >= max_figures:
                        break
                    count += 1
                    save_triptych(
                        figure_path, count, orig_h[i], msks_h[i], preds_h[i]
                    )
        counts_all = (np.concatenate(all_counts, axis=0) if all_counts
                      else np.zeros((0, 1, 4), np.float32))
        per_sample = derive_metrics(counts_all)  # each (N, C)
        micro = derive_metrics(counts_all.sum(axis=0))  # each (C,)
        result = {
            "test_score": score_meter.avg,
            "test_loss": loss_meter.avg,
            "n_figures": count,
            "n_samples": int(counts_all.shape[0]),
            # class-averaged micro (pooled-pixel) metrics
            "metrics": {k: float(np.mean(v)) for k, v in micro.items()},
        }
        if metrics_csv:
            self._write_metrics_csv(metrics_csv, test_set, counts_all,
                                    per_sample, micro)
            result["metrics_csv"] = metrics_csv
        if self.objective.num_classes == 1 and hist_total.sum() > 0:
            sweep = threshold_sweep(hist_total)
            best = int(np.argmax(sweep["dice"]))
            result["best_threshold"] = float(sweep["threshold"][best])
            result["best_dice"] = float(sweep["dice"][best])
            # k=bins/2 is exactly the reference's prob >= 0.5 rule
            result["dice_at_0.5"] = float(sweep["dice"][SWEEP_BINS // 2])
            if sweep_csv:
                self._write_sweep_csv(sweep_csv, sweep)
                result["sweep_csv"] = sweep_csv
        if verbose:
            print(f"Test Score: {result['test_score']} "
                  f"Test Loss: {result['test_loss']}")
        return result

    def _write_sweep_csv(self, path, sweep) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cols = ("threshold",) + METRIC_NAMES
        with open(path, "w") as f:
            f.write(",".join(cols) + "\n")
            for i in range(len(sweep["threshold"])):
                f.write(",".join(f"{float(sweep[c][i]):.6f}"
                                 for c in cols) + "\n")

    def _write_metrics_csv(self, path, test_set, counts_all, per_sample,
                           micro) -> None:
        n, c = counts_all.shape[:2]
        # column order: metric-major, class-minor; binary drops the suffix
        header = ["sample", "path"] + [
            m if c == 1 else f"{m}_c{ci}"
            for m in METRIC_NAMES for ci in range(c)
        ]
        img_paths = list(getattr(test_set, "img_paths", [])) or [""] * n
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(",".join(header) + "\n")
            for i in range(n):
                vals = [f"{per_sample[m][i, ci]:.6f}"
                        for m in METRIC_NAMES for ci in range(c)]
                base = os.path.basename(str(img_paths[i])) if i < len(
                    img_paths) else ""
                f.write(",".join([str(i), base] + vals) + "\n")
            macro = [f"{float(np.mean(per_sample[m][:, ci])):.6f}"
                     if n else "nan"
                     for m in METRIC_NAMES for ci in range(c)]
            f.write(",".join(["macro", ""] + macro) + "\n")
            mic = [f"{float(micro[m][ci]):.6f}"
                   for m in METRIC_NAMES for ci in range(c)]
            f.write(",".join(["micro", ""] + mic) + "\n")
