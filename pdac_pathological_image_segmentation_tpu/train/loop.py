"""Distributed training loop (the reference's ``train_worker.py`` rebuilt
TPU-first).

One jit-compiled train step fuses: device-side augmentation
(``ops/augment.py``), forward+backward of the selected model, the Dice
loss/score, and the Adam update.  The batch is sharded over the ``data`` mesh
axis; params/optimizer are replicated, so XLA lowers the gradient reduction
to a ``psum`` over ICI overlapped with the backward pass — the
DDP-all-reduce equivalent (reference ``train_worker.py:79,204-206``) without
bucketing heuristics.

Deliberate fixes over the reference (kept under ``parity_mode`` flags,
SURVEY.md §5):

* metrics are computed on the *global* batch under jit, so every host sees
  identical train/val scores (the reference never all-reduces meters and
  each rank steps its LR scheduler on its own shard — LRs can diverge);
* the early-stop decision is therefore identical on every host by
  construction (the reference ``break``s only on rank 0 and deadlocks in
  ``dist.barrier``);
* no per-step ``.item()`` device syncs (reference ``train_worker.py:82-83``)
  — per-step scalars stay on device and are fetched once per epoch;
* ``previous_best`` / scheduler / early-stop state are restored on resume.
"""

from __future__ import annotations

import contextlib
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.data.loader import (
    PatchDataset,
    PatchLoader,
)
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    sync_global_devices,
)
from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    restore_checkpoint,
)
from pdac_pathological_image_segmentation_tpu.train.gns import GnsEma
from pdac_pathological_image_segmentation_tpu.train.objective import (
    make_objective,
)
from pdac_pathological_image_segmentation_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)
from pdac_pathological_image_segmentation_tpu.train.schedule import (
    ReduceLROnPlateau,
)
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)
from pdac_pathological_image_segmentation_tpu.utils.meters import EarlyStop
from pdac_pathological_image_segmentation_tpu.utils.profiling import (
    StepTimer,
    trace,
)


class _ScalarWriter:
    """TensorBoard scalar writer with the reference's four tags
    (``train_worker.py:100-109``); falls back to CSV when tensorboard is
    unavailable.  Created once (the reference re-instantiates it every epoch
    and leaks all but the last, ``train_worker.py:98,134-135``)."""

    def __init__(self, log_dir: str) -> None:
        os.makedirs(log_dir, exist_ok=True)
        self._csv = open(os.path.join(log_dir, "scalars.csv"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        self._csv.write(f"{global_step},{tag},{value}\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=global_step)

    def flush(self) -> None:
        self._csv.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._csv.close()
        if self._tb is not None:
            self._tb.close()


class Trainer:
    """End-to-end training driver: the reference's ``main_worker`` + ``train``
    (``train_worker.py:139-261,40-136``) as one object."""

    def __init__(
        self,
        cfg: Config,
        save_path: str,
        train_set: PatchDataset,
        val_set: PatchDataset,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        self.cfg = cfg
        self.save_path = save_path
        self.log_dir = os.path.join(save_path, "log_dir")
        self.pth_path = os.path.join(save_path, "pth")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.pth_path, exist_ok=True)

        self.mesh = mesh if mesh is not None else create_mesh(cfg.num_devices)
        n_dev = self.mesh.devices.size
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"global batch_size {cfg.batch_size} must divide evenly "
                f"across the {n_dev}-device data mesh (the reference floors "
                f"per-rank batches, train_worker.py:208; we require exact)"
            )
        self.data_sharding = batch_sharding(self.mesh)
        self.repl_sharding = replicated_sharding(self.mesh)

        self.model = build_model(cfg)
        state = create_train_state(cfg, self.model, jax.random.PRNGKey(cfg.seed))
        if cfg.pretrained_path:
            from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
                load_pretrained_encoder,
            )

            params, batch_stats = load_pretrained_encoder(
                cfg.pretrained_path, state.params, state.batch_stats
            )
            state = state.replace(params=params, batch_stats=batch_stats)
        elif jax.process_index() == 0:
            print(
                "note: encoder starts from random init — the reference "
                "always starts from ImageNet (models/resunet.py:12). "
                "One-time setup: MIGRATION.md 'First-run site steps' "
                "(download resnet18-f37072fd.pth, convert with "
                "scripts/convert_torchvision_resnet18.py, set "
                "`pretrained_path`)."
            )
        # replicate state over the mesh
        self.state = jax.device_put(state, self.repl_sharding)

        # keep the final partial batch (reference DataLoader default
        # drop_last=False, train_worker.py:218-225): wrap-pad to the static
        # batch shape and mask padded samples out of loss/score via
        # ``batch.valid``
        self.train_loader = PatchLoader(
            train_set, cfg.batch_size, shuffle=True, num_workers=cfg.num_worker,
            drop_last=False, sharding=self.data_sharding,
        )
        self.val_loader = PatchLoader(
            val_set, cfg.batch_size, shuffle=False, num_workers=cfg.num_worker,
            drop_last=False, sharding=self.data_sharding,
        )

        self.scheduler = ReduceLROnPlateau(
            init_lr=cfg.lr, mode="max", factor=cfg.plateau_factor,
            patience=cfg.plateau_patience, min_lr=cfg.min_lr,
        )
        self.early_stopping = EarlyStop(
            patience=cfg.earlystop_patience, delta=cfg.earlystop_delta
        )
        self._ckpt_saver = AsyncCheckpointSaver()
        self.is_chief = jax.process_index() == 0
        self.writer = _ScalarWriter(self.log_dir) if self.is_chief else None

        self.objective = make_objective(cfg)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        # gradient-noise-scale diagnostic (train/gns.py): config extra
        # ``gns_every: N`` measures B_simple on the first batch of every
        # N-th epoch and logs it under Diagnostics/GNS
        self._gns_every = int(self.cfg.extras.get("gns_every", 0))
        self._gns_stats = self._build_gns_stats() if self._gns_every else None
        self._gns_ema = GnsEma() if self._gns_every else None
        self.history: list[dict] = []

    # ------------------------------------------------------------------ steps

    def _build_train_step(self):
        from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
            TRAIN_COMPILER_OPTIONS,
            LazyCompiled,
        )

        step = make_train_step(self.model, self.cfg.img_size,
                               parity_mode=self.cfg.parity_mode,
                               objective=self.objective,
                               remat=bool(self.cfg.extras.get("remat")),
                               grad_accum_steps=int(
                                   self.cfg.extras.get("grad_accum_steps", 1)
                               ),
                               stain=self.cfg.stain,
                               augment=bool(
                                   self.cfg.extras.get("augment", True)
                               ),
                               fused_augment=bool(
                                   self.cfg.extras.get("fused_augment", True)
                               ))
        # AOT-compile with the train compiler options at first call
        # (+1–2% measured; silently falls back to plain jit on backends
        # that reject the options — e.g. the CPU test mesh)
        return LazyCompiled(step, TRAIN_COMPILER_OPTIONS)

    def _build_eval_step(self):
        return make_eval_step(self.model, self.cfg.img_size,
                              objective=self.objective,
                              stain=self.cfg.stain)

    def _build_gns_stats(self):
        """Per-shard gradient function (no psum — make_gns_stats owns the
        reductions) over the deterministic eval transform: the measured
        gradient matches the training objective at the current params on
        un-augmented pixels (augmentation RNG would add variance that is
        not minibatch noise)."""
        from pdac_pathological_image_segmentation_tpu.ops.augment import (
            eval_transform,
        )
        from pdac_pathological_image_segmentation_tpu.train.gns import (
            make_gns_stats,
        )

        model, obj, img_size = self.model, self.objective, self.cfg.img_size
        stain = self.cfg.stain

        def grad_fn(params, batch_stats, image, mask):
            imgs, msks = eval_transform(image, mask, img_size=img_size,
                                        stain=stain)

            def loss_fn(p):
                out = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    imgs, train=False,
                )
                return obj.loss_fn(out, msks, None)

            return jax.grad(loss_fn)(params)

        return make_gns_stats(grad_fn, self.mesh, self.cfg.batch_size,
                              n_repl_args=1)

    # ------------------------------------------------------------------ loops

    def _run_validation(self, epoch: int):
        losses, scores = [], []
        for batch in self.val_loader.epoch(epoch):
            loss, score = self._eval_step(
                self.state, batch.image, batch.mask, batch.valid
            )
            losses.append(loss)
            scores.append(score)
        # single device→host sync per validation pass
        losses = np.asarray(jax.device_get(jnp.stack(losses)))
        scores = np.asarray(jax.device_get(jnp.stack(scores)))
        return float(scores.mean()), float(losses.mean())

    def train(self) -> dict:
        cfg = self.cfg
        start_epoch = 0
        previous_best = 0.0

        restored = restore_checkpoint(self.pth_path, self.state)
        if restored is None:
            # reference-pipeline resume contract: a torch latest.pth in the
            # pth dir (train_worker.py:186-201) — convert weights, BN stats
            # AND Adam moments so optimization continues warm, for any of
            # the four reference architectures
            ref_pth = os.path.join(self.pth_path, "latest.pth")
            if os.path.isfile(ref_pth) and self.cfg.model in (
                "unet", "fpn", "deeplabv3+", "pspnet"
            ):
                from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
                    load_reference_checkpoint_full,
                )

                state, meta = load_reference_checkpoint_full(
                    ref_pth, jax.device_get(self.state),
                    model_name=self.cfg.model,
                )
                restored = (jax.device_put(state, self.repl_sharding), meta)
        if restored is not None:
            self.state, meta = restored
            start_epoch = int(meta["epoch"]) + 1
            if cfg.parity_mode:
                previous_best = 0.0  # reference quirk: best resets on resume
            else:
                previous_best = float(meta["previous_best"])
                # scheduler/earlystop state exist in our own checkpoints;
                # a reference .pth resume has neither (the reference doesn't
                # persist them) — start those fresh
                if "scheduler" in meta:
                    self.scheduler.load_state_dict(meta["scheduler"])
                if "earlystop" in meta:
                    es = dict(meta["earlystop"])
                    if es.get("best_score") is not None and math.isnan(
                        float(es["best_score"])
                    ):
                        es["best_score"] = None
                    self.early_stopping.load_state_dict(es)
                self.state = self.state.with_lr(self.scheduler.lr)
            if self.is_chief:
                print(f"resumed from epoch {start_epoch - 1}, "
                      f"best={previous_best:.4f}")

        base_key = jax.random.PRNGKey(cfg.seed)
        final_epoch = start_epoch
        profile_epoch = cfg.extras.get("profile_epoch")
        step_timer = StepTimer()
        try:
            return self._train_epochs(
                cfg, base_key, start_epoch, final_epoch, profile_epoch,
                step_timer, previous_best)
        finally:
            # an exception mid-epoch must not abandon the in-flight async
            # checkpoint write (the daemon thread would die mid-Orbax-write
            # and auto-resume would restart from a stale epoch)
            self._ckpt_saver.wait()
            if self.writer is not None:
                self.writer.close()

    def _train_epochs(self, cfg, base_key, start_epoch, final_epoch,
                      profile_epoch, step_timer, previous_best):
        for epoch in range(start_epoch, cfg.epochs):
            final_epoch = epoch
            t0 = time.time()
            losses, scores = [], []
            n_samples = 0
            profiling = (
                profile_epoch is not None and epoch == int(profile_epoch)
                and self.is_chief
            )
            ctx = (
                trace(os.path.join(self.log_dir, "profile")) if profiling
                else contextlib.nullcontext()
            )
            step_timer.reset()
            gns_value = None
            with ctx:
                for step_idx, batch in enumerate(self.train_loader.epoch(epoch)):
                    key = jax.random.fold_in(
                        jax.random.fold_in(base_key, epoch), step_idx
                    )
                    if (self._gns_stats is not None and step_idx == 0
                            and epoch % self._gns_every == 0
                            and batch.image.shape[0] == self.cfg.batch_size):
                        stats = self._gns_stats(
                            self.state.params, self.state.batch_stats,
                            batch.image, batch.mask,
                        )
                        gns_value = self._gns_ema.update(
                            jax.device_get(stats)
                        )
                    step_timer.start()
                    self.state, loss, score = self._train_step(
                        self.state, key, batch.image, batch.mask, batch.valid
                    )
                    step_timer.stop()
                    losses.append(loss)
                    scores.append(score)
                    n_samples += batch.image.shape[0]
            if not losses:
                raise RuntimeError("empty train epoch — check train_path")
            train_loss = float(np.mean(jax.device_get(jnp.stack(losses))))
            train_score = float(np.mean(jax.device_get(jnp.stack(scores))))
            epoch_time = time.time() - t0

            val_score, val_loss = self._run_validation(epoch)

            new_lr = self.scheduler.step(val_score)
            self.state = self.state.with_lr(new_lr)

            if self.is_chief:
                print(
                    f"epoch{epoch + 1}: Train_score:{train_score} "
                    f"Train_loss:{train_loss} Val_score:{val_score} "
                    f"Val_loss:{val_loss} "
                    f"({n_samples / max(epoch_time, 1e-9):.1f} patches/s, "
                    f"lr={new_lr:.2e})"
                )
                self.writer.add_scalar("Score/Train_Score", train_score, epoch + 1)
                self.writer.add_scalar("Loss/Train_Loss", train_loss, epoch + 1)
                self.writer.add_scalar("Score/Validation_Score", val_score, epoch + 1)
                self.writer.add_scalar("Loss/Validation_Loss", val_loss, epoch + 1)
                if gns_value is not None and gns_value == gns_value:
                    self.writer.add_scalar("Diagnostics/GNS", gns_value,
                                           epoch + 1)
                self.writer.flush()

            is_best = val_score > previous_best
            previous_best = max(val_score, previous_best)

            # identical on every host (global metrics) → no rank-0-only break
            # deadlock (reference bug, train_worker.py:127-132)
            self.early_stopping(val_score)

            es_state = self.early_stopping.state_dict()
            if es_state["best_score"] is None:
                es_state["best_score"] = float("nan")
            # non-blocking: the fetch + Orbax write overlap the next epoch
            self._ckpt_saver.save(
                self.pth_path, self.state, epoch, previous_best,
                self.scheduler.state_dict(), es_state, is_best,
            )
            self.history.append({
                "epoch": epoch, "train_score": train_score,
                "train_loss": train_loss, "val_score": val_score,
                "val_loss": val_loss, "lr": new_lr,
                "epoch_time_s": epoch_time,
                "step_time": step_timer.summary(),
            })

            if self.early_stopping.early_stop:
                if self.is_chief:
                    print("Early stopping!")
                break
            sync_global_devices(f"epoch_{epoch}")

        return {
            "best_val_score": previous_best,
            "last_epoch": final_epoch,
            "history": self.history,
        }
