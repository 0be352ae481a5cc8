"""Checkpoint subsystem: latest/best with auto-resume.

Same contract as the reference (``train_worker.py:116-125,186-201``):
``<save>/pth/latest`` written every epoch, ``<save>/pth/best`` on validation
improvement, resume auto-triggered by the existence of ``latest``.  Stored
via Orbax (PyTree checkpointer, multi-host safe) instead of ``torch.save``.

Fix-forward vs the reference (SURVEY.md §5): ``previous_best``, the plateau
scheduler, and the early-stop counter ARE restored on resume (the reference
saves ``previous_best`` but resets it to 0.0, ``train_worker.py:55``, so a
resumed run can overwrite a better ``best.pth``).  ``parity_mode`` restores
the reference behavior.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import orbax.checkpoint as ocp

from pdac_pathological_image_segmentation_tpu.train.state import TrainState

LATEST = "latest"
BEST = "best"


def _ckpt_path(pth_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(pth_dir, name))


def save_checkpoint(
    pth_dir: str,
    state: TrainState,
    epoch: int,
    previous_best: float,
    scheduler_state: dict,
    earlystop_state: dict,
    is_best: bool,
) -> None:
    """Write ``latest`` (every epoch) and ``best`` (on improvement) —
    reference ``train_worker.py:116-125``."""
    payload = {
        "state": {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
        "meta": {
            "epoch": epoch,
            "previous_best": float(previous_best),
            "scheduler": scheduler_state,
            "earlystop": earlystop_state,
        },
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_path(pth_dir, LATEST), payload, force=True)
    if is_best:
        ckptr.save(_ckpt_path(pth_dir, BEST), payload, force=True)


def has_checkpoint(pth_dir: str, name: str = LATEST) -> bool:
    return os.path.isdir(_ckpt_path(pth_dir, name))


class AsyncCheckpointSaver:
    """Per-epoch checkpoint writes overlapped with the next epoch's compute.

    The reference blocks training on ``torch.save`` every epoch
    (``train_worker.py:116-125``); here ``save()`` costs one on-device
    HBM→HBM snapshot (microseconds) and the device→host fetch plus the
    Orbax write run on a background thread while the next epoch trains.
    The snapshot copy is what makes this safe with buffer donation: the
    train step donates ``state``'s buffers on the very next step, so the
    background thread must never read the live buffers — it reads fresh
    ones no jitted program ever sees again.

    One save in flight at a time: a second ``save()`` (or ``wait()``,
    called by the Trainer at train end and before any in-process restore)
    joins the previous write first, and re-raises any exception it hit.

    Multi-host (``jax.process_count() > 1``) falls back to the synchronous
    path: Orbax's multihost commit barriers must be entered by every
    process, and running them on per-process background threads would
    interleave with the trainer's own epoch barriers.
    """

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        # fresh non-donated device buffers for the background fetch
        self._snapshot = jax.jit(lambda t: t)

    def wait(self) -> None:
        """Block until the in-flight save (if any) has landed; re-raise
        its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err

    def save(
        self,
        pth_dir: str,
        state: TrainState,
        epoch: int,
        previous_best: float,
        scheduler_state: dict,
        earlystop_state: dict,
        is_best: bool,
    ) -> None:
        """Same contract as :func:`save_checkpoint` (latest every epoch,
        best on improvement), returning as soon as the device snapshot is
        taken."""
        self.wait()
        if jax.process_count() > 1:
            save_checkpoint(pth_dir, state, epoch, previous_best,
                            scheduler_state, earlystop_state, is_best)
            return
        arrays = self._snapshot({
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        })
        meta = {
            "epoch": epoch,
            "previous_best": float(previous_best),
            "scheduler": dict(scheduler_state),
            "earlystop": dict(earlystop_state),
        }

        def _write() -> None:
            try:
                payload = {"state": jax.device_get(arrays), "meta": meta}
                ckptr = ocp.PyTreeCheckpointer()
                ckptr.save(_ckpt_path(pth_dir, LATEST), payload, force=True)
                if is_best:
                    ckptr.save(_ckpt_path(pth_dir, BEST), payload,
                               force=True)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="ckpt-async-save", daemon=True
        )
        self._thread.start()


def restore_checkpoint(
    pth_dir: str, state: TrainState, name: str = LATEST
) -> Optional[tuple]:
    """Restore ``(state, meta)`` if a checkpoint exists, else ``None``.
    The given ``state`` supplies the pytree structure/dtypes/shardings."""
    path = _ckpt_path(pth_dir, name)
    if not os.path.isdir(path):
        return None
    template = {
        "state": {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
        "meta": {
            "epoch": 0,
            "previous_best": 0.0,
            "scheduler": {"lr": 0.0, "best": 0.0, "num_bad_epochs": 0},
            "earlystop": {
                "patience": 0,
                "delta": 0.0,
                "best_score": 0.0,
                "counter": 0,
                "early_stop": False,
            },
        },
    }
    ckptr = ocp.PyTreeCheckpointer()
    # explicit restore args so arrays land on the *current* process's
    # devices/shardings (a pod-trained checkpoint must restore on one chip
    # and vice versa — the checkpoint's recorded shardings may not exist
    # here)
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = ckptr.restore(path, item=template, restore_args=restore_args)
    st = restored["state"]
    new_state = state.replace(
        step=jax.numpy.asarray(st["step"]),
        params=st["params"],
        batch_stats=st["batch_stats"],
        opt_state=st["opt_state"],
    )
    return new_state, restored["meta"]
