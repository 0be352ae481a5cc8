"""Training utilities: running meters and early stopping.

Same semantics as the reference's ``util.py:29-64`` (``EarlyStop``,
``AverageMeter``), re-implemented as plain host-side state.  On TPU the
per-step metric values arrive as device arrays once per epoch (no per-step
``.item()`` syncs like reference ``train_worker.py:82-83``), so these meters
only run at epoch granularity in the training loop; they are still exposed for
API parity and for host-side evaluation.
"""

from __future__ import annotations

import math
from typing import Optional


class AverageMeter:
    """Running value/sum/count/average (reference ``util.py:50-64``)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class EarlyStop:
    """Patience-based early stopping on a score to maximize.

    Reference semantics (``util.py:29-47``): an epoch counts as
    *no improvement* when ``val_score < best + delta``; ``patience`` such
    epochs in a row set ``early_stop``.  Note ``delta`` raises the bar — a
    score must beat best by at least ``delta`` to reset the counter (the
    reference hard-codes ``delta=0.02`` at ``train_worker.py:62``).
    """

    def __init__(self, patience: int = 5, delta: float = 0.0) -> None:
        self.patience = patience
        self.delta = delta
        self.best_score: Optional[float] = None
        self.counter = 0
        self.early_stop = False
        self.val_loss_min = math.inf

    def __call__(self, val_score: float) -> None:
        val_score = float(val_score)
        if self.best_score is None:
            self.best_score = val_score
        elif val_score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = val_score
            self.counter = 0

    def state_dict(self) -> dict:
        return {
            "patience": self.patience,
            "delta": self.delta,
            "best_score": self.best_score,
            "counter": self.counter,
            "early_stop": self.early_stop,
        }

    def load_state_dict(self, d: dict) -> None:
        self.patience = int(d["patience"])
        self.delta = float(d["delta"])
        self.best_score = d["best_score"]
        self.counter = int(d["counter"])
        self.early_stop = bool(d["early_stop"])
