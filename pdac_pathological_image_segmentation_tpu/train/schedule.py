"""ReduceLROnPlateau with the reference's exact hyperparameters.

Reference (``train_worker.py:236-244``): mode="max", factor=0.5, patience=2,
threshold=1e-4 (torch default), threshold_mode="abs", min_lr=1e-10, stepped
once per epoch on the validation score.  Torch semantics reproduced:
an epoch is "bad" when ``score <= best + threshold`` (abs mode, max);
``patience`` bad epochs in a row halve the LR and reset the counter.

Runs on host once per epoch; the new LR is injected into the optimizer's
``optax.inject_hyperparams`` state (no recompilation — LR is a traced
hyperparameter, not a constant baked into the step).
"""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(
        self,
        init_lr: float,
        mode: str = "max",
        factor: float = 0.5,
        patience: int = 2,
        threshold: float = 1e-4,
        min_lr: float = 1e-10,
    ) -> None:
        assert mode in ("max", "min")
        self.lr = float(init_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = -float("inf") if mode == "max" else float("inf")
        self.num_bad_epochs = 0

    def _is_better(self, value: float) -> bool:
        if self.mode == "max":
            return value > self.best + self.threshold
        return value < self.best - self.threshold

    def step(self, value: float) -> float:
        """Update on the epoch's validation score; returns the (possibly
        reduced) learning rate."""
        value = float(value)
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
