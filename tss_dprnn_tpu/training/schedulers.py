"""Host-side LR schedulers mirroring the reference's two options
(reference trainer.py:44-57): ExponentialLR when ``decay_rate`` is set,
ReduceLROnPlateau otherwise (factor/patience on the eval loss).
"""

from __future__ import annotations


class ExponentialDecay:
    """torch ExponentialLR: lr *= gamma every epoch (reference trainer.py:47-50)."""

    def __init__(self, lr: float, gamma: float):
        self.lr = lr
        self.gamma = gamma

    def step(self, metric=None) -> float:
        self.lr *= self.gamma
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr}

    def load_state_dict(self, sd: dict) -> None:
        self.lr = float(sd["lr"])


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau (min mode, default threshold 1e-4 rel) —
    reference trainer.py:53-57 with factor/patience from config."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 2,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):  # rel threshold, min mode
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, sd: dict) -> None:
        self.lr = float(sd["lr"])
        self.best = float(sd["best"])
        self.num_bad = int(sd["num_bad"])
