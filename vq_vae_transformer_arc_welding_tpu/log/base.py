"""Logger protocol (parity with the reference's interchangeable
Lightning loggers — CSV default, wandb, MLflow; SURVEY.md §5)."""
from __future__ import annotations


class Logger:
    def log_hyperparams(self, params: dict):
        raise NotImplementedError

    def log_metrics(self, metrics: dict, step: int | None = None):
        raise NotImplementedError

    def finalize(self, status: str = "success"):
        pass
