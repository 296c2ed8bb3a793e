"""Observability: severity-split logging + metric loggers.

Parity with /root/reference/pipeline/utils/logger.py (setup_logging, Logger,
WandBLogger, CSVLogger). wandb is optional in this environment; the WandB
logger raises a clear error when the package is absent. Adds per-phase timing
support used by the pipeline (SURVEY.md §5 tracing gap).
"""
from __future__ import annotations

import logging
import os
import sys
import time
from contextlib import contextmanager
from typing import Any

import pandas as pd


class SeverityLevelBetween(logging.Filter):
    def __init__(self, min_level: int, max_level: int) -> None:
        super().__init__()
        self.min_level = min_level
        self.max_level = max_level

    def filter(self, record) -> bool:
        return self.min_level <= record.levelno < self.max_level


def setup_logging() -> None:
    root = logging.getLogger()
    target = getattr(logging, os.environ.get("LOGLEVEL", "INFO").upper())
    root.setLevel(target)
    if not root.hasHandlers():
        fmt = logging.Formatter(
            "%(asctime)s (%(levelname)s): %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
        )
        out = logging.StreamHandler(sys.stdout)
        out.addFilter(SeverityLevelBetween(target, logging.WARNING))
        out.setFormatter(fmt)
        root.addHandler(out)
        err = logging.StreamHandler(sys.stderr)
        err.setLevel(logging.WARNING)
        err.setFormatter(fmt)
        root.addHandler(err)


class Logger:
    """Base metric logger with split-prefixing."""

    def __init__(self, config=None) -> None:
        self.config = config

    def log(self, update_dict: dict, step: int, split: str = ""):
        assert step is not None
        if split:
            update_dict = {f"{split}/{k}": v for k, v in update_dict.items()}
        return update_dict

    def log_summary(self, summary_dict: dict[str, Any]) -> None:
        pass

    def finish(self) -> None:
        pass


class CSVLogger(Logger):
    """Appends rows and rewrites ``<save_dir>/<fname>.csv`` each step."""

    def __init__(self, save_dir: str, fname: str = "metrics", config=None, **kwargs):
        super().__init__(config)
        self.save_dir = save_dir
        self.fname = fname
        os.makedirs(save_dir, exist_ok=True)
        # pick up existing history so a resumed run appends instead of
        # truncating the pre-resume metric rows
        existing = os.path.join(save_dir, f"{fname}.csv")
        self.df: pd.DataFrame | None = (
            pd.read_csv(existing) if os.path.exists(existing) else None
        )

    def log(self, update_dict: dict, step: int, split: str = "") -> None:
        update_dict = dict(super().log(update_dict, step, split))
        update_dict["step"] = step
        row = pd.DataFrame([update_dict])
        self.df = row if self.df is None else pd.concat([self.df, row])
        self.df.to_csv(os.path.join(self.save_dir, f"{self.fname}.csv"), index=False)


class WandBLogger(Logger):
    def __init__(
        self,
        name: str,
        project: str,
        entity: str | None = None,
        group: str | None = None,
        mode: str = "online",
        config=None,
        **kwargs,
    ):
        super().__init__(config)
        try:
            import wandb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "wandb is not installed in this environment; use logger=csv"
            ) from e
        self._wandb = wandb
        wandb.init(
            name=name, project=project, entity=entity, group=group, mode=mode,
            config=config, **kwargs,
        )

    def watch(self, model, log="all", log_freq: int = 1000) -> None:
        self._wandb.watch(model, log=log, log_freq=log_freq)

    def log(self, update_dict: dict, step: int, split: str = "") -> None:
        update_dict = super().log(update_dict, step, split)
        self._wandb.log(update_dict, step=int(step))

    def log_summary(self, summary_dict: dict[str, Any]) -> None:
        for k, v in summary_dict.items():
            self._wandb.run.summary[k] = v

    def mark_preempting(self) -> None:
        self._wandb.mark_preempting()

    def log_artifact(self, name: str, type: str, file_location: str) -> None:
        art = self._wandb.Artifact(name=name, type=type)
        art.add_file(file_location)
        art.save()

    def finish(self) -> None:
        self._wandb.finish()


class PhaseTimer:
    """Per-phase wall-clock timers (sample/score/finetune) for the logger."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[f"time_{name}_s"] = time.perf_counter() - t0

    def pop(self) -> dict[str, float]:
        out, self.times = self.times, {}
        return out
