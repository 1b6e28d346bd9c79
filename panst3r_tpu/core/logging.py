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


class MLFlowLogger(Logger):
    """MLflow backend (reference logging.py:111-141, env
    MLFLOW_TRACKING_URI); requires the mlflow package."""

    def __init__(self, output_dir, project="panst3r_tpu", config=None):
        import mlflow

        self.mlflow = mlflow
        mlflow.set_experiment(project)
        self.run = mlflow.start_run()
        if config:
            mlflow.log_params({k: str(v)[:250] for k, v in config.items()})

    def log(self, values: dict, step: float):
        self.mlflow.log_metrics({k.replace("/", "_"): float(v)
                                 for k, v in values.items()},
                                step=int(step * 1000))

    def close(self):
        self.mlflow.end_run()


class SmoothedValue:
    """Windowed running statistic (croco MetricLogger building block —
    reference engine/train.py:67-68)."""

    def __init__(self, window_size: int = 20):
        from collections import deque

        self.window = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.window.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return (sum(self.window) / len(self.window)) if self.window else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / self.count if self.count else 0.0


class MetricLogger:
    """Smoothed metric aggregation (croco MetricLogger equivalent).

    Cross-process synchronization happens by construction: metrics derive
    from globally-reduced jit outputs (GSPMD), so there is no NCCL
    `synchronize_between_processes` step to replicate."""

    def __init__(self, window_size: int = 20):
        self.meters: dict[str, SmoothedValue] = {}
        self.window_size = window_size

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters.setdefault(
                k, SmoothedValue(self.window_size)).update(float(v))

    def global_avgs(self) -> dict:
        return {k: m.global_avg for k, m in self.meters.items()}

    def __str__(self):
        return "  ".join(f"{k}: {m.avg:.4f}" for k, m in self.meters.items())


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
    """Logger selection (reference train.py:256-264).

    Multi-host: only process 0 writes (reference rank-gates its logger
    construction the same way, train.py:257); other ranks get a no-op
    LoggerList so call sites stay rank-agnostic."""
    import jax

    if jax.process_index() != 0:
        return LoggerList([])
    loggers: list[Logger] = [JsonlLogger(output_dir)]
    backend = {"tensorboard": TBLogger, "wandb": WandbLogger,
               "mlflow": MLFlowLogger}.get(kind)
    if backend is not None:
        try:
            loggers.append(backend(output_dir))
        except Exception:
            pass
    return LoggerList(loggers)
