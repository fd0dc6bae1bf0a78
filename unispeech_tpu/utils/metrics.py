"""Metrics aggregation + progress logging.

Replaces the reference logging layer (/root/reference/src/fairseq/logging/:
metrics.py nested aggregation contexts, meters.py Average/Time meters,
progress_bar.py json/tensorboard sinks) with a flat design suited to the JAX
step model: the jitted train step returns a metrics pytree of *sums*; a host-
side `MetricsAggregator` accumulates them between log intervals and derives
averages; sinks are pluggable (stdout JSON lines always; TensorBoard when
available).
"""

from __future__ import annotations

import json
import math
import sys
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import numpy as np


def safe_round(x, digits: int = 3):
    if x is None:
        return None
    x = float(x)
    if math.isfinite(x):
        return round(x, digits)
    return x


class MetricsAggregator:
    """Accumulate per-step metric sums; derive normalized values at log time.

    Matches the reference convention where criterion logging_outputs are
    summed across workers/steps and reduce_metrics divides by sample_size
    (src/fairseq/criterions/*.py reduce_metrics).
    """

    def __init__(self):
        self.sums: Dict[str, float] = defaultdict(float)
        self.n_steps = 0
        self._derived: Dict[str, Callable[[Dict[str, float]], float]] = {}
        self._t0 = time.time()

    def add_derived(self, name: str, fn: Callable[[Dict[str, float]], float]):
        self._derived[name] = fn

    def update(self, step_metrics: Dict) -> None:
        for k, v in step_metrics.items():
            self.sums[k] += float(np.asarray(v))
        self.n_steps += 1

    def snapshot(self) -> Dict[str, float]:
        out = dict(self.sums)
        ss = max(out.get("sample_size", 0.0), 1.0)
        derived = {}
        if "loss" in out:
            derived["loss_avg"] = out["loss"] / ss
        for name, fn in self._derived.items():
            try:
                derived[name] = fn(out)
            except Exception:
                pass
        derived["steps"] = self.n_steps
        derived["elapsed_s"] = time.time() - self._t0
        if derived["elapsed_s"] > 0:
            derived["steps_per_s"] = self.n_steps / derived["elapsed_s"]
        out.update(derived)
        return out

    def reset(self) -> None:
        self.sums.clear()
        self.n_steps = 0
        self._t0 = time.time()


class ProgressLogger:
    """JSON-lines progress sink (reference json progress bar,
    progress_bar.py:28-74) + optional TensorBoard / wandb / Azure ML.

    wandb and Azure ML mirror the reference's WandBProgressBarWrapper /
    AzureMLProgressBarWrapper (progress_bar.py:324-420): both are gated on
    their packages being installed AND an explicit opt-in (wandb_project /
    azureml=True), and both fail soft — a sink import error never takes
    down training."""

    def __init__(self, tag: str = "train", tensorboard_dir: Optional[str] = None,
                 stream=None, wandb_project: Optional[str] = None,
                 azureml: bool = False):
        self.tag = tag
        self.stream = stream or sys.stderr
        self._tb = None
        self._wandb = None
        self._aml = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None
        if wandb_project:
            try:
                import wandb

                if wandb.run is None:
                    wandb.init(project=wandb_project, reinit=False)
                self._wandb = wandb
            except Exception:
                self._wandb = None
        if azureml:
            try:
                from azureml.core import Run

                self._aml = Run.get_context()
            except Exception:
                self._aml = None

    def log(self, step: int, stats: Dict[str, float]) -> None:
        rec = {"tag": self.tag, "step": step}
        rec.update({k: safe_round(v) for k, v in stats.items()})
        print(json.dumps(rec), file=self.stream, flush=True)
        scalars = {
            k: float(v) for k, v in stats.items()
            if isinstance(v, (int, float)) and math.isfinite(float(v))
        }
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{self.tag}/{k}", v, step)
        if self._wandb is not None:
            self._wandb.log(
                {f"{self.tag}/{k}": v for k, v in scalars.items()}, step=step
            )
        if self._aml is not None:
            for k, v in scalars.items():
                self._aml.log(f"{self.tag}/{k}", v)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


class StopwatchMeter:
    """start/stop accumulation (reference meters.py:StopwatchMeter)."""

    def __init__(self):
        self.sum = 0.0
        self.n = 0
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self, n: int = 1):
        if self._start is not None:
            self.sum += time.perf_counter() - self._start
            self.n += n
            self._start = None

    @property
    def avg(self) -> float:
        return self.sum / max(self.n, 1)
