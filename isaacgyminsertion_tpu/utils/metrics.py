"""Metrics / logging utilities.

Parity targets: utils/misc.py `AverageScalarMeter` (misc.py:108), the
tensorboardX writer + scalar families of frozen_ppo.py:186-189, 279-321
(losses/*, performance/RLTrainFPS, performance/EnvStepFPS, episode_*), and
the wall-clock split data_collect_time vs rl_train_time (SURVEY.md §5).
wandb is optional in the reference (config.yaml:55-61) and absent in this
image, so the writer falls back to TB + JSONL.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque


class AverageScalarMeter:
    """Windowed scalar average (misc.py:108)."""

    def __init__(self, window_size: int = 100):
        self.window_size = window_size
        self.deque: deque = deque(maxlen=window_size)

    def update(self, values):
        try:
            iter(values)
        except TypeError:
            values = [values]
        for v in values:
            self.deque.append(float(v))

    @property
    def current_mean(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)


class Timer:
    """Wall-clock phase split: data-collect vs train (frozen_ppo.py:497-500)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._start: dict[str, float] = {}

    def start(self, phase: str):
        self._start[phase] = time.perf_counter()

    def stop(self, phase: str):
        self.totals[phase] = self.totals.get(phase, 0.0) + (
            time.perf_counter() - self._start.pop(phase)
        )


class MetricsWriter:
    """TensorBoard (tensorboardX) + JSONL metrics sink."""

    def __init__(self, out_dir: str, use_tb: bool = True,
                 wandb_project: str | None = None, wandb_run: str | None = None):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tb:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None
        # optional wandb sink (reference runner.py:626-633 / config.yaml:55-61
        # wandb_activate block); enabled by wandb_project or IGT_WANDB_PROJECT.
        # wandb is not in this image — the hook degrades to a no-op.
        self.wandb = None
        project = wandb_project or os.environ.get("IGT_WANDB_PROJECT")
        if project:
            try:
                import wandb

                self.wandb = wandb.init(project=project, name=wandb_run,
                                        dir=out_dir, resume="allow")
            except Exception:
                self.wandb = None

    def write(self, step: int, scalars: dict):
        rec = {"step": int(step)}
        for k, v in scalars.items():
            v = float(v)
            rec[k] = v
            if self.tb is not None:
                self.tb.add_scalar(k, v, step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.wandb is not None:
            self.wandb.log(dict(rec), step=int(step))

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()
