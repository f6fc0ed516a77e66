"""Metrics logging with pluggable backends.

The reference hard-depends on wandb (src/opt.py:135-163, src/utils.py);
here logging goes through a MetricLogger that writes JSONL locally and
forwards to wandb only if it is installed and enabled.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, jsonl_path: str = "", use_wandb: bool = False, run=None):
        self._jsonl_path = jsonl_path
        self._fh = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._fh = open(jsonl_path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401

                self._wandb = run or wandb
            except ImportError:
                pass
        self._t0 = time.time()

    def log(self, metrics: dict, step: Optional[int] = None):
        record = dict(metrics)
        if step is not None:
            record["step"] = step
        record["wall_time"] = round(time.time() - self._t0, 3)
        if self._fh is not None:
            self._fh.write(json.dumps(record, default=float) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class ThroughputMeter:
    """Chain-steps/sec unit conversion (the north-star metric, SURVEY.md §5).

    The measurement itself lives in the trainer, which times whole fused
    chunks between host materializations — a wall-clock delta taken per
    callback firing is meaningless when several firings land inside one
    jitted chunk (near-zero host delta between them).
    """

    def __init__(self, chains_per_step: int, bridges_per_step: int):
        self.chain_steps_per_iter = chains_per_step * bridges_per_step

    def chain_rate(self, steps_per_sec: float) -> float:
        return steps_per_sec * self.chain_steps_per_iter
