"""Training telemetry: JSONL scalar logging + optional wandb + profiler hooks.

The reference logs scalars to wandb when available (`train_dynamic_update_prune.py:615-629`)
and keeps only a tqdm readout otherwise; no profiler exists (SURVEY.md par. 5).
Here every run writes machine-readable `stats.jsonl`, mirrors to wandb when the
package is importable and requested, and can capture `jax.profiler` traces.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class StatsLogger:
    def __init__(self, output_path: str, *, use_wandb: bool = False, project: str = "", run_name: str = ""):
        self._path = os.path.join(output_path, "stats.jsonl")
        os.makedirs(output_path, exist_ok=True)
        self._fh = open(self._path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project or "rick-tpu", name=run_name or None, reinit=True)
            except ImportError:
                self._wandb = None

    def log(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "t": round(time.time() - self._t0, 3), **scalars}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def close(self):
        self._fh.close()


class ProfilerHook:
    """Capture a jax.profiler trace window around selected iterations."""

    def __init__(self, trace_dir: str, start_iter: int = 10, num_iters: int = 5):
        self.trace_dir = trace_dir
        self.start_iter = start_iter
        self.stop_iter = start_iter + num_iters
        self._active = False

    def step(self, i: int):
        if not self.trace_dir:
            return
        import jax

        if i == self.start_iter and not self._active:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif i == self.stop_iter and self._active:
            jax.profiler.stop_trace()
            self._active = False
