"""Step timing utilities.

Parity target: reference `NamedTimer` (`/root/reference/nemo/utils/timers.py`)
and the `TimingCallback` train_step_timing hook (exp_manager.py:121-163):
named start/stop accumulators with mean/std reporting, wired into the train
loop via StepTimingHook.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional


class NamedTimer:
    def __init__(self, reduction: str = "mean", sync_fn=None):
        self.reduction = reduction
        self._starts: Dict[str, float] = {}
        self._records: Dict[str, List[float]] = {}
        self._sync_fn = sync_fn  # e.g. lambda: float(last_metric) for device sync

    def start(self, name: str = ""):
        self._starts[name] = time.perf_counter()

    def stop(self, name: str = ""):
        if name not in self._starts:
            return
        if self._sync_fn is not None:
            self._sync_fn()
        dt = time.perf_counter() - self._starts.pop(name)
        self._records.setdefault(name, []).append(dt)
        return dt

    def get(self, name: str = "") -> Optional[float]:
        rec = self._records.get(name)
        if not rec:
            return None
        if self.reduction == "mean":
            return sum(rec) / len(rec)
        if self.reduction == "min":
            return min(rec)
        if self.reduction == "max":
            return max(rec)
        return rec[-1]

    def reset(self, name: Optional[str] = None):
        if name is None:
            self._records.clear()
            self._starts.clear()
        else:
            self._records.pop(name, None)

    @property
    def active_timers(self):
        return list(self._starts)


class StepTimingHook:
    """Rolling train_step_timing logger (TimingCallback analogue)."""

    def __init__(self, logger=None, log_every: int = 10, buffer_size: int = 100):
        self.timer = NamedTimer()
        self.logger = logger
        self.log_every = log_every
        self.buffer_size = buffer_size

    def before_step(self):
        self.timer.start("train_step")

    def after_step(self, step: int):
        self.timer.stop("train_step")
        recs = self.timer._records.get("train_step", [])
        if len(recs) > self.buffer_size:
            del recs[: -self.buffer_size]
        if self.logger and step % self.log_every == 0 and recs:
            self.logger.log(step, train_step_timing=sum(recs) / len(recs))
