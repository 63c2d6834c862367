"""Metrics logging & profiling utilities.

TPU-native replacement for the reference's dormant observability residue
(`utils/misc.py:127-339`: TensorboardLogger, MetricLogger, SmoothedValue):
a windowed-stat tracker, a JSONL metrics sink (greppable, no TB daemon
dependency), and a `jax.profiler` trace context for on-device profiling
(the reference has no profiler integration at all — SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional


class SmoothedValue:
    """Windowed median/avg tracker (`utils/misc.py` SmoothedValue)."""

    def __init__(self, window: int = 30):
        self.window = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.window.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return sum(self.window) / max(len(self.window), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def median(self) -> float:
        s = sorted(self.window)
        return s[len(s) // 2] if s else 0.0


class MetricLogger:
    """Iteration logger with JSONL persistence (`utils/misc.py` MetricLogger
    re-designed: metrics stream to a file instead of a TB daemon)."""

    def __init__(self, jsonl_path: Optional[str] = None, window: int = 30):
        self.meters: Dict[str, SmoothedValue] = defaultdict(
            lambda: SmoothedValue(window))
        self.jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)

    def update(self, step: Optional[int] = None, **metrics: float):
        for k, v in metrics.items():
            self.meters[k].update(float(v))
        if self.jsonl_path:
            rec = {"t": time.time(), **{k: float(v) for k, v in
                                        metrics.items()}}
            if step is not None:
                rec["step"] = int(step)
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def summary(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def __str__(self) -> str:
        return "  ".join(
            f"{k}: {m.avg:.4f} ({m.global_avg:.4f})"
            for k, m in self.meters.items())


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock stage timer (replaces the reference's ad-hoc
    time.time() prints, `learnable_transformation_mat_qkv_fp4.py:306-309`)."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)
