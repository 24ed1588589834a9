"""Metrics, logging, and profiling utilities.

Capability parity with the reference's misc runtime utils (src/utils/misc.py:
28-265: SmoothedValue, MetricLogger) plus what the reference lacks
(SURVEY.md §5): structured JSONL logs, stage timers, and jax.profiler trace
hooks for TPU tracing.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict, deque


class SmoothedValue:
    """Windowed + global average of a scalar series (misc.py:28-87)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Smoothed metric aggregation + optional JSONL file sink (misc.py:160-265)."""

    def __init__(self, log_file: str | None = None, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.log_file = log_file

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def log(self, **kwargs) -> None:
        """Update meters, print one line, and append a JSONL record."""
        numeric = {k: v for k, v in kwargs.items() if isinstance(v, (int, float))}
        self.update(**numeric)
        line = self.delimiter.join(f"{k}: {v}" for k, v in kwargs.items())
        print(line, flush=True)
        if self.log_file:
            with open(self.log_file, "a") as f:
                f.write(json.dumps({"ts": time.time(), **kwargs}) + "\n")

    def __getattr__(self, name: str) -> SmoothedValue:
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())


class StageTimer:
    """Accumulating per-stage wall-clock timers for the pipeline driver."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    def summary(self) -> dict[str, dict]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1000 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


def topk_accuracy(logits, targets, ks=(1,)) -> list[float]:
    """Top-k classification accuracy in percent (misc.py:415-431)."""
    import numpy as np

    logits = np.asarray(logits)
    targets = np.asarray(targets).reshape(-1)
    order = np.argsort(-logits.reshape(len(targets), -1), axis=-1)
    out = []
    for k in ks:
        hit = (order[:, :k] == targets[:, None]).any(axis=1)
        out.append(float(hit.mean() * 100.0))
    return out


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
