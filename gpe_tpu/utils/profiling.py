"""Tracing & throughput measurement (SURVEY.md §5: absent in the reference;
here: jax.profiler integration + the collocation-pts/sec/chip meter that
BASELINE.json names as the primary metric)."""
from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that blocks on device work for honest boundaries."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def throughput_meter(fn, args, n_points: int, warmup: int = 3, iters: int = 20):
    """Measure collocation points/sec/chip for a jitted fn(*args) whose cost
    scales with n_points. Blocks on the last output."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    n_chips = max(jax.device_count(), 1)
    return {"pts_per_sec": n_points / dt, "pts_per_sec_per_chip": n_points / dt / n_chips,
            "sec_per_iter": dt}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gpe_tpu_trace"):
    """jax.profiler trace context — open in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
