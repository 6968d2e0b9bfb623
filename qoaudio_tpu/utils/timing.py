"""Throughput / profiling helpers for the bench harness and CLI.

The reference's only observability is Criterion wall-clock benches
(/root/reference/benches/qoa_benchmarks.rs); here we add samples/sec
counters and optional ``jax.profiler`` traces (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time


class Stopwatch:
    """Wall-clock timer with samples/sec reporting."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    def msamples_per_sec(self, n_samples: int) -> float:
        return n_samples / self.elapsed / 1e6 if self.elapsed else float("inf")


def bench_fn(fn, *args, warmup: int = 1, iters: int = 3):
    """Time fn(*args) after warmup; returns (best_seconds, result).

    Blocks on JAX async dispatch if the result is a jax array tree.
    """
    import jax

    result = None
    for _ in range(warmup):
        result = fn(*args)
        jax.block_until_ready(result)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result = fn(*args)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return best, result


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Optionally wrap a block in a jax.profiler trace."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
