"""Profiling / tracing utilities (SURVEY.md §5.1 TPU equivalent).

The reference only wall-clocks the train loop (trainer.cpp:130-154). Here:
- `trace()` wraps a block in a jax.profiler trace (view in TensorBoard/xprof);
- `device_time()` measures the true device cost of a jitted step function by
  running K iterations inside one lax.scan and fetching a scalar — the only
  honest clock under async dispatch (and under tunneled runtimes where
  block_until_ready may not block);
- `StageTimer` aggregates named host-side stage timings for logging.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context. Open the result with xprof/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(step_fn: Callable, carry, k: int = 10, rounds: int = 2) -> float:
    """True per-iteration device seconds of `step_fn(carry, it) -> carry`.

    Runs k iterations inside one jitted lax.scan, forces completion with a
    scalar fetch, repeats `rounds` times and averages.
    """

    def body(c, it):
        c = step_fn(c, it)
        return c, jnp.zeros(())

    @jax.jit
    def run_k(c):
        c, _ = jax.lax.scan(body, c, jnp.arange(k, dtype=jnp.float32))
        probe = jax.tree.leaves(c)[0]
        return c, jnp.sum(probe).astype(jnp.float32) * 0.0

    carry, probe = run_k(carry)
    float(probe)  # compile + warmup barrier
    t0 = time.perf_counter()
    for _ in range(rounds):
        carry, probe = run_k(carry)
        float(probe)
    return (time.perf_counter() - t0) / (rounds * k)


class StageTimer:
    """Named wall-clock accumulators for host-side stages."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {t / c * 1e3:.1f} ms avg x{c}")
        return "\n".join(lines)
