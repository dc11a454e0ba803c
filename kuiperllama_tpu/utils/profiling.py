"""Profiling and timing utilities.

Supersedes the reference's TICK/TOCK wall-clock macros (base/tick.h:7-12)
and the demos' steps/s printf (demo/main.cpp:66-73):
  * Timer / timed(): monotonic phase timers with a summary table;
  * trace(): jax.profiler capture — the TPU-native "nsight" (view in
    TensorBoard / xprof); wraps a code region and writes a trace dir;
  * device_time(): robust on-device timing of a jittable function by
    chaining it N times inside one jit (dispatch/transfer latency on a
    tunneled single chip otherwise swamps microsecond kernels).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


class Timer:
    """Accumulating named phase timer (host wall clock)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        width = max((len(k) for k in self.totals), default=4)
        lines = [f"{'phase':<{width}}  {'total_s':>9}  {'calls':>6}  {'avg_ms':>8}"]
        for name, total in rows:
            n = self.counts[name]
            lines.append(
                f"{name:<{width}}  {total:>9.3f}  {n:>6}  {total / n * 1e3:>8.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/kuiper_trace"):
    """Capture a jax.profiler device trace around the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 64, reps: int = 10) -> float:
    """Median per-call device time of `fn(*args)`.

    Chains `iters` dependent calls of fn inside one jit and subtracts a
    1-call baseline, so per-dispatch and transfer latency cancel. fn must
    map its first argument's pytree to a like-shaped pytree (or a pytree
    whose first leaf feeds back).
    """

    @partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        def body(i, acc):
            out = fn(acc, *args[1:])
            return out if isinstance(out, type(acc)) else acc
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
            jax.lax.fori_loop(0, k, body, args[0]), 0.0,
        )

    import numpy as np

    def run(k):
        float(chain(args[0], k))  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(args[0], k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = run(1)
    tn = run(iters + 1)
    return max((tn - t1) / iters, 0.0)


def log_json(event: str, **fields):
    """One-line structured log record (stderr)."""
    import json
    import sys

    rec = {"ts": time.time(), "event": event, **fields}
    print(json.dumps(rec), file=sys.stderr)
