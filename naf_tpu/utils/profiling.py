"""Profiler integration (SURVEY §5: the reference has none — manual CUDA
events only; the TPU equivalent is jax.profiler traces).

    with trace("/tmp/naf_trace"):
        f(x).block_until_ready()
    # inspect with TensorBoard's profile plugin or xprof

`profile_fn` captures a trace around N chained executions of a jitted
callable using the same tunnel-safe chaining as
naf_tpu.utils.benchmarking.device_time_ms.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["trace", "profile_fn"]


@contextlib.contextmanager
def trace(log_dir: str):
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_fn(fn, *args, log_dir: str = "/tmp/naf_trace", iters: int = 5):
    """Trace `iters` chained executions of fn(*args); returns log_dir."""
    from naf_tpu.utils.benchmarking import _make_loop

    loop = _make_loop(fn, iters)
    float(loop(*args))  # compile outside the trace
    with trace(log_dir):
        float(loop(*args))
    return log_dir
