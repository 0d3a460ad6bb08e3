"""Profiling instruments.

The reference records named wall-clock segments as tabular metrics
(Time-EnvSampling etc.) via logger.ProfileKV (reference logger.py:287-311) —
kept in utils/logging.py. This module adds the device-level layer the
reference never had: jax.profiler traces viewable in TensorBoard/Perfetto,
and a simple timing helper that blocks on device results.
"""
import contextlib
import time

import jax

from learning_to_adapt_tpu.utils import logging as logger


@contextlib.contextmanager
def device_trace(logdir):
    """Capture a jax.profiler trace (XLA ops, TPU timelines) for the managed
    region. View with TensorBoard or ui.perfetto.dev."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def blocked_timer(name, log=True):
    """Wall-clock a region including device completion (block_until_ready on
    exit is the caller's job for async dispatch; this is for host-visible
    sections)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if log:
        logger.logkv_mean(f'Profile-{name}', dt)


def time_jitted(fn, *args, iters=10):
    """Measure steady-state wall time of a jitted function: one warmup call
    (compile) then `iters` timed calls with a final block."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
