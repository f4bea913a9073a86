"""Device-stage profiling helpers (SURVEY §5.1).

The host-side StageTimer (utils.py) measures wall time per pipeline stage,
which conflates device compute with the host<->device link.  These helpers
capture XLA/TPU device traces so device time is attributable per-op:

    from avatar_tpu.profiling import device_trace
    with device_trace("/tmp/trace"):          # view with xprof/tensorboard
        tracker.track(frame)

    stats = time_jitted(fn, *args)            # robust device-only timing

The reference's equivalent is the printf timing scattered through
AvatarOptimizer.cpp (e.g. 1390-1393, 1486) — here a single context manager
produces a full op-level timeline instead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace into ``log_dir`` (xprof format).

    View with ``tensorboard --logdir <log_dir>`` or the xprof UI.  Safe to
    nest around jitted calls; adds no overhead outside the context.
    """
    import jax

    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=opts)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, iters: int = 20, warmup: int = 2,
                **kwargs) -> dict:
    """Time a jitted callable's device execution (blocking each call).

    Returns {"mean_ms", "min_ms", "p50_ms", "iters"}.  The first ``warmup``
    calls (compile + autotune) are excluded.
    """
    import jax
    import numpy as np

    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(samples)
    return {"mean_ms": float(arr.mean()), "min_ms": float(arr.min()),
            "p50_ms": float(np.median(arr)), "iters": iters}


def time_amortized(fn: Callable, *args, iters: int = 20, warmup: int = 2,
                   **kwargs) -> dict:
    """Amortized device timing: dispatch ``iters`` calls back-to-back and
    block ONCE at the end.

    On a remote-tunnel deployment (this environment: one TPU chip behind a
    high-RTT link) every blocking call in time_jitted pays a full link round
    trip — 1-30+ ms that says nothing about the device.  Async PjRt dispatch
    queues all ``iters`` executions on device; the single final block pays
    one RTT amortized over the batch.  Returns {"ms", "iters"} where ``ms``
    is per-call device+dispatch time.
    """
    import jax

    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return {"ms": (time.perf_counter() - t0) / iters * 1e3, "iters": iters}
