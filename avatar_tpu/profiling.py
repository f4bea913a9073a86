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


# v5e ("TPU v5 lite") peak: 197 bf16 TFLOP/s per chip.  The fit's HIGHEST-
# precision f32 contractions run below this rate, so MFU vs the bf16 peak is
# a conservative (lower-bound) utilization figure.
PEAK_FLOPS_V5E = 197e12


def trace_attribution(log_dir: str, reps: int) -> dict:
    """Parse a jax.profiler trace -> per-frame device-stage attribution.

    Walks every device "XLA Ops" lane, keeps LEAF events (while-loop bodies
    re-emit their inner ops per iteration on the same lane, so leaves
    partition the real busy time), and buckets each by the python source
    file recorded in the event's op metadata.  Also sums per-op
    ``model_flops`` so an MFU estimate needs no analytic FLOP model.

    Returns {"total_ms": per-frame device ms, "stages": {bucket: ms},
             "gflops": executed GFLOP per frame, "mfu": vs PEAK_FLOPS_V5E}.
    """
    import glob
    import gzip
    import json
    import os
    from collections import defaultdict

    files = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    stages = defaultdict(float)
    stage_flops = defaultdict(float)
    total = 0.0
    flops = 0.0

    def bucket(args: dict) -> str:
        # named scopes in the fused frame (tracking_fused.py) land in the
        # op name hierarchy (tf_op) -- the authoritative stage tag; fall
        # back to the python source file for code outside a scope
        src = (args.get("source_stack") or args.get("source") or "")
        top = (args.get("tf_op") or "")
        if "fit/" in top or "jit(fit)" in top:
            return "fit"
        if "forest_walk" in top:
            return "walk"
        if "blob_suppress" in top:
            return "blob_cc"
        if "bgsub" in top:
            return "bgsub"
        if "gauss_newton.py" in src or "nn_pallas" in src or \
                "correspond.py" in src:
            return "fit"
        if "rtree.py" in src and "suppress" not in src:
            return "walk"
        if "/cc.py" in src or "suppress_part_nonmax" in src:
            return "blob_cc"
        if "bgsub.py" in src:
            return "bgsub"
        if "tracking_fused.py" in src:
            return "frame_glue"
        return "other"

    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        tid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    pid_names[ev["pid"]] = ev["args"].get("name", "")
                if ev.get("name") == "thread_name":
                    tid_names[(ev["pid"], ev.get("tid"))] = \
                        ev["args"].get("name", "")
        lanes = defaultdict(list)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if "XLA Ops" not in tid_names.get(
                    (ev.get("pid"), ev.get("tid")), ""):
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "/device:" not in pname and "TPU" not in pname:
                continue
            lanes[(ev.get("pid"), ev.get("tid"))].append(ev)
        for lane in lanes.values():
            lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
            # total from top-level events; stages/flops from leaves
            open_end = -1.0
            for ev in lane:
                if ev["ts"] >= open_end:
                    open_end = ev["ts"] + ev.get("dur", 0)
                    total += ev.get("dur", 0) / 1e3
            for i, ev in enumerate(lane):
                end = ev["ts"] + ev.get("dur", 0)
                is_leaf = not (i + 1 < len(lane) and lane[i + 1]["ts"] < end)
                if not is_leaf:
                    continue
                args = ev.get("args") or {}
                b = bucket(args)
                stages[b] += ev.get("dur", 0) / 1e3
                try:
                    f = float(args.get("model_flops", 0) or 0)
                except (TypeError, ValueError):
                    f = 0.0
                flops += f
                stage_flops[b] += f
    total /= max(reps, 1)
    fit_ms = stages.get("fit", 0.0) / max(reps, 1)
    fit_gf = stage_flops.get("fit", 0.0) / max(reps, 1) / 1e9
    return {
        "total_ms": round(total, 3),
        "stages": {k: round(v / max(reps, 1), 3)
                   for k, v in sorted(stages.items(), key=lambda x: -x[1])},
        "gflops": round(flops / max(reps, 1) / 1e9, 3),
        "mfu": round(flops / max(reps, 1) / 1e9 /
                     max(total, 1e-9) / (PEAK_FLOPS_V5E / 1e12), 5),
        "mfu_fit": round(fit_gf / max(fit_ms, 1e-9) /
                         (PEAK_FLOPS_V5E / 1e12), 5),
    }


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
