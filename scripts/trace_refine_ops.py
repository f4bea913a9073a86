"""Op-level XLA trace of fit_refine: which ops eat the per-step time.

Captures a jax.profiler device trace of fit_refine(n_steps=8) and prints
the top leaf ops by total device time, with their op names — one level
deeper than profiling.trace_attribution's stage buckets.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from avatar_tpu.core.lbs import lbs
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.optim.gauss_newton import Theta, fit_refine
    from avatar_tpu.optim.surface import vertex_face_rings
    from avatar_tpu.profiling import device_trace
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking_fused import FusedTracker

    model = synthetic_model(detail=6)
    P = model.num_points()
    J = model.num_joints()
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    tracker = FusedTracker(model, intrin, (720, 1280))
    ctx = tracker._ctx
    rng = np.random.default_rng(0)
    N = 8192
    av_w = jnp.zeros(model.num_shape_keys(), jnp.float32)
    av_p = jnp.asarray([0.0, 0.0, 2.2], jnp.float32)
    av_r = jnp.asarray(np.tile(np.eye(3), (J, 1, 1)), jnp.float32)
    theta = Theta(p=av_p, rots=av_r, w=av_w)
    verts, _, _, _ = lbs(model.params, model.parents, av_w, av_p, av_r)
    pick = rng.integers(0, P, N)
    pts = jnp.asarray(np.asarray(verts)[pick] +
                      rng.normal(0, 0.004, (N, 3)).astype(np.float32))
    parts = jnp.asarray(np.asarray(ctx.model_part)[pick].astype(np.int32))
    ring = jnp.asarray(vertex_face_rings(np.asarray(model.faces), P))
    bp = jnp.asarray(0.003, jnp.float32)
    bs = jnp.asarray(0.012, jnp.float32)

    fn = jax.jit(lambda: fit_refine(
        ctx, model.parents, ring, pts, parts, theta, bp, bs, n_steps=8,
        num_parts=tracker.num_parts, freeze_shape=True)[0].p)
    jax.block_until_ready(fn())

    REPS = 10
    log_dir = tempfile.mkdtemp(prefix="refine_trace_")
    with device_trace(log_dir):
        for _ in range(REPS):
            out = fn()
        jax.block_until_ready(out)

    files = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    ops = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        tid_names = {}
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    pid_names[ev["pid"]] = ev["args"].get("name", "")
                if ev.get("name") == "thread_name":
                    tid_names[(ev["pid"], ev.get("tid"))] = \
                        ev["args"].get("name", "")
        lane = []
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if "XLA Ops" not in tid_names.get(
                    (ev.get("pid"), ev.get("tid")), ""):
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "/device:" not in pname and "TPU" not in pname:
                continue
            lane.append(ev)
        lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
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
            name = ev.get("name", "?")
            ops[name] += ev.get("dur", 0) / 1e3
            cnt[name] += 1

    print(f"total device {total / REPS:.3f} ms per fit_refine(8) call")
    print(f"{'op':60s} {'ms/call':>8s} {'n/call':>7s}")
    for name, ms in sorted(ops.items(), key=lambda x: -x[1])[:30]:
        print(f"{name[:60]:60s} {ms / REPS:8.3f} {cnt[name] / REPS:7.1f}")

    # details (source line / expression) for the top ops
    want = {n for n, _ in sorted(ops.items(), key=lambda x: -x[1])[:12]}
    seen = set()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or ev.get("name") not in want:
                continue
            if ev["name"] in seen:
                continue
            seen.add(ev["name"])
            args = ev.get("args") or {}
            print(f"\n== {ev['name']}")
            for k in ("long_name", "tf_op", "source", "source_stack",
                      "shape", "expression"):
                if args.get(k):
                    print(f"   {k}: {str(args[k])[:300]}")


if __name__ == "__main__":
    main()
