"""Op-level device-time breakdown of the fused tracking frame.

Captures a jax.profiler trace of N chained fused-frame dispatches (bench
configuration) and aggregates DEVICE-lane op durations by XLA op name, so
the frame budget is attributable to real device time — wall-clock timing
through the remote tunnel includes 1-30 ms link round trips per call and
cannot see inside the program.

    python scripts/trace_breakdown.py [--steps 12] [--top 30]

Prints total device time per frame and the top ops, plus a coarse stage
grouping (scatter/sort/gather = segmentation side; dot/cholesky/triangular
= fit side).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(steps: int, reps: int, window: bool, outdir: str):
    import jax
    import jax.numpy as jnp

    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.profiling import device_trace
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking import TrackerConfig
    from avatar_tpu.tracking_fused import FusedTracker

    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    gt.update()
    rend = AvatarRenderer(gt, intrin)
    depth = np.asarray(rend.render_depth((H, W)))
    scene = np.where(depth > 0, depth, 4.0).astype(np.float32)

    # match bench.py's cache loading exactly: the base tree plus bagged
    # siblings _1, _2, ... (a bare glob would also pull in unrelated
    # experiment files like bench_forest_g14c.srtr)
    paths = ["data/bench_forest.srtr"]
    k = 1
    while os.path.exists(f"data/bench_forest_{k}.srtr"):
        paths.append(f"data/bench_forest_{k}.srtr")
        k += 1
    trees = [RTree(p) for p in paths]
    for t in trees:
        t.partmap_type = 0
    cfg = TrackerConfig(data_interval=6, min_points=1000, frame_icp_iters=3,
                        iters_per_icp=4, label_conf_thresh=0.55,
                        rtree_interval=3,
                        part_groups=tuple(SMPL24_GROUP_LUT),
                        seg_window=(576, 448) if window else
                        TrackerConfig.seg_window)
    tracker = FusedTracker(model, intrin, (H, W),
                           rtree=trees if len(trees) > 1 else trees[0],
                           config=cfg)
    tracker.set_background(np.full((H, W), 4.0, np.float32))
    d_s = tracker._pre_stride(scene)
    u16 = jnp.asarray((d_s * 1000).astype(np.uint16))
    lab0 = jnp.zeros(tracker._proc_size, jnp.uint8)

    out = tracker._run(u16, lab0, steps)
    jax.block_until_ready(out)
    with device_trace(outdir):
        for _ in range(reps):
            out = tracker._run(u16, lab0, steps)
            tracker._theta = out.theta
        jax.block_until_ready(out)
    return reps


def analyze(outdir: str, reps: int, top: int):
    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace found under", outdir)
        return
    dur_by_op = defaultdict(float)
    INNER = defaultdict(lambda: defaultdict(float))
    long_names = {}
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        # device lanes: pid whose process_name mentions TPU/device XLA Ops
        pid_names = {}
        tid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    pid_names[ev["pid"]] = ev["args"].get("name", "")
                if ev.get("name") == "thread_name":
                    tid_names[(ev["pid"], ev.get("tid"))] = \
                        ev["args"].get("name", "")
        by_lane = defaultdict(list)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
            pname = pid_names.get(ev.get("pid"), "")
            # XLA op lane on the device process
            if "XLA Ops" not in tname:
                continue
            if "/device:" not in pname and "TPU" not in pname:
                continue
            by_lane[(ev.get("pid"), ev.get("tid"))].append(ev)
        for lane in by_lane.values():
            # keep TOP-LEVEL events only: while-loop bodies re-emit their
            # inner fusions as nested events on the same lane, which would
            # double-count the loop total
            lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
            open_end = -1.0
            parent = None
            for ev in lane:
                ts, dur = ev["ts"], ev.get("dur", 0)
                name = ev.get("name", "?")
                args = ev.get("args") or {}
                ln = args.get("long_name") or args.get("tf_op") or ""
                if ln and name not in long_names:
                    long_names[name] = ln
                if ts < open_end:     # nested inside a previous event
                    if parent is not None:
                        INNER[parent][name] += dur / 1e3
                    continue
                open_end = ts + dur
                parent = name
                dur_by_op[name] += dur / 1e3
                total += dur / 1e3
    per_frame = total / reps
    print(f"total device time: {total:.2f} ms over {reps} frames "
          f"-> {per_frame:.3f} ms/frame")
    groups = defaultdict(float)

    def bucket(name: str) -> str:
        n = name.lower()
        if "fusion" in n:
            return "fusion(mixed)"
        for k in ("scatter", "sort", "gather", "dot", "cholesky",
                  "triangular", "convert", "copy", "reduce", "while",
                  "dynamic", "select", "broadcast", "iota", "concatenate",
                  "custom-call", "transpose", "slice"):
            if k in n:
                return k
        return "other"

    for name, d in dur_by_op.items():
        groups[bucket(name)] += d
    print("\nby op class (ms/frame):")
    for k, v in sorted(groups.items(), key=lambda x: -x[1]):
        print(f"  {k:<16} {v / reps:8.3f}")
    print(f"\ntop {top} ops (ms/frame):")
    for name, d in sorted(dur_by_op.items(), key=lambda x: -x[1])[:top]:
        ln = long_names.get(name, "")
        print(f"  {d / reps:8.3f}  {name[:60]}  {ln[:140]}")
    for wname, inner in sorted(INNER.items(),
                               key=lambda x: -sum(x[1].values()))[:3]:
        tot = sum(inner.values())
        if tot < 1.0:
            continue
        print(f"\ninner breakdown of {wname} "
              f"({tot / reps:.3f} ms/frame nested):")
        for name, d in sorted(inner.items(), key=lambda x: -x[1])[:top]:
            ln = long_names.get(name, "")
            print(f"  {d / reps:8.3f}  {name[:48]}  {ln[:120]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--window", action="store_true", default=True)
    ap.add_argument("--outdir", default="/tmp/fused_trace")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        import shutil

        shutil.rmtree(args.outdir, ignore_errors=True)
        capture(args.steps, args.reps, args.window, args.outdir)
    analyze(args.outdir, args.reps, args.top)


if __name__ == "__main__":
    main()
