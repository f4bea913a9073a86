"""Live tracking from a camera (or synthetic/dataset playback source).

Rebuild of reference live-demo.cpp (flags live-demo.cpp:60-120): threaded
capture, background capture on demand, tracking-loss reinitialization, and
Lambert overlay output.  The camera backends are pluggable (k4a, freenect2,
synthetic, or a dataset directory — see io/camera.py).

    python -m avatar_tpu.tools.live_demo --camera synthetic RTREE [options]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from avatar_tpu.io.camera import open_camera
from avatar_tpu.perception.rtree import RTree
from avatar_tpu.tools.common import add_model_args, load_model
from avatar_tpu.tracking import Tracker, TrackerConfig


def build_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("rtree", nargs="?", default="",
                    help="forest model path (.srtr)")
    ap.add_argument("--camera", default="synthetic",
                    help="'k4a', 'freenect2', 'synthetic', or a dataset dir")
    ap.add_argument("--betapose", type=float, default=0.05)
    ap.add_argument("--betashape", type=float, default=0.12)
    ap.add_argument("-I", "--data-interval", type=int, default=12)
    ap.add_argument("-t", "--frame-icp-iters", type=int, default=3)
    ap.add_argument("-T", "--reinit-icp-iters", type=int, default=5)
    ap.add_argument("--initial-icp-iters", type=int, default=7)
    ap.add_argument("--inner-iters", type=int, default=10)
    ap.add_argument("-M", "--min-points", type=int, default=1000)
    ap.add_argument("--nn-dist", type=float, default=0.002,
                    help="bg subtractor nn distance rel (live-demo.cpp)")
    ap.add_argument("--neighb-dist", type=float, default=0.001)
    ap.add_argument("--dist-to-pre-weight", type=float, default=0.001)
    ap.add_argument("--frames", type=int, default=0,
                    help="stop after N frames (0 = run until interrupted)")
    ap.add_argument("--out", default="", help="write overlay frames here")
    ap.add_argument("--capture-bg-after", type=int, default=0,
                    help="treat frame N as the background "
                         "(the reference binds this to the 'b' key)")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--metrics", default="",
                    help="write per-frame metrics JSONL here")
    ap.add_argument("--part-groups", action="store_true",
                    help="group-level correspondence for 24-part SMPL trees")
    ap.add_argument("--beta-temp", type=float, default=None,
                    help="temporal pose-prior weight (fused tracker; "
                         "default from TrackerConfig)")
    ap.add_argument("--no-render-labels", action="store_true",
                    help="disable the model-predicted label override")
    add_model_args(ap)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    model = load_model(args)
    cam = open_camera(args.camera)
    intrin = cam.intrinsics()
    H, W = cam.image_size()
    rtree = RTree(args.rtree) if args.rtree else None

    part_groups = None
    if args.part_groups:
        from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT

        part_groups = tuple(SMPL24_GROUP_LUT)
    cfg = TrackerConfig(
        beta_pose=args.betapose, beta_shape=args.betashape,
        data_interval=args.data_interval,
        frame_icp_iters=args.frame_icp_iters,
        reinit_icp_iters=args.reinit_icp_iters,
        initial_icp_iters=args.initial_icp_iters,
        iters_per_icp=args.inner_iters, min_points=args.min_points,
        nn_dist_thresh_rel=args.nn_dist,
        neighb_thresh_rel=args.neighb_dist,
        dist_to_pre_weight=args.dist_to_pre_weight,
        part_groups=part_groups,
        **({} if args.beta_temp is None
           else dict(beta_temp=args.beta_temp)),
        render_labels=not args.no_render_labels)
    if args.fused:
        from avatar_tpu.tracking_fused import FusedTracker

        tracker = FusedTracker(model, intrin, (H, W), rtree=rtree, config=cfg)
    else:
        tracker = Tracker(model, intrin, (H, W), rtree=rtree, config=cfg)
    if args.metrics:
        tracker.open_metrics(args.metrics)

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    cam.begin_capture()
    n = 0
    last_id = -1
    oracle = None
    try:
        while True:
            frame, fid = cam.get_frame()
            if frame is None or fid == last_id:
                time.sleep(0.002)
                continue
            last_id = fid
            xyz, rgb = frame
            if args.capture_bg_after and n == args.capture_bg_after:
                tracker.set_background(xyz)
                print("[live] background captured", file=sys.stderr)
            if rtree is None and hasattr(cam, "gt"):
                # synthetic camera without a forest: oracle labels
                from avatar_tpu.render.renderer import AvatarRenderer

                rend = AvatarRenderer(cam.gt, intrin)
                oracle = rend.render_part_mask((H, W))
            res = tracker.track(xyz, labels_override=oracle)
            status = ("ok" if res.ok else "lost")
            if n % 10 == 0:
                print(f"frame {n}: {status} pts={res.n_points}",
                      file=sys.stderr)
            if args.out and res.ok and not args.fused:
                overlay = tracker.render_overlay(rgb)
                try:
                    import cv2

                    cv2.imwrite(os.path.join(args.out,
                                             f"live_{n:06d}.png"), overlay)
                except ImportError:
                    pass
            n += 1
            if args.frames and n >= args.frames:
                break
    finally:
        cam.end_capture()
    if args.metrics:
        tracker.close_metrics()
    print(tracker.timer.report())


if __name__ == "__main__":
    main()
