"""Tracking-quality evaluation harness (CPU- or TPU-runnable).

Runs the FusedTracker over the bench's synthetic ground-truth sequence and
reports mean/max joint error plus the worst joints — the metric that actually
matters for forest/config comparisons (pixel accuracy is a poor proxy: a
forest with better overall accuracy can track worse if extremity recall or
label *placement* degrades).

Usage:
  python scripts/eval_tracking.py --frames 24 \
      --forest data/bench_forest.srtr --set beta_temp=0.3
  python scripts/eval_tracking.py --oracle            # oracle-label floor
  (add --cpu to force the host platform)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sequence(model, intrin, H, W, n_frames, bg):
    """The bench.py ground-truth sequence (bench.py:77-118)."""
    import jax.numpy as jnp

    from avatar_tpu.core import rotation
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.render.renderer import AvatarRenderer

    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    rng = np.random.default_rng(8)
    amp = rng.normal(0, 0.10, (24, 3))
    freq = rng.uniform(0.15, 0.5, (24, 3))
    phase = rng.uniform(0, 2 * np.pi, (24, 3))
    base_r = gt.r.copy()
    base_p = gt.p.copy()
    frames, masks, gts = [], [], []
    for t in range(n_frames):
        gt.update()
        rend = AvatarRenderer(gt, intrin)
        d = np.asarray(rend.render_depth((H, W)))
        frames.append((np.where(d > 0, d, bg) * 1000).astype(np.uint16))
        masks.append(np.asarray(rend.render_part_mask((H, W))))
        gts.append(gt.joint_pos.copy())
        wig = amp * np.sin(freq * (t + 1) + phase)
        step = np.asarray(rotation.so3_exp(jnp.asarray(wig, jnp.float32)))
        gt.r = np.einsum("jab,jbc->jac", step, base_r)
        gt.p = base_p + np.array([0.25 * np.sin(0.2 * (t + 1)), 0.0,
                                  0.15 * np.sin(0.13 * (t + 1))])
    return frames, masks, gts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--forest", default="data/bench_forest.srtr")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-part-groups", action="store_true")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="TrackerConfig override "
                    "(repeatable), e.g. --set beta_temp=0.5")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    global jnp
    import jax.numpy as jnp

    from avatar_tpu.core.lbs import lbs
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking import TrackerConfig
    from avatar_tpu.tracking_fused import FusedTracker

    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    bg = np.full((H, W), 4.0, np.float32)
    frames, masks, gts = build_sequence(model, intrin, H, W, args.frames, bg)
    print(f"[eval] {args.frames} frames rendered", file=sys.stderr)

    tree = None
    if not args.oracle:
        trees = [RTree(p) for p in args.forest.split(",")]
        for t in trees:
            t.partmap_type = 0
        tree = trees if len(trees) > 1 else trees[0]
    cfg_kw = dict(data_interval=6, min_points=1000, frame_icp_iters=3,
                  reinit_icp_iters=6, initial_icp_iters=7, iters_per_icp=4,
                  label_conf_thresh=0.55, rtree_interval=3,
                  part_groups=None if args.no_part_groups
                  else tuple(SMPL24_GROUP_LUT))
    for ov in args.set:
        k, v = ov.split("=", 1)
        try:
            v = eval(v)  # numeric / tuple literals
        except Exception:
            pass
        cfg_kw[k] = v
    tracker = FusedTracker(model, intrin, (H, W), rtree=tree,
                           config=TrackerConfig(**cfg_kw))
    tracker.set_background(bg)

    errs, perj = [], []
    t0 = time.time()
    for i, f in enumerate(frames):
        tracker.track(f, labels_override=masks[i] if args.oracle else None)
        th = tracker._theta
        _, joints, _, _ = lbs(model.params, model.parents, th.w, th.p,
                              th.rots)
        d = np.linalg.norm(np.asarray(joints) - gts[i], axis=1)
        errs.append(d.mean())
        perj.append(d)
    mean_mm = float(np.mean(errs[1:]) * 1e3)
    print(f"[eval] joint_err mean(skip0) {mean_mm:.1f}mm "
          f"max {np.max(errs[1:]) * 1e3:.0f}mm  ({time.time() - t0:.0f}s)")
    pj = np.mean(np.stack(perj[1:]), 0) * 1e3
    worst = np.argsort(pj)[::-1][:8]
    print("[eval] worst joints: " +
          " ".join(f"j{j}={pj[j]:.0f}" for j in worst))


if __name__ == "__main__":
    main()
