"""Accuracy diagnostics: sweep fit configs over the bench scenario.

Renders the bench GT sequence once, then runs the fused tracker under
several TrackerConfig variants (oracle labels and/or forest labels) and
reports per-frame joint error trajectories, per-joint breakdown, and
fitted-mesh vertex RMSE for each.  Iteration tool for driving
joint_err -> <20 mm (VERDICT round-1 item #3).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--forest", action="store_true")
    ap.add_argument("--configs", default="base,plane,steps,plane_steps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avatar_tpu.core import rotation
    from avatar_tpu.core.lbs import lbs
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking import TrackerConfig
    from avatar_tpu.tracking_fused import FusedTracker

    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    n_frames = args.frames

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
    bg_depth = np.full((H, W), 4.0, np.float32)

    print(f"[diag] rendering {n_frames} GT frames...", file=sys.stderr)
    frames, gt_joints, gt_verts = [], [], []
    for t in range(n_frames):
        gt.update()
        rend = AvatarRenderer(gt, intrin)
        depth = rend.render_depth((H, W))
        mask = rend.render_part_mask((H, W))
        scene_d = np.where(depth > 0, depth, bg_depth)
        frames.append(((scene_d * 1000).astype(np.uint16), mask))
        gt_joints.append(gt.joint_pos.copy())
        gt_verts.append(gt.cloud.copy())
        wig = amp * np.sin(freq * (t + 1) + phase)
        step = np.asarray(rotation.so3_exp(jnp.asarray(wig, jnp.float32)))
        gt.r = np.einsum("jab,jbc->jac", step, base_r)
        gt.p = base_p + np.array([0.25 * np.sin(0.2 * (t + 1)), 0.0,
                                  0.15 * np.sin(0.13 * (t + 1))])

    forest = None
    if args.forest:
        forest = RTree("data/bench_forest.srtr")
        forest.partmap_type = 0

    def make_cfg(name):
        c = TrackerConfig(data_interval=6, min_points=1000,
                          frame_icp_iters=3, reinit_icp_iters=6,
                          initial_icp_iters=7, iters_per_icp=4,
                          label_conf_thresh=0.55, rtree_interval=3)
        if "plane" in name:
            c.plane_weight = 1.0
        if "steps" in name:
            c.iters_per_icp = 8
        if "w2" in name:
            c.plane_weight = 2.0
        if "pt0" in name:
            c.point_weight = 0.3
        if "ppart" in name:
            c.robust_per_part = True
        if "hub3" in name:
            c.huber_k = 3.0
        if "hub6" in name:
            c.huber_k = 6.0
        if "bp03" in name:
            c.beta_pose = 0.03
        elif "bp02" in name:
            c.beta_pose = 0.02
        if "bp01" in name:
            c.beta_pose = 0.01
        if "di4" in name:
            c.data_interval = 4
        if "norobust" in name:
            c.robust = False
        return c

    for name in args.configs.split(","):
        cfg = make_cfg(name)
        tracker = FusedTracker(model, intrin, (H, W), rtree=forest,
                               config=cfg)
        tracker.set_background(bg_depth)
        use_forest = forest is not None
        errs, verrs = [], []
        t0 = time.time()
        for i, (scene, mask) in enumerate(frames):
            tracker.track(scene,
                          labels_override=None if use_forest else mask)
            th = tracker._theta
            verts, joints, _, _ = lbs(model.params, model.parents, th.w,
                                      th.p, th.rots)
            e = np.linalg.norm(np.asarray(joints) - gt_joints[i], axis=1)
            errs.append(e)
            verrs.append(np.sqrt(np.mean(np.sum(
                (np.asarray(verts) - gt_verts[i]) ** 2, axis=1))))
        wall = time.time() - t0
        errs = np.asarray(errs) * 1e3     # [T, 24] mm
        verrs = np.asarray(verrs) * 1e3
        mean_all = errs[1:].mean()
        print(f"\n=== {name}: joint_err {mean_all:.1f} mm, "
              f"vertex_rmse {verrs[1:].mean():.1f} mm, wall {wall:.1f}s")
        print("  per-frame joint err:",
              " ".join(f"{errs[t].mean():.0f}" for t in range(len(errs))))
        worst = np.argsort(errs[1:].mean(axis=0))[::-1][:8]
        print("  worst joints:",
              " ".join(f"j{j}={errs[1:, j].mean():.0f}" for j in worst))


if __name__ == "__main__":
    main()
