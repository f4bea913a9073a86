"""Per-stage device timing of the fused frame pipeline (bench config).

Times each stage as its own jitted program on the active backend (forest
walk, background subtraction + CC, blob suppression, GN/LM fit, full fused
frame) so the device budget is attributable.  Run on TPU for real numbers:

    python scripts/profile_frame.py [--window]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--forest", default="data/bench_forest.srtr")
    ap.add_argument("--window", action="store_true",
                    help="time the tracked-window configuration")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT
    from avatar_tpu.perception.rtree import RTree, forest_walk, \
        suppress_part_nonmax
    from avatar_tpu.profiling import time_jitted
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking import TrackerConfig
    from avatar_tpu.tracking_fused import FusedTracker, fused_frame

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

    tree = RTree(args.forest)
    tree.partmap_type = 0
    cfg = TrackerConfig(data_interval=6, min_points=1000, frame_icp_iters=3,
                        iters_per_icp=4, label_conf_thresh=0.55,
                        rtree_interval=3, beta_temp=0.3,
                        render_label_tau=0.03,
                        part_groups=tuple(SMPL24_GROUP_LUT),
                        seg_window=(576, 448) if args.window else None)
    tracker = FusedTracker(model, intrin, (H, W), rtree=tree, config=cfg)
    tracker.set_background(np.full((H, W), 4.0, np.float32))

    ss = tracker._host_stride
    d_s = jnp.asarray(scene[::ss, ::ss])
    Hs, Ws = d_s.shape
    tl = jnp.asarray([0, 0], jnp.int32)
    br = jnp.asarray([Ws - 1, Hs - 1], jnp.int32)
    t = tracker._tree

    # -- forest walk ---------------------------------------------------------
    md = tracker._max_depth
    r = time_jitted(lambda: forest_walk(t, d_s, md, 1, tl, br))
    print(f"forest_walk[{Hs}x{Ws}]      : {r['min_ms']:.2f} ms")
    if args.window:
        wh, ww = (448 // ss, 576 // ss)
        win = d_s[:wh, :ww]
        r = time_jitted(lambda: forest_walk(t, win, md, 1, tl, br,
                                            probe_img=d_s,
                                            origin=(jnp.asarray(0), jnp.asarray(0))))
        print(f"forest_walk[win {wh}x{ww}]: {r['min_ms']:.2f} ms")

    # -- bg subtraction + CC -------------------------------------------------
    from avatar_tpu.tracking_fused import _bg_subtract

    xyz = jnp.stack([d_s, d_s, d_s], axis=-1)
    bg = jnp.stack([tracker._bg] * 3, axis=-1)
    f_bg = jax.jit(lambda a, b: _bg_subtract(a, b, 0.02, 0.02, 10))
    r = time_jitted(f_bg, xyz, bg)
    print(f"bgsub+cc[{Hs}x{Ws}]        : {r['min_ms']:.2f} ms")

    # -- blob suppression ----------------------------------------------------
    lab = jnp.zeros((Hs // 2, Ws // 2), jnp.uint8)
    com = jnp.zeros((2, tracker.num_parts), jnp.float32)
    r = time_jitted(lambda: suppress_part_nonmax(
        lab, com, tracker.num_parts, ss * 2, 0.001,
        jnp.asarray([0, 0], jnp.int32)))
    print(f"blob_suppress            : {r['min_ms']:.2f} ms")

    # -- fit (12 steps, bench operating point) ------------------------------
    from avatar_tpu.optim.gauss_newton import fit

    rng = np.random.default_rng(0)
    npts = 4096
    pad = 8192
    idx = rng.choice(model.num_points(), npts, replace=False)
    mp = np.asarray(tracker._ctx.model_part)
    pts = np.zeros((pad, 3), np.float32)
    pts[:npts] = gt.cloud[idx] + rng.normal(0, 0.002, (npts, 3))
    parts = np.full(pad, -1, np.int32)
    parts[:npts] = mp[idx]
    th = tracker._theta
    r = time_jitted(lambda: fit(
        tracker._ctx, model.parents, jnp.asarray(pts), jnp.asarray(parts),
        th, jnp.asarray(0.05, jnp.float32), jnp.asarray(0.12, jnp.float32),
        n_steps=12, num_parts=tracker.num_parts))
    print(f"fit[12 steps, pad {pad}] : {r['min_ms']:.2f} ms")

    # -- full fused frame ----------------------------------------------------
    u16 = jnp.asarray((np.asarray(d_s) * 1000).astype(np.uint16))
    lab0 = jnp.zeros((Hs, Ws), jnp.uint8)
    out = tracker._run(u16, lab0, 12)
    jax.block_until_ready(out)
    r = time_jitted(lambda: tracker._run(u16, lab0, 12))
    print(f"fused_frame (device)     : {r['min_ms']:.2f} ms")


if __name__ == "__main__":
    main()
