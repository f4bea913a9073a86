"""Per-stage device profiling of the fused tracking frame.

Times each device stage of the fused pipeline in isolation (forest walk,
blob suppression / connected components, background subtraction, NN
correspondence, full LM fit, whole fused frame) with block_until_ready
timing, and optionally writes a jax.profiler trace for xprof.

    python scripts/profile_frame.py [--trees N] [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=20):
    fn()  # compile
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--forest", default="data/bench_forest.srtr")
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    gt.update()
    rend = AvatarRenderer(gt, intrin)
    depth = rend.render_depth((H, W))
    bg = np.full((H, W), 4.0, np.float32)
    scene = np.where(depth > 0, depth, bg)
    scene_u16 = (scene * 1000).astype(np.uint16)

    forest = RTree(args.forest)
    forest.partmap_type = 0
    cfg = TrackerConfig(data_interval=6, min_points=1000, iters_per_icp=4,
                        rtree_interval=3)
    tracker = FusedTracker(model, intrin, (H, W), rtree=forest, config=cfg)
    tracker.set_background(bg)
    tracker.track(scene_u16)           # init + compile reinit path
    tracker.track(scene_u16)           # compile steady-state path

    # --- whole fused frame -------------------------------------------------
    xyz = jnp.asarray(tracker._pre_stride(scene_u16))

    def whole():
        out = tracker._run(xyz, jnp.zeros(tracker._proc_size, jnp.uint8),
                           cfg.frame_icp_iters * cfg.iters_per_icp)
        return out.theta.p

    print(f"fused_frame total:      {timeit(whole):8.3f} ms")

    # --- stages in isolation ------------------------------------------------
    from avatar_tpu.perception.rtree import forest_walk, suppress_part_nonmax
    from avatar_tpu.tracking_fused import _bg_subtract

    hs = tracker._host_stride
    d_s = (xyz.astype(jnp.float32) * 1e-3)
    Hs, Ws = d_s.shape
    fx = intrin.fx / hs

    tree = tracker._tree
    tl = jnp.asarray([0, 0], jnp.int32)
    br = jnp.asarray([Ws - 1, Hs - 1], jnp.int32)

    def walk_full():
        return forest_walk(tree, d_s, tracker._max_depth, 1, tl, br)

    print(f"forest walk (full {Hs}x{Ws}): {timeit(walk_full):8.3f} ms")

    wh, ww = (min(cfg.seg_window[0] // hs, Hs), min(cfg.seg_window[1] // hs, Ws))
    win = d_s[:wh, :ww]

    def walk_win():
        return forest_walk(tree, win, tracker._max_depth, 1, tl, br,
                           probe_img=d_s, origin=(jnp.asarray(0), jnp.asarray(0)))

    print(f"forest walk (win {wh}x{ww}):  {timeit(walk_win):8.3f} ms")

    labels = jnp.where(d_s > 0, jnp.uint8(1), jnp.uint8(255))

    def blobs():
        lab_c = labels[::2, ::2]
        return suppress_part_nonmax(lab_c, tracker.com_pre, tracker.num_parts,
                                    hs * 2, 0.001,
                                    jnp.asarray([0, 0], jnp.int32))[0]

    print(f"blob suppression (CC):  {timeit(blobs):8.3f} ms")

    xs = (jnp.arange(Ws, dtype=jnp.float32))[None, :]
    ys = (jnp.arange(Hs, dtype=jnp.float32))[:, None]
    xyz3 = jnp.stack([(xs - intrin.cx / hs) * d_s / fx,
                      (ys - intrin.cy / hs) * d_s / fx, d_s], -1)
    bg_s = jnp.asarray(tracker._bg)
    bg3 = jnp.stack([(xs - intrin.cx / hs) * bg_s / fx,
                     (ys - intrin.cy / hs) * bg_s / fx, bg_s], -1)

    def bgsub():
        return _bg_subtract(xyz3, bg3, jnp.asarray(0.02), jnp.asarray(0.02),
                            jnp.asarray(50, jnp.int32))

    print(f"bg subtraction:         {timeit(bgsub):8.3f} ms")

    # --- fit ------------------------------------------------------------------
    from avatar_tpu.optim.gauss_newton import fit

    rng = np.random.default_rng(0)
    nv = model.num_points()
    idx = rng.choice(nv, 4096, replace=False)
    mp = np.asarray(tracker._ctx.model_part)
    ava = tracker.sync_avatar()
    pts = jnp.zeros((8192, 3), jnp.float32).at[:4096].set(
        jnp.asarray(ava.cloud[idx] + rng.normal(0, 0.002, (4096, 3)),
                    jnp.float32))
    parts = jnp.full((8192,), -1, jnp.int32).at[:4096].set(
        jnp.asarray(mp[idx], jnp.int32))
    th = tracker._theta

    def fit12():
        out = fit(tracker._ctx, model.parents, pts, parts, th,
                  jnp.asarray(0.03, jnp.float32), jnp.asarray(0.12, jnp.float32),
                  n_steps=12, num_parts=tracker.num_parts,
                  plane_weight=jnp.asarray(1.0, jnp.float32),
                  huber_k=jnp.asarray(3.0, jnp.float32),
                  robust_per_part=True)
        return out[0].p

    print(f"fit (12 LM steps):      {timeit(fit12):8.3f} ms")

    if args.trace:
        import jax.profiler

        with jax.profiler.trace(args.trace):
            jax.block_until_ready(whole())
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
