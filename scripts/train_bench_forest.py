"""Train (and evaluate) the bench forest with the TrainerV2 filter stage.

Trains one or more trees (different seeds = bagged forest), saves them as
.srtr files, and reports per-pixel part-label accuracy on held-out frames
rendered from the same synthetic distribution the bench uses.

Usage:
  python scripts/train_bench_forest.py --out data/bench_forest.srtr \
      --images 384 --features 512 --filtered 64 --depth 14 --trees 1
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/bench_forest.srtr")
    ap.add_argument("--images", type=int, default=384)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--features", type=int, default=512)
    ap.add_argument("--filtered", type=int, default=64)
    ap.add_argument("--depth", type=int, default=14)
    ap.add_argument("--probe", type=float, default=220.0)
    ap.add_argument("--min-samples", type=int, default=48)
    ap.add_argument("--trees", type=int, default=1)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--groups", action="store_true",
                    help="train in 14-group label space (partgroups.py); "
                    "writes the group LUT as the .partmap sidecar")
    ap.add_argument("--balance", type=float, default=0.5,
                    help="per-class pixel-sampling balance exponent")
    ap.add_argument("--image-batch", type=int, default=0,
                    help="images per render/level-pass dispatch "
                    "(0 = 8*stride^2, the full-res-equivalent pixel load)")
    ap.add_argument("--train-stride", type=int, default=1,
                    help="render/train at this pixel stride (the tracker "
                    "reads the forest at rtree_interval=3, so stride 3 "
                    "trains at the exact deployment grid; 9x less HBM and "
                    "raster work per image). Probe offsets export in "
                    "full-res pixel units regardless (.srtr semantics).")
    args = ap.parse_args()

    import jax.numpy as jnp

    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.train import synth
    from avatar_tpu.train.forest import ForestTrainer

    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    ts = args.train_stride
    tH, tW = (H + ts - 1) // ts, (W + ts - 1) // ts
    tintrin = CameraIntrin(fx=intrin.fx / ts, fy=intrin.fy / ts,
                           cx=intrin.cx / ts, cy=intrin.cy / ts)

    part_map = None
    num_parts = 24
    if args.groups:
        from avatar_tpu.io import formats
        from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT, \
            SMPL24_GROUP_NAMES, SMPL24_NUM_GROUPS

        part_map = np.asarray(SMPL24_GROUP_LUT, np.int32)
        num_parts = SMPL24_NUM_GROUPS

    paths = []
    for t in range(args.trees):
        path = args.out if t == 0 else args.out.replace(
            ".srtr", f"_{t}.srtr")
        paths.append(path)
        if args.eval_only or os.path.exists(path):
            continue
        print(f"[train] tree {t}: {args.images} imgs, "
              f"{args.features}->{args.filtered} feats, depth {args.depth}",
              file=sys.stderr)
        t0 = time.time()
        trainer = ForestTrainer(
            model, tintrin, (tH, tW), num_parts=num_parts,
            part_map=part_map, num_images=args.images,
            num_points_per_image=args.points, num_features=args.features,
            num_features_filtered=args.filtered,
            max_probe_offset=args.probe / ts, min_samples=args.min_samples,
            max_tree_depth=args.depth,
            image_batch=args.image_batch or 8 * ts * ts,
            seed=args.seed + 71 * t, verbose=True,
            sample_balance=args.balance,
            checkpoint_path=path + ".ckpt")
        fd = trainer.train(resume_from=path + ".ckpt")
        if ts != 1:
            # store probe offsets in full-res pixel units (.srtr semantics:
            # RTree.cpp scales u,v by depth at the full camera grid; the
            # tracker divides by its own stride at load)
            fd.u = np.asarray(fd.u) * float(ts)
            fd.v = np.asarray(fd.v) * float(ts)
        tree = RTree(num_parts)
        tree.set_forest(fd)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tree.export_file(path)
        if args.groups:
            src_names = [f"joint{j}" for j in range(24)]
            formats.write_partmap(
                path + ".partmap", formats.PARTMAP_CONTIGUOUS, src_names,
                list(SMPL24_GROUP_NAMES),
                {src_names[j]: SMPL24_GROUP_NAMES[part_map[j]]
                 for j in range(24)})
        print(f"[train] tree {t} done in {time.time() - t0:.0f}s, "
              f"{fd.num_nodes} nodes -> {path}", file=sys.stderr)

    # ---- evaluation on held-out frames --------------------------------
    trees = [RTree(p) for p in paths if os.path.exists(p)]
    n_eval = 16
    src = synth.make_source(model, intrin, part_map, n_images=n_eval,
                            seed=4242)
    total = np.zeros(num_parts, np.int64)
    correct = np.zeros(num_parts, np.int64)
    for start in range(0, n_eval, 4):
        ids = jnp.arange(start, start + 4, dtype=jnp.int32)
        depth, mask, _ = synth.render_batch(
            src, model.parents, ids, 4242, H, W, model.num_shape_keys())
        for k in range(4):
            d = np.asarray(depth[k])
            m = np.asarray(mask[k])
            if len(trees) == 1:
                pred = trees[0].predict_best(d, interval=3)
            else:
                dist = None
                for tr in trees:
                    dd = tr.predict(d, interval=3)
                    dist = dd if dist is None else dist + dd
                fg = dist.sum(-1) > 0
                pred = np.where(fg, np.argmax(dist, -1), 255).astype(np.uint8)
            fg = (m != 255) & (pred != 255)
            for p in range(num_parts):
                sel = fg & (m == p)
                total[p] += sel.sum()
                correct[p] += (pred[sel] == p).sum()
    acc = correct.sum() / max(total.sum(), 1)
    print(f"[eval] overall pixel accuracy (stride 3): {acc:.3f}")
    pp = correct / np.maximum(total, 1)
    worst = np.argsort(pp)[:8]
    print("[eval] worst parts:",
          " ".join(f"p{p}={pp[p]:.2f}({total[p]})" for p in worst))


if __name__ == "__main__":
    main()
