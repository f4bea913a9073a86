"""Avatar model inspector (headless renders or matplotlib interactive).

Rebuild of reference smpl-viewer.cpp (meshview/ImGui pose-slider inspector):
pose/shape set from the CLI, renders depth / Lambert / part-mask views to
image files, or opens an interactive matplotlib 3D scatter when a display
is available.

    python -m avatar_tpu.tools.smpl_viewer --synthetic-model 2 \\
        --pose 18:0.5,0,0 --shape 0:1.5 -o view.png
"""

from __future__ import annotations

import argparse

import numpy as np

from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.render.renderer import AvatarRenderer
from avatar_tpu.tools.common import add_model_args, load_model


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--out", default="smpl_view.png")
    ap.add_argument("--pose", action="append", default=[],
                    help="JOINT:wx,wy,wz axis-angle (repeatable)")
    ap.add_argument("--shape", action="append", default=[],
                    help="KEY:value shape weight (repeatable)")
    ap.add_argument("--pos", default="0,0,2.5", help="root position x,y,z")
    ap.add_argument("--random", type=int, default=0, metavar="SEED",
                    help="randomize pose/shape with this seed")
    ap.add_argument("--mode", default="lambert",
                    choices=["lambert", "depth", "parts"])
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--interactive", action="store_true",
                    help="matplotlib 3D point view instead of a render")
    ap.add_argument("--lbs-weights-of", type=int, default=-1,
                    help="visualize LBS weights of this joint as intensity")
    add_model_args(ap)
    args = ap.parse_args(argv)

    model = load_model(args)
    ava = Avatar(model)
    if args.random:
        ava.randomize(seed=args.random)
    ava.p = np.asarray([float(x) for x in args.pos.split(",")])
    import jax.numpy as jnp

    from avatar_tpu.core import rotation

    for spec in args.pose:
        j, vals = spec.split(":")
        aa = np.asarray([float(x) for x in vals.split(",")])
        ava.r[int(j)] = np.asarray(rotation.so3_exp(
            jnp.asarray(aa, jnp.float32)))
    for spec in args.shape:
        k, v = spec.split(":")
        ava.w[int(k)] = float(v)
    ava.update()

    H, W = (int(x) for x in args.size.split("x"))
    intrin = CameraIntrin(fx=0.9 * W, fy=0.9 * W, cx=W / 2, cy=H / 2)

    if args.interactive:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        c = None
        if args.lbs_weights_of >= 0:
            c = model.weights_np[:, args.lbs_weights_of]
        ax.scatter(ava.cloud[:, 0], ava.cloud[:, 2], ava.cloud[:, 1], s=1,
                   c=c)
        ax.set_box_aspect((1, 1, 1))
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
        return

    rend = AvatarRenderer(ava, intrin)
    if args.mode == "depth":
        depth = rend.render_depth((H, W))
        img = (np.clip(depth / max(depth.max(), 1e-6), 0, 1) * 255).astype(
            np.uint8)
    elif args.mode == "parts":
        from avatar_tpu.utils import palette_color_table

        seg = rend.render_part_mask((H, W))
        table = (palette_color_table(24) * 255).astype(np.uint8)
        img = table[np.minimum(seg, 23)]
        img[seg == 255] = 0
    else:
        img = rend.render_lambert((H, W))
    try:
        import cv2

        cv2.imwrite(args.out, img)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", img)
        print(f"wrote {args.out}.npy")


if __name__ == "__main__":
    main()
