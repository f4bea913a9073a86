"""Run forest segmentation on a single depth frame.

Rebuild of reference rtree-run.cpp: load one depth image (.exr/.depth),
predict parts, write a palette visualization.

    python -m avatar_tpu.tools.rtree_run DEPTH_FILE TREE.srtr [-o out.png]
"""

from __future__ import annotations

import argparse

import numpy as np

from avatar_tpu.io import formats
from avatar_tpu.perception.rtree import RTree
from avatar_tpu.utils import palette_color_table


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("depth_file")
    ap.add_argument("tree")
    ap.add_argument("-o", "--out", default="rtree_run.png")
    ap.add_argument("--interval", type=int, default=1)
    args = ap.parse_args(argv)

    depth = formats.read_depth(args.depth_file)
    if depth.ndim == 3:
        depth = depth[..., 2]
    tree = RTree(args.tree)
    seg = tree.predict_best(depth, interval=args.interval)
    table = (palette_color_table(max(tree.num_parts, 17)) * 255).astype(
        np.uint8)
    vis = table[np.minimum(seg, tree.num_parts - 1)]
    vis[seg == 255] = 0
    try:
        import cv2

        cv2.imwrite(args.out, vis)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", seg)
        print(f"wrote {args.out}.npy (no OpenCV)")


if __name__ == "__main__":
    main()
