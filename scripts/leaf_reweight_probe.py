"""Probe: class-prior reweighting of forest leaf distributions.

The r5 forest's leaf distributions carry hands at ~0.13% sample mass
(train-stride 3 leaves only ~3-5 hand pixels per image, so per-image
balanced sampling saturates availability).  Plain argmax therefore never
emits hand labels (held-out p22/p23 accuracy 0.00).  This probes the
standard balanced-argmax fix: argmax_k p(k|leaf) / prior(k)^alpha,
i.e. a likelihood-ratio decision instead of a posterior one.

Reports held-out per-part accuracy for alpha in {0, 0.5, 0.75, 1.0} so the
tracker default can be chosen from data.  CPU-runnable.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from avatar_tpu.io.calibration import CameraIntrin  # noqa: E402
from avatar_tpu.perception.rtree import RTree  # noqa: E402
from avatar_tpu.testing import synthetic_model  # noqa: E402
from avatar_tpu.train import synth  # noqa: E402


def main():
    paths = [f"data/bench_forest_r5{s}.srtr" for s in ("", "_1", "_2")]
    trees = [RTree(p) for p in paths]
    for t in trees:
        t.partmap_type = 0
    P = 24

    # sample-space prior: leaf-occupancy-weighted mean would be ideal but
    # .srtr leaves are normalized; the unweighted mean is a close proxy
    # (verified: it reproduces the starved-part ordering of the held-out
    # eval).  Floor keeps absent parts from exploding.
    prior = np.mean([np.asarray(t.forest.leaf_data).mean(0) for t in trees],
                    axis=0)
    prior = np.maximum(prior, 1e-4)
    print("prior:", " ".join(f"p{i}={prior[i]:.4f}" for i in range(P)))

    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    n_eval = 16
    src = synth.make_source(model, intrin, None, n_images=n_eval, seed=4242)

    dists = []   # per-frame averaged tree distributions
    masks = []
    for start in range(0, n_eval, 4):
        ids = jnp.arange(start, start + 4, dtype=jnp.int32)
        depth, mask, _ = synth.render_batch(
            src, model.parents, ids, 4242, H, W, model.num_shape_keys())
        for k in range(4):
            d = np.asarray(depth[k])
            dist = None
            for tr in trees:
                dd = tr.predict(d, interval=3)
                dist = dd if dist is None else dist + dd
            dists.append(dist / len(trees))
            masks.append(np.asarray(mask[k]))

    for alpha in (0.0, 0.5, 0.75, 1.0):
        w = prior ** (-alpha)
        total = np.zeros(P, np.int64)
        correct = np.zeros(P, np.int64)
        for dist, m in zip(dists, masks):
            rw = dist * w
            fg = dist.sum(-1) > 0
            pred = np.where(fg, np.argmax(rw, -1), 255).astype(np.uint8)
            sel0 = (m != 255) & (pred != 255)
            for p in range(P):
                sel = sel0 & (m == p)
                total[p] += sel.sum()
                correct[p] += (pred[sel] == p).sum()
        acc = correct.sum() / max(total.sum(), 1)
        pp = correct / np.maximum(total, 1)
        worst = np.argsort(pp)[:8]
        print(f"alpha={alpha:4.2f} overall={acc:.3f} "
              f"hands p22={pp[22]:.2f} p23={pp[23]:.2f} "
              f"feet p10={pp[10]:.2f} p11={pp[11]:.2f} | worst: "
              + " ".join(f"p{p}={pp[p]:.2f}({total[p]})" for p in worst))


if __name__ == "__main__":
    main()
