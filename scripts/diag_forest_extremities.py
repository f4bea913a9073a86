"""Why does the forest fail on extremities?

For true extremity pixels (hands/feet/head) on held-out frames, break the
forest's behavior down into: predicted-correct-confident, predicted-correct-
but-conf-gated, predicted-wrong-part (and which), predicted-background.
Distinguishes the two candidate fixes: if correct-but-gated dominates, the
confidence gate/calibration is the problem; if wrong-part/background
dominates, the forest needs more training signal (data scale, depth).

Usage: python scripts/diag_forest_extremities.py --frames 8 \
    --forest data/bench_forest.srtr,data/bench_forest_1.srtr,...
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--forest", default="data/bench_forest.srtr")
    ap.add_argument("--conf", type=float, default=0.55)
    ap.add_argument("--interval", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.train import synth

    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    trees = [RTree(p) for p in args.forest.split(",")]
    for t in trees:
        t.partmap_type = 0
    num_parts = trees[0].num_parts

    src = synth.make_source(model, intrin, None, n_images=args.frames,
                            seed=31337)
    # SMPL-24 extremity part sets
    GROUPS = {"head": (15,), "hands": (20, 21, 22, 23),
              "feet": (7, 8, 10, 11), "forearms": (18, 19)}
    stats = {g: np.zeros(5, np.int64) for g in GROUPS}  # [n, ok, gated,
    #                                                      wrong, bg]
    wrong_into = {g: np.zeros(num_parts + 1, np.int64) for g in GROUPS}
    conf_hist = {g: [] for g in GROUPS}

    for start in range(0, args.frames, 4):
        nb = min(4, args.frames - start)
        ids = jnp.arange(start, start + nb, dtype=jnp.int32)
        depth, mask, _ = synth.render_batch(
            src, model.parents, ids, 31337, H, W, model.num_shape_keys())
        for k in range(nb):
            d = np.asarray(depth[k])
            m = np.asarray(mask[k])
            dist = None
            for tr in trees:
                dd = tr.predict(d, interval=args.interval)
                dist = dd if dist is None else dist + dd
            dist = dist / max(len(trees), 1)
            tot = dist.sum(-1)
            fg = tot > 0
            conf = np.where(fg, dist.max(-1) / np.maximum(tot, 1e-9), 0.0)
            pred = np.where(fg, np.argmax(dist, -1), 255).astype(np.int32)
            sub = (slice(None, None, args.interval),) * 2
            m_s, pred_s, conf_s, fg_s = m[sub], pred[sub], conf[sub], fg[sub]
            for g, parts in GROUPS.items():
                sel = np.isin(m_s, parts)
                n = int(sel.sum())
                if not n:
                    continue
                right = np.isin(pred_s, parts) & sel
                confident = conf_s >= args.conf
                stats[g] += np.array([
                    n,
                    int((right & confident).sum()),
                    int((right & ~confident).sum()),
                    int((~right & (pred_s != 255) & fg_s & sel).sum()),
                    int((sel & (~fg_s | (pred_s == 255))).sum())])
                conf_hist[g].append(conf_s[sel])
                wp = pred_s[(~right) & sel & (pred_s != 255)]
                np.add.at(wrong_into[g], np.clip(wp, 0, num_parts), 1)

    print(f"forest={args.forest} conf_gate={args.conf} "
          f"interval={args.interval}")
    for g in GROUPS:
        n, ok, gated, wrong, bg = stats[g]
        if not n:
            continue
        cf = np.concatenate(conf_hist[g])
        top = np.argsort(wrong_into[g])[::-1][:3]
        print(f"{g:9s} n={n:6d}  correct+conf {ok / n:5.1%}  "
              f"correct-but-GATED {gated / n:5.1%}  wrong {wrong / n:5.1%}"
              f"  bg {bg / n:5.1%}   conf p50={np.median(cf):.2f} "
              f"p90={np.percentile(cf, 90):.2f}  "
              f"wrong->" + ",".join(f"p{p}:{wrong_into[g][p]}"
                                    for p in top if wrong_into[g][p]))


if __name__ == "__main__":
    main()
