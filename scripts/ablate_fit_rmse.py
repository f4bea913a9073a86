"""Ablate the converged-fit exactness probe (BASELINE "<1 mm" target).

Reproduces bench.py's fit_rmse_mm measurement — frame 0 of the bench
sequence, oracle part labels, solver started AT the ground truth — and
sweeps the solver terms VERDICT round 2 called out: group-space vs 24-part
labels, Huber IRLS, point-to-plane weight, prior scale, sample stride and
step budget.  Any RMSE left over is pure solver/correspondence bias.

Usage:  python scripts/ablate_fit_rmse.py [--quick]
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="256x256 CPU config")
    ap.add_argument("--refine-only", action="store_true",
                    help="skip the vertex-NN fit sweep")
    ap.add_argument("--strides", type=int, nargs="*", default=[6, 3])
    args = ap.parse_args()
    if args.quick:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp

    from avatar_tpu.core.lbs import lbs
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.optim.gauss_newton import Theta, fit
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT

    if args.quick:
        H, W = 256, 256
        intrin = CameraIntrin(fx=220.0, fy=220.0, cx=128.0, cy=128.0)
        detail = 2
    else:
        H, W = 720, 1280
        intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
        detail = 6

    model = synthetic_model(detail=detail)
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    gt.update()
    rend = AvatarRenderer(gt, intrin)
    depth = rend.render_depth((H, W))
    mask = rend.render_part_mask((H, W))
    # same uint16-mm quantization as the bench camera path
    depth_q = (np.where(depth > 0, depth, 0) * 1000).astype(np.uint16)
    gt_verts = gt.cloud.copy()
    theta_gt = Theta(p=jnp.asarray(gt.p, jnp.float32),
                     rots=jnp.asarray(gt.r, jnp.float32),
                     w=jnp.asarray(gt.w, jnp.float32))

    from avatar_tpu.optim.gauss_newton import FitContext, PriorData

    part_map = np.arange(model.num_joints(), dtype=np.int32)
    model_part24 = part_map[model.main_joint]
    glut = np.asarray(SMPL24_GROUP_LUT, np.int32)

    def make_ctx(grouped):
        mp = glut[model_part24] if grouped else model_part24
        return FitContext(
            lbs=model.params,
            anc_mask=jnp.asarray(model.ancestor_mask, model.dtype),
            faces=jnp.asarray(model.faces, jnp.int32),
            model_part=jnp.asarray(mp, jnp.int32),
            prior=PriorData(model.pose_prior.means, model.pose_prior.prec_cho,
                            model.pose_prior.consts_log)), \
            (int(glut.max()) + 1 if grouped else model.num_joints())

    def sample(stride, grouped):
        d0 = depth_q[::stride, ::stride].astype(np.float32) * 1e-3
        m0 = np.asarray(mask)[::stride, ::stride]
        ys = np.arange(d0.shape[0]) * stride
        xs = np.arange(d0.shape[1]) * stride
        sub = np.stack([(xs[None, :] - intrin.cx) * d0 / intrin.fx,
                        -(ys[:, None] - intrin.cy) * d0 / intrin.fy, d0], -1)
        fgm = (m0 != 255) & (d0 > 0)
        n0 = int(fgm.sum())
        B0 = 1024
        while B0 < n0:
            B0 *= 2
        pts = np.zeros((B0, 3), np.float32)
        pts[:n0] = sub[fgm]
        parts = np.full(B0, -1, np.int32)
        parts[:n0] = m0[fgm]
        if grouped:
            parts[:n0] = glut[parts[:n0]]
        return jnp.asarray(pts), jnp.asarray(parts), n0

    def rmse(theta):
        v, _, _, _ = lbs(model.params, model.parents, theta.w, theta.p,
                         theta.rots)
        return float(np.sqrt(np.mean(np.sum(
            (np.asarray(v) - gt_verts) ** 2, -1))) * 1e3)

    # configs: (name, grouped, stride, bp, bs, plane_w, point_w, huber_k,
    #           n_steps)
    HUGE = 1e6  # Huber delta floor so IRLS weights stay ~1 (robust "off")
    cfgs = []
    for stride in args.strides:
        cfgs += [
            (f"baseline s{stride}", True, stride, 0.03, 0.12, 0.0, 1.0, 1.5, 12),
            (f"24part   s{stride}", False, stride, 0.03, 0.12, 0.0, 1.0, 1.5, 12),
            (f"plane2   s{stride}", True, stride, 0.03, 0.12, 2.0, 1.0, 1.5, 12),
            (f"noprior  s{stride}", True, stride, 1e-4, 1e-4, 0.0, 1.0, 1.5, 12),
            (f"nohuber  s{stride}", True, stride, 0.03, 0.12, 0.0, 1.0, HUGE, 12),
            (f"all      s{stride}", False, stride, 1e-4, 1e-4, 2.0, 1.0, HUGE, 30),
            (f"all+pl4  s{stride}", False, stride, 1e-4, 1e-4, 4.0, 0.3, HUGE, 30),
            (f"allplane s{stride}", False, stride, 1e-4, 1e-4, 1.0, 0.03, HUGE, 30),
        ]

    print(f"{'config':<18} {'rmse_mm':>8} {'n':>6} {'steps':>5} {'ms':>7}")
    if args.refine_only:
        cfgs = []
    for name, grouped, stride, bp, bs, pw, ptw, hk, nst in cfgs:
        ctx, num_parts = make_ctx(grouped)
        pts, parts, n0 = sample(stride, grouped)
        t0 = time.time()
        out = fit(ctx, model.parents, pts, parts, theta_gt,
                  jnp.asarray(bp, jnp.float32), jnp.asarray(bs, jnp.float32),
                  n_steps=nst, num_parts=num_parts,
                  plane_weight=jnp.asarray(pw, jnp.float32),
                  point_weight=jnp.asarray(ptw, jnp.float32),
                  huber_k=jnp.asarray(hk, jnp.float32))
        jax.block_until_ready(out)
        dt = time.time() - t0
        r = rmse(out[0])
        print(f"{name:<18} {r:8.3f} {n0:>6} {int(out[1].inner_iters):>5} "
              f"{dt * 1e3:7.0f}")

    # point-to-mesh refine (gauss_newton.fit_refine): the <1 mm candidate
    from avatar_tpu.optim.gauss_newton import fit_refine
    from avatar_tpu.optim.surface import vertex_face_rings

    ring = jnp.asarray(vertex_face_rings(np.asarray(model.faces),
                                         model.num_points()))
    refine_cfgs = [("REF 24 s%d" % s, False, s, 1e-4, 1e-4, 1.0, 0.2, 20)
                   for s in args.strides]
    refine_cfgs += [
        ("REF g s%d" % args.strides[0], True, args.strides[0],
         1e-4, 1e-4, 1.0, 0.2, 20),
        ("REF ptonly s%d" % args.strides[0], False, args.strides[0],
         1e-4, 1e-4, 0.0, 1.0, 20),
    ]
    for name, grouped, stride, bp, bs, pw, ptw, nst in refine_cfgs:
        ctx, num_parts = make_ctx(grouped)
        pts, parts, n0 = sample(stride, grouped)
        t0 = time.time()
        out = fit_refine(ctx, model.parents, ring, pts, parts, theta_gt,
                         jnp.asarray(bp, jnp.float32),
                         jnp.asarray(bs, jnp.float32),
                         n_steps=nst, num_parts=num_parts,
                         plane_weight=jnp.asarray(pw, jnp.float32),
                         point_weight=jnp.asarray(ptw, jnp.float32))
        jax.block_until_ready(out)
        dt = time.time() - t0
        r = rmse(out[0])
        print(f"{name:<18} {r:8.3f} {n0:>6} {int(out[1].inner_iters):>5} "
              f"{dt * 1e3:7.0f}")


if __name__ == "__main__":
    main()
