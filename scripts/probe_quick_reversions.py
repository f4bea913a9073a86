"""Single-knob reversion probes for the quick-config regression gate.

The regression gate (tests/test_tracking_regression.py) re-based its measured
baseline after the round-3 full-bench retuning (plane_weight 1.0 -> 2.0,
beta_temp 0.0 -> 0.3).  The advisor asked for the reversion-probe evidence to
be committed so the re-base is auditable: this script re-runs the gate's exact
configuration (256x256, oracle labels, 8 frames — bench.py --quick sequence)
with each retuned knob individually reverted, and writes the joint-error /
vertex-RMSE table to data/reversion_probes_quick.json.

Run: python scripts/probe_quick_reversions.py   (CPU, ~5 min)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def run_probe(overrides):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avatar_tpu.core import rotation
    from avatar_tpu.core.lbs import lbs
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking import TrackerConfig
    from avatar_tpu.tracking_fused import FusedTracker

    H, W = 256, 256
    intrin = CameraIntrin(fx=220.0, fy=220.0, cx=128.0, cy=128.0)
    model = synthetic_model(detail=2)
    bg = np.full((H, W), 4.0, np.float32)

    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    rng = np.random.default_rng(8)
    amp = rng.normal(0, 0.10, (24, 3))
    freq = rng.uniform(0.15, 0.5, (24, 3))
    phase = rng.uniform(0, 2 * np.pi, (24, 3))
    base_r, base_p = gt.r.copy(), gt.p.copy()

    cfg = TrackerConfig(data_interval=4, min_points=200, frame_icp_iters=3,
                        reinit_icp_iters=6, initial_icp_iters=7,
                        iters_per_icp=4, rtree_interval=2, **overrides)
    tracker = FusedTracker(model, intrin, (H, W), config=cfg)
    tracker.set_background(bg)

    errs, vrms = [], []
    for t in range(8):
        gt.update()
        rend = AvatarRenderer(gt, intrin)
        d = np.asarray(rend.render_depth((H, W)))
        frame = (np.where(d > 0, d, bg) * 1000).astype(np.uint16)
        mask = np.asarray(rend.render_part_mask((H, W)))
        res = tracker.track(frame, labels_override=mask)
        assert res.ok
        th = tracker._theta
        verts, joints, _, _ = lbs(model.params, model.parents, th.w, th.p,
                                  th.rots)
        errs.append(np.linalg.norm(np.asarray(joints) - gt.joint_pos,
                                   axis=1).mean())
        vrms.append(np.sqrt(np.mean(np.sum(
            (np.asarray(verts) - gt.cloud) ** 2, axis=1))))
        wig = amp * np.sin(freq * (t + 1) + phase)
        step = np.asarray(rotation.so3_exp(jnp.asarray(wig, jnp.float32)))
        gt.r = np.einsum("jab,jbc->jac", step, base_r)
        gt.p = base_p + np.array([0.25 * np.sin(0.2 * (t + 1)), 0.0,
                                  0.15 * np.sin(0.13 * (t + 1))])
    return (float(np.mean(errs[1:]) * 1e3), float(np.mean(vrms[1:]) * 1e3))


def main():
    probes = {
        "tuned (plane_weight=2.0, beta_temp=0.3)": {},
        "revert plane_weight=1.0": {"plane_weight": 1.0},
        "revert beta_temp=0.0": {"beta_temp": 0.0},
        "revert both": {"plane_weight": 1.0, "beta_temp": 0.0},
    }
    out = {}
    for name, ov in probes.items():
        t0 = time.time()
        j, v = run_probe(ov)
        out[name] = {"joint_err_mm": round(j, 2),
                     "vertex_rmse_mm": round(v, 2)}
        print(f"[probe] {name}: joint {j:.2f}mm vertex {v:.2f}mm "
              f"({time.time() - t0:.0f}s)", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "reversion_probes_quick.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {path}")


if __name__ == "__main__":
    main()
