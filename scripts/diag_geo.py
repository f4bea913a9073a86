"""Diagnostic: do geodesic anchors land on the true limb tips?

Renders the bench GT pose, runs geodesic_anchors with ORACLE tip centroids
(from the GT mesh), and prints each anchor's assigned group + distance to
the true tip centroid.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# site TPU plugins (axon) override the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.perception.partgroups import (SMPL24_GROUP_LUT,
                                              SMPL24_GROUP_NAMES)
from avatar_tpu.render.renderer import AvatarRenderer
from avatar_tpu.testing import synthetic_model
from avatar_tpu.tracking_fused import geodesic_anchors

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
d = np.asarray(rend.render_depth((H, W)))

ss = 3
d_s = d[::ss, ::ss]
Hs, Ws = d_s.shape
fx, fy, cx, cy = intrin.fx / ss, intrin.fy / ss, intrin.cx / ss, intrin.cy / ss
xs = np.arange(Ws)[None, :]
ys = np.arange(Hs)[:, None]
xyz = np.stack([(xs - cx) * d_s / fx, (ys - cy) * d_s / fy, d_s], -1)
xyz = np.where(d_s[..., None] > 0, xyz, 0.0).astype(np.float32)

# oracle tips from GT mesh (model space)
verts = np.asarray(gt.cloud)
mp = SMPL24_GROUP_LUT[np.asarray(model.main_joint)]
tips = [1, 6, 7, 12, 13]
tipc = np.stack([verts[mp == g].mean(0) for g in tips]).astype(np.float32)

anc, alab, D = geodesic_anchors(
    jnp.asarray(xyz), jnp.asarray(fx, jnp.float32), jnp.asarray(tipc),
    jnp.ones(len(tips), bool), jnp.asarray(tips, jnp.int32),
    geo_iters=48, geo_sub=3, geo_min=0.55, geo_gate=0.35)
anc, alab, D = np.asarray(anc), np.asarray(alab), np.asarray(D)

Dv = np.where(D < 1e5, D, np.nan)
print(f"geodesic map: max {np.nanmax(Dv):.2f}m  "
      f"reached {np.isfinite(Dv).sum()} px")
for k in range(len(anc)):
    g = alab[k]
    name = SMPL24_GROUP_NAMES[g] if g >= 0 else "(unassigned)"
    dists = np.linalg.norm(tipc - anc[k], axis=1)
    nearest = tips[int(np.argmin(dists))]
    print(f"anchor {k}: {anc[k].round(3)}  -> {name:12s}  "
          f"nearest oracle tip {SMPL24_GROUP_NAMES[nearest]} "
          f"at {dists.min():.3f}m"
          + (f"  (assigned-tip dist {dists[tips.index(g)]:.3f}m)"
             if g >= 0 else ""))
