"""Geodesic extremity anchors (tracking_fused.geodesic_anchors).

The anchors are forest-independent extremity evidence: geodesic extrema of
the foreground surface, assigned uniquely to the nearest model limb-tip
group.  Reference analogue: the Kinect-era geodesic-extrema skeleton cue;
there is no direct counterpart in sxyu/avatar (the reference relies purely
on forest labels, `AvatarOptimizer.cpp:900-949`), so this is a
TPU-side robustness addition gated by TrackerConfig.geo_anchor_n (default
off).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.perception.partgroups import SMPL24_GROUP_LUT
from avatar_tpu.render.renderer import AvatarRenderer
from avatar_tpu.testing import synthetic_model
from avatar_tpu.tracking_fused import geodesic_anchors

TIPS = (1, 6, 7, 12, 13)  # head, l/r foot, l/r hand group ids


def _scene():
    H, W = 720, 1280
    intrin = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992)
    model = synthetic_model(detail=6)
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    gt.update()
    d = np.asarray(AvatarRenderer(gt, intrin).render_depth((H, W)))
    ss = 3
    d_s = d[::ss, ::ss]
    Hs, Ws = d_s.shape
    fx, fy = intrin.fx / ss, intrin.fy / ss
    cx, cy = intrin.cx / ss, intrin.cy / ss
    xs = np.arange(Ws)[None, :]
    ys = np.arange(Hs)[:, None]
    xyz = np.stack([(xs - cx) * d_s / fx, (ys - cy) * d_s / fy, d_s], -1)
    xyz = np.where(d_s[..., None] > 0, xyz, 0.0).astype(np.float32)
    mp = SMPL24_GROUP_LUT[np.asarray(model.main_joint)]
    verts = np.asarray(gt.cloud)
    tipc = np.stack([verts[mp == g].mean(0) for g in TIPS]).astype(np.float32)
    return xyz, fx, tipc


def test_anchors_find_limb_tips():
    xyz, fx, tipc = _scene()
    anc, alab, D = geodesic_anchors(
        jnp.asarray(xyz), jnp.asarray(fx, jnp.float32), jnp.asarray(tipc),
        jnp.ones(len(TIPS), bool), jnp.asarray(TIPS, jnp.int32),
        geo_iters=48, geo_sub=3, geo_min=0.55, geo_gate=0.35)
    anc, alab = np.asarray(anc), np.asarray(alab)
    assigned = {}
    for k in range(len(TIPS)):
        if alab[k] >= 0:
            # unique assignment: each group id at most once
            assert alab[k] not in assigned
            assigned[int(alab[k])] = anc[k]
    # all four limb tips (hands + feet) must be found on this unoccluded
    # frontal pose; head is allowed to miss (shallow geodesic depth)
    for g in (6, 7, 12, 13):
        assert g in assigned, f"limb-tip group {g} not anchored"
        d = np.linalg.norm(assigned[g] - tipc[TIPS.index(g)])
        assert d < 0.15, f"group {g} anchor {d:.3f}m from true tip"


def test_anchors_gate_out_when_shallow():
    # a flat wall has no geodesic extremum deeper than geo_min -> nothing
    # is assigned (no false extremity evidence on degenerate foreground)
    xyz = np.zeros((80, 80, 3), np.float32)
    xyz[20:60, 20:60, 2] = 2.0
    xyz[..., 0] = np.linspace(-0.4, 0.4, 80)[None, :]
    xyz[..., 1] = np.linspace(-0.4, 0.4, 80)[:, None]
    xyz[:, :, :2] *= (xyz[..., 2:] > 0)
    tipc = np.zeros((5, 3), np.float32)
    anc, alab, D = geodesic_anchors(
        jnp.asarray(xyz), jnp.asarray(200.0, jnp.float32),
        jnp.asarray(tipc), jnp.ones(5, bool),
        jnp.asarray(TIPS, jnp.int32),
        geo_iters=32, geo_sub=1, geo_min=0.55, geo_gate=0.35)
    assert np.all(np.asarray(alab) == -1)
