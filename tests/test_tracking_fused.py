"""Fused single-program tracker: parity with the host-orchestrated Tracker."""

import numpy as np
import pytest

import jax.numpy as jnp

from avatar_tpu.core import rotation
from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.render.renderer import AvatarRenderer
from avatar_tpu.testing import synthetic_model
from avatar_tpu.tracking import TrackerConfig
from avatar_tpu.tracking_fused import FusedTracker

INTRIN = CameraIntrin(fx=220.0, fy=220.0, cx=128.0, cy=128.0)
H = W = 256


@pytest.fixture(scope="module")
def sequence():
    model = synthetic_model(detail=2)
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    rng = np.random.default_rng(8)
    drift = rng.normal(0, 0.02, (24, 3))
    frames = []
    for t in range(5):
        gt.update()
        rend = AvatarRenderer(gt, INTRIN)
        depth = rend.render_depth((H, W))
        mask = rend.render_part_mask((H, W))
        frames.append((depth, mask, gt.joint_pos.copy()))
        step = np.asarray(rotation.so3_exp(jnp.asarray(drift, jnp.float32)))
        gt.r = np.einsum("jab,jbc->jac", step, gt.r)
        gt.p = gt.p + rng.normal(0, 0.01, 3)
    return model, frames


def test_fused_tracking_with_depth_input(sequence):
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    errs = []
    for i, (depth, mask, gt_joints) in enumerate(frames):
        res = tracker.track(depth, labels_override=mask)
        assert res.ok
        assert res.reinitialized == (i == 0)
        ava = tracker.sync_avatar()
        errs.append(np.linalg.norm(ava.joint_pos - gt_joints, axis=1).mean())
    assert max(errs) < 0.09, f"fused tracking error: {np.round(errs, 3)}"


def test_fused_uint16_matches_float(sequence):
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    depth, mask, gtj = frames[0]

    t1 = FusedTracker(model, INTRIN, (H, W), config=cfg)
    assert t1.track(depth, labels_override=mask).ok
    a1 = t1.sync_avatar()

    t2 = FusedTracker(model, INTRIN, (H, W), config=cfg)
    d16 = (depth * 1000).astype(np.uint16)
    assert t2.track(d16, labels_override=mask).ok
    a2 = t2.sync_avatar()
    # +-0.5 mm quantization perturbs the ICP trajectory; both runs must land
    # equally close to the ground truth (exact agreement isn't expected)
    e1 = np.linalg.norm(a1.joint_pos - gtj, axis=1).mean()
    e2 = np.linalg.norm(a2.joint_pos - gtj, axis=1).mean()
    assert e2 < 0.09, f"u16 path err {e2 * 1e3:.1f} mm"
    assert abs(e1 - e2) < 0.02, f"u16 vs f32 GT-error gap {abs(e1-e2)*1e3:.1f} mm"


def test_fused_with_bgsub(sequence):
    model, frames = sequence
    depth, mask, gtj = frames[0]
    bg_depth = np.full((H, W), 4.0, np.float32)
    scene = np.where(depth > 0, depth, bg_depth)
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    tracker.set_background(bg_depth)
    res = tracker.track(scene, labels_override=mask)
    assert res.ok
    ava = tracker.sync_avatar()
    err = np.linalg.norm(ava.joint_pos - gtj, axis=1).mean()
    assert err < 0.09, f"bgsub fused err {err * 1e3:.1f} mm"


def test_fused_loss_and_reinit(sequence):
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    depth, mask, _ = frames[0]
    assert tracker.track(depth, labels_override=mask).ok
    empty = np.zeros((H, W), np.float32)
    res = tracker.track(empty, labels_override=np.full((H, W), 255, np.uint8))
    assert not res.ok
    assert tracker.reinit
    res2 = tracker.track(depth, labels_override=mask)
    assert res2.ok and res2.reinitialized


def test_metrics_jsonl_and_part_counts(sequence, tmp_path):
    """Structured per-frame metrics (SURVEY §5.5): one JSON line per frame
    with per-part correspondence counts and stage times."""
    import json

    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    path = str(tmp_path / "metrics.jsonl")
    tracker.open_metrics(path)
    for depth, mask, _ in frames[:3]:
        res = tracker.track(depth, labels_override=mask)
        assert res.ok
        counts = res.fit_info["part_counts"]
        assert len(counts) == tracker.num_parts
        assert sum(counts) == res.fit_info["n_matched"] > 0
    tracker.close_metrics()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    assert lines[0]["reinit"] and not lines[1]["reinit"]
    assert "part_counts" in lines[1] and "cost" in lines[1]
    assert any(k.endswith("_ms") for k in lines[1])


def test_fused_multi_tree_forest(sequence):
    """Bagged 2-tree forest: stacked tree tensors, averaged leaf
    distributions (rtree-run.cpp:92-121) inside the fused frame."""
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.train.forest import ForestTrainer

    model, frames = sequence
    trees = []
    for seed in (5, 95):
        tr = ForestTrainer(
            model, INTRIN, (H, W), num_parts=24, num_images=16,
            num_points_per_image=300, num_features=32,
            max_probe_offset=80.0, min_samples=24, max_tree_depth=8,
            image_batch=8, seed=seed)
        t = RTree(24)
        t.set_forest(tr.train())
        t.partmap_type = 0
        trees.append(t)

    cfg = TrackerConfig(data_interval=4, min_points=60, iters_per_icp=4,
                        label_conf_thresh=0.3, seg_window=None,
                        rtree_interval=2)
    tracker = FusedTracker(model, INTRIN, (H, W), rtree=trees, config=cfg)
    assert tracker._tree.u.ndim == 3 and tracker._tree.u.shape[0] == 2
    depth, mask, gtj = frames[0]
    res = tracker.track(depth)
    assert res.ok
    ava = tracker.sync_avatar()
    err = np.linalg.norm(ava.joint_pos - gtj, axis=1).mean()
    assert err < 0.2, f"multi-tree fused err {err * 1e3:.0f} mm"


def test_selective_walk(sequence):
    """Selective ensemble walk: high-confidence pixels keep the gated
    tree-0 label; only the low-confidence bucket pays for all trees.
    Must track comparably to the full ensemble, and with the threshold at
    ~0 (everything easy) must equal a single-tree walk of tree 0."""
    from avatar_tpu.perception.rtree import RTree
    from avatar_tpu.train.forest import ForestTrainer

    model, frames = sequence
    trees = []
    for seed in (5, 95):
        tr = ForestTrainer(
            model, INTRIN, (H, W), num_parts=24, num_images=16,
            num_points_per_image=300, num_features=32,
            max_probe_offset=80.0, min_samples=24, max_tree_depth=8,
            image_batch=8, seed=seed)
        t = RTree(24)
        t.set_forest(tr.train())
        t.partmap_type = 0
        trees.append(t)

    depth, mask, gtj = frames[0]
    kw = dict(data_interval=4, min_points=60, iters_per_icp=4,
              label_conf_thresh=0.3, seg_window=None, rtree_interval=2)

    def run(rtree, **over):
        tracker = FusedTracker(model, INTRIN, (H, W), rtree=rtree,
                               config=TrackerConfig(**kw, **over))
        res = tracker.track(depth)
        assert res.ok
        ava = tracker.sync_avatar()
        return np.linalg.norm(ava.joint_pos - gtj, axis=1).mean(), tracker

    err_full, _ = run(trees)
    err_sel, _ = run(trees, selective_walk=0.55)
    assert err_sel < 0.2, f"selective-walk err {err_sel * 1e3:.0f} mm"
    assert err_sel < err_full + 0.05, (
        f"selective {err_sel * 1e3:.0f} mm vs full {err_full * 1e3:.0f} mm")
    # threshold ~0: every labeled pixel is "easy" -> identical pose to a
    # single-tree (tree 0) tracker
    err_sel0, t_a = run(trees, selective_walk=1e-6)
    err_one, t_b = run(trees[:1])
    ja = t_a.sync_avatar().joint_pos
    jb = t_b.sync_avatar().joint_pos
    np.testing.assert_allclose(ja, jb, atol=5e-4)


def test_track_batch_matches_sync(sequence):
    """track_batch (one scan dispatch) must produce the same poses as the
    per-frame synchronous path, modulo the limb-recovery host step (both
    trackers run without a forest, where recovery is inactive)."""
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    tr_sync = FusedTracker(model, INTRIN, (H, W), config=cfg)
    tr_batch = FusedTracker(model, INTRIN, (H, W), config=cfg)
    # initialize both with frame 0 (reinit path)
    tr_sync.track(frames[0][0], labels_override=frames[0][1])
    tr_batch.track(frames[0][0], labels_override=frames[0][1])
    for depth, mask, _ in frames[1:]:
        res = tr_sync.track(depth, labels_override=mask)
        assert res.ok
    results = tr_batch.track_batch([f[0] for f in frames[1:]],
                                   [f[1] for f in frames[1:]])
    assert len(results) == len(frames) - 1
    assert all(r.ok for r in results)
    np.testing.assert_allclose(np.asarray(tr_batch._theta.p),
                               np.asarray(tr_sync._theta.p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr_batch._theta.rots),
                               np.asarray(tr_sync._theta.rots), atol=1e-4)
    # stacked per-frame poses exposed for offline consumers
    assert np.asarray(tr_batch.batch_thetas.p).shape[0] == len(frames) - 1


def test_body_gate_rejects_off_depth_components():
    """Occlusion resilience (SURVEY §5.3; live-demo.cpp:250-422): the
    component-level body gate drops foreground blobs whose depth is
    inconsistent with the tracked body, so an occluder entering the scene
    cannot feed the fit."""
    import jax.numpy as jnp

    from avatar_tpu.tracking_fused import _bg_subtract

    Hs = Ws = 64
    bg = np.zeros((Hs, Ws, 3), np.float32)
    bg[..., 2] = 4.0
    xyz = bg.copy()
    # body blob at 2.6 m, occluder slab at 1.6 m
    xyz[20:44, 8:24, 2] = 2.6
    xyz[10:54, 36:56, 2] = 1.6
    nn_t = jnp.asarray(0.05)
    nb_t = jnp.asarray(0.05)
    kw = dict(cc_sub=1, body_z=jnp.asarray(2.62))
    fg_off = np.asarray(_bg_subtract(jnp.asarray(xyz), jnp.asarray(bg),
                                     nn_t, nb_t, 10, **kw,
                                     body_gate=jnp.asarray(0.0)))
    fg_on = np.asarray(_bg_subtract(jnp.asarray(xyz), jnp.asarray(bg),
                                    nn_t, nb_t, 10, **kw,
                                    body_gate=jnp.asarray(0.6)))
    # gate off: both blobs are foreground
    assert fg_off[30, 16] and fg_off[30, 46]
    # gate on: body kept, occluder rejected
    assert fg_on[30, 16] and not fg_on[30, 46]
    assert fg_on[20:44, 8:24].all()
    assert not fg_on[10:54, 36:56].any()


def test_occluder_does_not_capture_tracking(sequence):
    """A near-depth occluder covering part of the body must not drag the
    fit (measured failure: 1030 mm in the eval_long occluded phase before
    the body gate + loss-state rework)."""
    model, frames = sequence
    bg_depth = np.full((H, W), 4.0, np.float32)
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    tracker.set_background(bg_depth)
    depth0, mask0, _ = frames[0]
    scene0 = np.where(depth0 > 0, depth0, bg_depth)
    assert tracker.track(scene0, labels_override=mask0).ok
    for depth, mask, gtj in frames[1:]:
        scene = np.where(depth > 0, depth, bg_depth).copy()
        # slab at 1.5 m over the right third of the body's bbox
        scene[:, 140:180] = 1.5
        mask = np.asarray(mask).copy()
        mask[:, 140:180] = 255
        res = tracker.track(scene, labels_override=mask)
        ava = tracker.sync_avatar()
        err = np.linalg.norm(ava.joint_pos - gtj, axis=1).mean()
        assert err < 0.25, f"occluder captured the fit: {err * 1e3:.0f} mm"
        assert not res.reinitialized
    # after the occluder leaves, tracking re-converges tightly
    depth, mask, gtj = frames[-1]
    scene = np.where(depth > 0, depth, bg_depth)
    for _ in range(3):
        tracker.track(scene, labels_override=mask)
    ava = tracker.sync_avatar()
    err = np.linalg.norm(ava.joint_pos - gtj, axis=1).mean()
    assert err < 0.09, f"post-occlusion err {err * 1e3:.0f} mm"


def test_reweight_tree_rebalances_rare_classes():
    """_reweight_tree must (a) be identity at alpha<=0, (b) keep rows
    normalized, (c) move the argmax of a leaf whose rare-class evidence
    is strong-relative-to-prior from the common class to the rare one,
    and (d) leave pure common-class leaves alone.  This is the
    inference-side fix for train-stride pixel starvation of hands/feet
    (leaf sample mass ~0.1% -> plain argmax never emits those labels)."""
    import jax.numpy as jnp

    from avatar_tpu.tracking_fused import _reweight_tree
    from avatar_tpu.perception.rtree import TreeTensors

    # 3 leaves x 4 classes; class 3 is rare (prior ~2%)
    ld = np.array([
        [0.97, 0.01, 0.01, 0.01],   # pure common leaf
        [0.55, 0.05, 0.05, 0.35],   # mixed: rare class 20x its prior
        [0.94, 0.02, 0.02, 0.02],
    ], np.float32)
    z = jnp.zeros(3, jnp.int32)
    t = TreeTensors(
        u=jnp.zeros((3, 2)), v=jnp.zeros((3, 2)),
        thresh=jnp.zeros(3), lnode=z, rnode=z,
        leafid=jnp.arange(3, dtype=jnp.int32),
        leaf_data=jnp.asarray(ld),
        leaf_best=jnp.asarray(ld.argmax(1).astype(np.uint8)),
        leaf_conf=jnp.asarray(ld.max(1)))

    same = _reweight_tree(t, 0.0)
    assert same is t

    rw = _reweight_tree(t, 1.0)
    g = np.asarray(rw.leaf_data)
    np.testing.assert_allclose(g.sum(1), 1.0, atol=1e-5)
    best = np.asarray(rw.leaf_best)
    assert best[0] == 0            # pure leaf unchanged
    assert best[1] == 3            # rare class wins the mixed leaf
    assert best[2] == 0
    np.testing.assert_allclose(np.asarray(rw.leaf_conf),
                               g.max(1), atol=1e-6)


def test_velocity_anchor_state_machine(sequence):
    """The constant-velocity warm start's finite-difference anchor
    (_theta_prev) must trail _theta by exactly one accepted frame in
    steady state and collapse to zero velocity at every pose-chain
    restart (init, reinit) — extrapolating across a restart would launch
    the fit from a meaningless finite difference."""
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4,
                        extrapolate_pose=0.8)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)

    depth, mask, _ = frames[0]
    res = tracker.track(depth, labels_override=mask)
    assert res.ok and res.reinitialized
    # after a (re)init the velocity is zero: anchor == pose
    np.testing.assert_array_equal(np.asarray(tracker._theta_prev.p),
                                  np.asarray(tracker._theta.p))

    th0 = tracker._theta
    depth1, mask1, _ = frames[1]
    assert tracker.track(depth1, labels_override=mask1).ok
    # steady state: anchor is the PREVIOUS fitted pose
    np.testing.assert_array_equal(np.asarray(tracker._theta_prev.p),
                                  np.asarray(th0.p))
    assert not np.array_equal(np.asarray(tracker._theta.p),
                              np.asarray(th0.p))

    # a lost frame (empty depth -> too few points) must not advance the
    # anchor chain
    th_keep, prev_keep = tracker._theta, tracker._theta_prev
    res = tracker.track(np.zeros((H, W), np.float32),
                        labels_override=np.full((H, W), 255, np.uint8))
    assert not res.ok
    assert tracker._theta is th_keep
    assert tracker._theta_prev is prev_keep


def test_shape_refit_state_machine(sequence):
    """One-shot post-reinit shape refit (TrackerConfig.shape_refit_after):
    shape keys are frozen on ordinary steady-state frames, unfrozen on
    exactly ONE frame shape_refit_after frames after a successful
    (re)init, then frozen again.  The batch path must route the due frame
    through the sync path (freeze_shape is static inside the batch scan)
    and keep batch_thetas aligned with the returned results."""
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4,
                        shape_refit_after=2)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)

    depth0, mask0, _ = frames[0]
    res = tracker.track(depth0, labels_override=mask0)
    assert res.ok and res.reinitialized
    assert tracker._shape_refit_in == 2          # armed by the reinit
    w_init = np.asarray(tracker._theta.w).copy()

    # two ordinary steady frames count it down; shape stays frozen
    for i in (1, 2):
        d, m, _ = frames[i]
        assert tracker.track(d, labels_override=m).ok
        np.testing.assert_array_equal(np.asarray(tracker._theta.w), w_init)
    assert tracker._shape_refit_in == 0
    assert tracker._shape_refit_due()

    # the due frame runs with shape unfrozen exactly once
    d, m, _ = frames[3]
    assert tracker.track(d, labels_override=m).ok
    assert tracker._shape_refit_in is None
    assert not tracker._shape_refit_due()
    w_refit = np.asarray(tracker._theta.w)
    assert not np.array_equal(w_refit, w_init), "refit did not move shape"

    # subsequent steady frames freeze the refit shape
    d, m, _ = frames[4]
    assert tracker.track(d, labels_override=m).ok
    np.testing.assert_array_equal(np.asarray(tracker._theta.w), w_refit)


def test_shape_refit_batch_split(sequence):
    """track_batch with an expired shape-refit countdown must run the head
    frame synchronously and still return one theta per result."""
    import jax as _jax

    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4,
                        shape_refit_after=1)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    d0, m0, _ = frames[0]
    assert tracker.track(d0, labels_override=m0).ok   # reinit, arms refit
    d1, m1, _ = frames[1]
    assert tracker.track(d1, labels_override=m1).ok   # countdown 1 -> 0
    assert tracker._shape_refit_due()

    batch = [frames[i][0] for i in (2, 3, 4)]
    labs = [frames[i][1] for i in (2, 3, 4)]
    res = tracker.track_batch(batch, labels_override=labs)
    assert len(res) == 3 and all(r.ok for r in res)
    assert tracker._shape_refit_in is None            # consumed by the head
    nb = _jax.tree.leaves(tracker.batch_thetas)[0].shape[0]
    assert nb == 3, f"batch_thetas misaligned: {nb} thetas for 3 results"


def test_warmup_compiles_variants_and_restores_state(sequence):
    """warmup() pre-compiles the reinit / steady / refine / shape-refit
    variants by running the REAL tracker, then restores every piece of
    per-frame tracking state — so a deployment loop can warm all jits
    before its first real frame without perturbing the state machine."""
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200, iters_per_icp=4,
                        refine_every=2, refine_steps=1,
                        shape_refit_after=3)
    tracker = FusedTracker(model, INTRIN, (H, W), config=cfg)
    depth, mask, _ = frames[0]

    # cold state before warmup
    pre = {k: getattr(tracker, k, None) for k in tracker._WARM_STATE}
    tracker.warmup(depth, labels_override=mask)
    post = {k: getattr(tracker, k, None) for k in tracker._WARM_STATE}
    for k in tracker._WARM_STATE:
        a, b = pre[k], post[k]
        if hasattr(a, "aa"):        # Theta pytree
            np.testing.assert_allclose(np.asarray(a.aa), np.asarray(b.aa),
                                       err_msg=k)
        elif hasattr(a, "shape"):   # numpy / jax array
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=k)
        else:
            assert a == b, f"{k}: {a!r} != {b!r}"
    assert tracker.reinit            # still cold: first real frame reinits

    # the warmed tracker behaves identically from frame 0
    res = tracker.track(depth, labels_override=mask)
    assert res.ok and res.reinitialized
    res = tracker.track(frames[1][0], labels_override=frames[1][1])
    assert res.ok and not res.reinitialized
    # shape-refit countdown armed by the real reinit, not consumed by warmup
    assert tracker._shape_refit_in == 2
