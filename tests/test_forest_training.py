"""Forest training tests: train a small tree on synthetic renders and check
it actually segments body parts; checkpoint/resume; leaf transfer."""

import numpy as np
import pytest

import jax.numpy as jnp

from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.perception.rtree import RTree
from avatar_tpu.render.renderer import AvatarRenderer
from avatar_tpu.testing import synthetic_model
from avatar_tpu.train.forest import ForestTrainer, train_transfer
from avatar_tpu.train import synth

INTRIN = CameraIntrin(fx=120.0, fy=120.0, cx=64.0, cy=64.0)
H = W = 128


@pytest.fixture(scope="module")
def model():
    return synthetic_model(detail=1)


@pytest.fixture(scope="module")
def trained(model):
    trainer = ForestTrainer(
        model, INTRIN, (H, W), num_parts=24, num_images=48,
        num_points_per_image=400, num_features=48, max_probe_offset=60.0,
        min_samples=24, max_tree_depth=9, image_batch=8, seed=5)
    fd = trainer.train()
    tree = RTree(24)
    tree.set_forest(fd)
    return tree


def test_synth_source_deterministic(model):
    src = synth.make_source(model, INTRIN, n_images=8, seed=3)
    d1, m1, j1 = synth.render_batch(src, model.parents,
                                    jnp.arange(4, dtype=jnp.int32), 3, H, W,
                                    model.num_shape_keys())
    d2, m2, _ = synth.render_batch(src, model.parents,
                                   jnp.arange(4, dtype=jnp.int32), 3, H, W,
                                   model.num_shape_keys())
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # different ids give different frames
    assert not np.array_equal(np.asarray(d1[0]), np.asarray(d1[1]))
    # frames have reasonable foreground
    fg = np.asarray(d1[0]) > 0
    assert 50 < fg.sum() < H * W * 0.9


def test_trained_tree_segments(model, trained):
    """Accuracy on held-out synthetic frames must beat chance by a wide
    margin (24-part chance is ~10% on part-frequency-weighted data)."""
    src = synth.make_source(model, INTRIN, n_images=4, seed=999)
    import jax.numpy as jnp

    depth, mask, _ = synth.render_batch(
        src, model.parents, jnp.arange(4, dtype=jnp.int32), 999, H, W,
        model.num_shape_keys())
    total, correct = 0, 0
    for k in range(4):
        d = np.asarray(depth[k])
        m = np.asarray(mask[k])
        pred = trained.predict_best(d)
        fg = (m != 255) & (pred != 255)
        total += fg.sum()
        correct += (pred[fg] == m[fg]).sum()
    acc = correct / max(total, 1)
    assert total > 1000
    assert acc > 0.35, f"trained tree accuracy only {acc:.2%}"


def test_tree_structure_valid(trained):
    fd = trained.forest
    internal = fd.leafid < 0
    assert internal.sum() > 3, "tree degenerated to a single leaf"
    # children indices in range, leaves have distributions summing to 1
    assert (fd.lnode[internal] >= 0).all()
    assert (fd.rnode[internal] < fd.num_nodes).all()
    sums = fd.leaf_data.sum(1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_checkpoint_resume(model, tmp_path):
    ckpt = str(tmp_path / "train.ckpt")
    kwargs = dict(num_parts=24, num_images=24, num_points_per_image=200,
                  num_features=24, max_probe_offset=60.0, min_samples=24,
                  max_tree_depth=6, image_batch=8, seed=5)
    t1 = ForestTrainer(model, INTRIN, (H, W), checkpoint_path=ckpt, **kwargs)
    fd_full = t1.train()
    # resume from the saved final state: should load and return the same tree
    t2 = ForestTrainer(model, INTRIN, (H, W), checkpoint_path="", **kwargs)
    fd_resumed = t2.train(resume_from=ckpt)
    np.testing.assert_array_equal(fd_resumed.leafid, fd_full.leafid)
    np.testing.assert_allclose(fd_resumed.thresh, fd_full.thresh, atol=1e-6)
    np.testing.assert_allclose(fd_resumed.leaf_data, fd_full.leaf_data,
                               atol=1e-6)


def test_checkpoint_resume_mid_training(model, tmp_path):
    """A run interrupted mid-training and resumed must produce the SAME
    forest as an uninterrupted run (feature pools are keyed on
    (seed, level, chunk), not stateful RNG; the reference's xorKey-seeded
    resume is deterministic the same way, RTree.cpp:2649-2702)."""
    from avatar_tpu.train.forest import _TreeBuilder

    ckpt = str(tmp_path / "mid.ckpt")
    kwargs = dict(num_parts=24, num_images=24, num_points_per_image=200,
                  num_features=24, max_probe_offset=60.0, min_samples=24,
                  max_tree_depth=6, image_batch=8, seed=5)
    t1 = ForestTrainer(model, INTRIN, (H, W), **kwargs)
    fd_full = t1.train()
    # interrupt after two levels, checkpoint, resume in a fresh trainer
    t2 = ForestTrainer(model, INTRIN, (H, W), checkpoint_path=ckpt, **kwargs)
    t2._init_samples()
    t2.tree = _TreeBuilder(24)
    t2.frontier = [t2.tree.add_node()]
    t2.frontier_depth = [t2.max_depth]
    t2.level = 0
    for _ in range(2):
        t2._train_level()
        t2.level += 1
    t2.save_checkpoint()
    t3 = ForestTrainer(model, INTRIN, (H, W), **kwargs)
    fd_res = t3.train(resume_from=ckpt)
    np.testing.assert_array_equal(fd_res.leafid, fd_full.leafid)
    np.testing.assert_array_equal(fd_res.lnode, fd_full.lnode)
    np.testing.assert_allclose(fd_res.thresh, fd_full.thresh, atol=1e-6)
    np.testing.assert_allclose(fd_res.leaf_data, fd_full.leaf_data,
                               atol=1e-6)


def test_flat_matches_batch_passes(model):
    """The sample-major ("flat") level passes must grow the SAME tree as
    the image-major ("batch") passes: probe scores are elementwise
    identical, min/max are order-independent, and histogram counts are
    exact integers in f32 (order-independent addition), so every split
    decision matches bitwise."""
    kwargs = dict(num_parts=24, num_images=16, num_points_per_image=200,
                  num_features=24, max_probe_offset=60.0, min_samples=16,
                  max_tree_depth=6, image_batch=8, seed=7)
    fd_f = ForestTrainer(model, INTRIN, (H, W), pass_mode="flat",
                         **kwargs).train()
    fd_b = ForestTrainer(model, INTRIN, (H, W), pass_mode="batch",
                         **kwargs).train()
    np.testing.assert_array_equal(fd_f.lnode, fd_b.lnode)
    np.testing.assert_array_equal(fd_f.leafid, fd_b.leafid)
    np.testing.assert_array_equal(fd_f.u, fd_b.u)
    np.testing.assert_array_equal(fd_f.v, fd_b.v)
    np.testing.assert_allclose(fd_f.thresh, fd_b.thresh, rtol=1e-6)
    np.testing.assert_allclose(fd_f.leaf_data, fd_b.leaf_data, atol=1e-7)


def test_train_from_files(model, tmp_path):
    """File-dataset training (reference FileDataSource path): write rendered
    frames to disk, train from the directories, check the tree segments."""
    import os

    from avatar_tpu.io.formats import write_depth_rle

    cv2 = pytest.importorskip("cv2")
    ddir = tmp_path / "depth_exr"
    mdir = tmp_path / "part_mask"
    os.makedirs(ddir)
    os.makedirs(mdir)
    n_img = 24
    src = synth.make_source(model, INTRIN, n_images=n_img, seed=11)
    depth, mask, _ = synth.render_batch(
        src, model.parents, jnp.arange(n_img, dtype=jnp.int32), 11, H, W,
        model.num_shape_keys())
    depth_np, mask_np = np.asarray(depth), np.asarray(mask)
    for i in range(n_img):
        write_depth_rle(str(ddir / f"depth_{i:08d}.depth"), depth_np[i])
        cv2.imwrite(str(mdir / f"part_mask_{i:08d}.png"), mask_np[i])

    tree = RTree(24)
    tree.train(str(ddir), str(mdir), num_points_per_image=300,
               num_features=32, max_probe_offset=60.0, min_samples=24,
               max_tree_depth=7, seed=5)
    assert (tree.forest.leafid < 0).sum() > 3
    # accuracy on the training frames themselves must beat chance widely
    total, correct = 0, 0
    for k in range(4):
        pred = tree.predict_best(depth_np[k])
        fg = (mask_np[k] != 255) & (pred != 255)
        total += fg.sum()
        correct += (pred[fg] == mask_np[k][fg]).sum()
    assert total > 500
    assert correct / max(total, 1) > 0.3


def test_train_transfer(model, trained):
    tree = RTree(24)
    tree.set_forest(trained.forest)
    old_leaf = tree.forest.leaf_data.copy()
    train_transfer(tree, model, None, INTRIN, (H, W), num_images=8, seed=31)
    new_leaf = tree.forest.leaf_data
    assert new_leaf.shape == old_leaf.shape
    np.testing.assert_allclose(new_leaf.sum(1), 1.0, atol=1e-5)
    assert not np.allclose(new_leaf, old_leaf)
