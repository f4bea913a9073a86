"""Perception tests: connected components, forest inference vs a recursive
numpy oracle, blob postprocessing, background subtraction."""

import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.io import formats
from avatar_tpu.perception import cc
from avatar_tpu.perception.bgsub import BGSubtractor
from avatar_tpu.perception.rtree import (BACKGROUND_DEPTH, RTree,
                                         remove_small_pieces,
                                         suppress_part_nonmax)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def test_cc_two_blobs():
    img = np.zeros((8, 10), bool)
    img[1:3, 1:3] = True       # blob A, first pixel (1,1) -> flat 11
    img[5:7, 6:9] = True       # blob B, first pixel (5,6) -> flat 56
    labels = np.asarray(cc.connected_components(jnp.asarray(img)))
    assert labels[1, 1] == labels[2, 2] == 11
    assert labels[5, 6] == labels[6, 8] == 5 * 10 + 6
    assert labels[0, 0] == -1
    sizes = np.asarray(cc.component_sizes(jnp.asarray(labels)))
    assert sizes[11] == 4
    assert sizes[56] == 6


def test_cc_snake_converges():
    # a long winding 1-px path stresses propagation distance
    img = np.zeros((16, 16), bool)
    for r in range(16):
        img[r, :] = True
        if r + 1 < 16:
            img[r, 1:-1] = (r % 2 == 0)
    img[:, 0] = True
    labels = np.asarray(cc.connected_components(jnp.asarray(img)))
    active_labels = labels[img]
    assert (active_labels == active_labels[0]).all()


def test_cc_value_gate():
    img = np.ones((4, 6), bool)
    vals = np.zeros((4, 6), np.uint8)
    vals[:, 3:] = 7  # two halves with different values do not connect
    labels = np.asarray(cc.connected_components(
        jnp.asarray(img), values=jnp.asarray(vals)))
    assert labels[0, 0] != labels[0, 5]
    assert labels[3, 2] == labels[0, 0]
    assert labels[3, 4] == labels[0, 3]


# ---------------------------------------------------------------------------
# forest inference
# ---------------------------------------------------------------------------


def _toy_forest():
    """Depth-3 tree distinguishing 3 parts by two probes."""
    n_nodes, num_parts = 7, 3
    u = np.zeros((n_nodes, 2), np.float32)
    v = np.zeros((n_nodes, 2), np.float32)
    thresh = np.zeros(n_nodes, np.float32)
    lnode = np.full(n_nodes, -1, np.int32)
    rnode = np.full(n_nodes, -1, np.int32)
    leafid = np.full(n_nodes, -1, np.int32)
    # root: probe 4px right vs self (scaled by depth 2 -> u = 8)
    u[0] = [8.0, 0.0]
    v[0] = [0.0, 0.0]
    thresh[0] = 5.0
    lnode[0], rnode[0] = 1, 2
    # left child: probe 4px down vs self
    u[1] = [0.0, 8.0]
    v[1] = [0.0, 0.0]
    thresh[1] = 5.0
    lnode[1], rnode[1] = 3, 4
    # right child: leaf-ish split never used meaningfully
    u[2] = [0.0, 0.0]
    v[2] = [0.0, 0.0]
    thresh[2] = 100.0
    lnode[2], rnode[2] = 5, 6
    leafid[3], leafid[4], leafid[5], leafid[6] = 0, 1, 2, 2
    leaf_data = np.array([
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, 1.0],
    ], np.float32)
    return formats.ForestData(u, v, thresh, lnode, rnode, leafid, leaf_data,
                              num_parts)


def _predict_oracle(fd, depth, interval=1, tl=(0, 0), br=None):
    """Recursive reference walk (RTree.cpp:3122-3146 semantics)."""
    H, W = depth.shape
    if br is None:
        br = (W - 1, H - 1)

    def get(px, py):
        if px < tl[0] or py < tl[1] or px > br[0] or py > br[1]:
            return BACKGROUND_DEPTH
        z = depth[py, px]
        return BACKGROUND_DEPTH if z == 0 else z

    out = np.full((H, W), 255, np.uint8)
    for y in range(0, H, interval):
        for x in range(0, W, interval):
            if depth[y, x] == 0 or not (tl[0] <= x <= br[0] and
                                        tl[1] <= y <= br[1]):
                continue
            z = depth[y, x]
            n = 0
            while fd.leafid[n] < 0:
                ux = int(np.round(fd.u[n, 0] / z))
                uy = int(np.round(fd.u[n, 1] / z))
                vx = int(np.round(fd.v[n, 0] / z))
                vy = int(np.round(fd.v[n, 1] / z))
                f = get(x + ux, y + uy) - get(x + vx, y + vy)
                n = fd.lnode[n] if f < fd.thresh[n] else fd.rnode[n]
            out[y, x] = np.argmax(fd.leaf_data[fd.leafid[n]])
    return out


@pytest.fixture(scope="module")
def toy_depth(rng=None):
    r = np.random.default_rng(3)
    depth = np.zeros((24, 32), np.float32)
    depth[4:20, 6:26] = 2.0
    depth[8:12, 10:14] = 1.2            # a nearer patch
    depth[r.random((24, 32)) < 0.05] = 0  # holes
    return depth


def test_forest_matches_oracle(toy_depth):
    fd = _toy_forest()
    tree = RTree(3)
    tree.set_forest(fd)
    got = tree.predict_best(toy_depth, interval=1)
    want = _predict_oracle(fd, toy_depth)
    np.testing.assert_array_equal(got, want)


def test_forest_interval_and_roi(toy_depth):
    fd = _toy_forest()
    tree = RTree(3)
    tree.set_forest(fd)
    tl, br = (6, 4), (25, 19)
    got = tree.predict_best(toy_depth, interval=2, top_left=tl, bot_right=br,
                            fill_in_gaps=False)
    want = _predict_oracle(fd, toy_depth, interval=2, tl=tl, br=br)
    np.testing.assert_array_equal(got[::2, ::2], want[::2, ::2])
    # gap filling copies the cell anchor within the ROI
    filled = tree.predict_best(toy_depth, interval=2, top_left=tl,
                               bot_right=br, fill_in_gaps=True)
    ys, xs = np.nonzero(want[::2, ::2] != 255)
    for y, x in zip(ys[:20] * 2, xs[:20] * 2):
        if tl[0] <= x + 1 <= br[0] and tl[1] <= y + 1 <= br[1]:
            assert filled[y + 1, x + 1] == filled[y, x]


def test_forest_srtr_roundtrip(toy_depth, tmp_path):
    fd = _toy_forest()
    tree = RTree(3)
    tree.set_forest(fd)
    path = str(tmp_path / "toy.srtr")
    tree.export_file(path)
    tree2 = RTree(path)
    np.testing.assert_array_equal(
        tree.predict_best(toy_depth), tree2.predict_best(toy_depth))


def test_forest_distributions(toy_depth):
    fd = _toy_forest()
    tree = RTree(3)
    tree.set_forest(fd)
    dist = tree.predict(toy_depth)
    best = tree.predict_best(toy_depth)
    fg = best != 255
    np.testing.assert_array_equal(np.argmax(dist, -1)[fg], best[fg])
    assert (dist[~fg] == 0).all()


# ---------------------------------------------------------------------------
# postprocess
# ---------------------------------------------------------------------------


def test_suppress_part_nonmax_keeps_biggest():
    img = np.full((20, 20), 255, np.uint8)
    img[2:5, 2:5] = 1        # 9 px blob of part 1
    img[10:18, 10:18] = 1    # 64 px blob of part 1
    img[2:4, 12:14] = 2      # only blob of part 2
    com_pre = np.full((2, 3), -1.0, np.float32)
    com_pre[1, :] = 0.0
    out, new_com = suppress_part_nonmax(
        jnp.asarray(img), jnp.asarray(com_pre), 3, 1, 0.001,
        jnp.asarray([0, 0]))
    out = np.asarray(out)
    assert (out[2:5, 2:5] == 255).all()       # small blob erased
    assert (out[10:18, 10:18] == 1).all()     # big blob kept
    assert (out[2:4, 12:14] == 2).all()       # sole part-2 blob kept
    new_com = np.asarray(new_com)
    assert abs(new_com[0, 1] - 13.5) < 0.6    # com of the big blob
    assert new_com[0, 0] == -1.0              # part 0 absent


def test_suppress_part_nonmax_com_tracking():
    """A slightly smaller blob wins when the previous center of mass is on
    it and the distance weight is large."""
    img = np.full((30, 60), 255, np.uint8)
    img[5:10, 2:7] = 1       # 25 px at x~4
    img[5:11, 50:55] = 1     # 30 px at x~52
    com_pre = np.full((2, 2), -1.0, np.float32)
    com_pre[:, 1] = [4.0, 7.0]   # previous com on the smaller blob
    out, _ = suppress_part_nonmax(
        jnp.asarray(img), jnp.asarray(com_pre), 2, 1, 1.0,
        jnp.asarray([0, 0]))
    out = np.asarray(out)
    assert (out[5:10, 2:7] == 1).all()
    assert (out[5:11, 50:55] == 255).all()


def test_remove_small_pieces():
    img = np.full((40, 40), 255, np.uint8)
    img[1:3, 1:3] = 0                     # 4 px: below 0.0005*1600=0.8? no...
    img[10:30, 10:30] = 0                 # 400 px blob
    # threshold = H*W/interval^2 * 0.0005 = 0.8 px -> even 4px survives;
    # use a bigger thresh to exercise erasure
    out = np.asarray(remove_small_pieces(
        jnp.asarray(img), 1, 1, jnp.asarray([40, 40]), thresh=0.01))
    assert (out[1:3, 1:3] == 255).all()
    assert (out[10:30, 10:30] == 0).all()


# ---------------------------------------------------------------------------
# background subtraction
# ---------------------------------------------------------------------------


def test_bgsubtractor():
    H, W = 48, 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    bg = np.stack([(xx - 32) * 0.01, (yy - 24) * 0.01,
                   np.full((H, W), 3.0, np.float32)], -1)
    img = bg.copy()
    img[10:30, 20:40, 2] = 2.0           # a person-ish box 1m in front
    img[40:42, 5:7, 2] = 1.5             # small noise blob (4 px < min)
    sub = BGSubtractor(bg)
    # the reference's thresholds scale by 1.2e6/(H*W); tiny test images need
    # correspondingly smaller relative thresholds
    sub.nn_dist_thresh_rel = 0.002
    sub.neighb_thresh_rel = 0.002
    comps = []
    mask = sub.run(img, comps)
    assert mask.dtype == np.uint8
    # main component labeled 0 (first in scan order), noise + bg are 255
    assert (mask[10:30, 20:40] == 0).all()
    assert (mask[40:42, 5:7] == 255).all()
    assert (mask[:5, :5] == 255).all()
    assert sub.top_left == (20, 10)
    assert sub.bot_right == (39, 29)
    assert comps == [[400, 0]]


def test_bgsubtractor_invalid_depth_is_background():
    H, W = 32, 32
    bg = np.zeros((H, W, 3), np.float32)
    bg[..., 2] = 2.5
    img = bg.copy()
    img[5:25, 5:25, 2] = 1.5
    img[8:10, 8:10, 2] = 0.0   # sensor holes inside the foreground
    sub = BGSubtractor(bg)
    sub.nn_dist_thresh_rel = 0.0005
    sub.neighb_thresh_rel = 0.0005
    mask = sub.run(img)
    assert (mask[8:10, 8:10] == 255).all()
    assert mask[6, 6] != 255


def test_walk_pixels_matches_dense_walk(toy_depth):
    """walk_pixels over a scattered pixel subset must agree with the dense
    forest_walk at the same pixels (the fused tracker walks a compacted
    foreground bucket)."""
    import jax.numpy as jnp

    from avatar_tpu.perception.rtree import forest_walk, walk_pixels

    fd = _toy_forest()
    tree = RTree(3)
    tree.set_forest(fd)
    t = tree._tree
    H, W = toy_depth.shape
    tl = jnp.asarray([0, 0], jnp.int32)
    br = jnp.asarray([W - 1, H - 1], jnp.int32)
    dense = np.asarray(forest_walk(t, jnp.asarray(toy_depth),
                                   tree._max_depth, 1, tl, br))
    r = np.random.default_rng(0)
    ys = r.integers(0, H, 64)
    xs = r.integers(0, W, 64)
    z = toy_depth[ys, xs]
    fg = z > 0
    got = np.asarray(walk_pixels(
        t, jnp.asarray(ys, jnp.int32), jnp.asarray(xs, jnp.int32),
        jnp.asarray(z), jnp.asarray(fg),
        jnp.asarray(toy_depth).reshape(-1), (H, W), tree._max_depth,
        tl, br))
    np.testing.assert_array_equal(got, dense[ys, xs])
