"""Renderer tests: analytic single-triangle cases, occlusion, full-model
consistency checks (depth/back-projection agreement, part-mask validity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.render import raster
from avatar_tpu.render.raster import project_points, rasterize
from avatar_tpu.render.renderer import AvatarRenderer, render_frame

INTRIN = CameraIntrin(fx=100.0, fy=100.0, cx=32.0, cy=32.0)


def test_projection_y_flip():
    # +Y (up) in camera space must project to smaller image y (y-flip,
    # AvatarRenderer.cpp:16-19)
    cloud = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.5, 2.0]])
    pr = np.asarray(project_points(cloud, 100.0, 100.0, 32.0, 32.0))
    assert pr[1, 1] < pr[0, 1]
    np.testing.assert_allclose(pr[0], [32.0, 32.0], atol=1e-5)


def test_single_triangle_coverage_and_depth():
    # right triangle covering known pixels at constant depth 2
    proj = jnp.asarray([[10.0, 10.0], [30.0, 10.0], [10.0, 30.0]])
    z = jnp.asarray([2.0, 2.0, 2.0])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize(proj, z, faces, 64, 64, budget=4096)
    depth = np.asarray(out.depth)
    # interior pixel
    assert depth[15, 12] == pytest.approx(2.0, abs=1e-5)
    # outside the hypotenuse (x + y > 40)
    assert depth[29, 29] == 0.0
    # outside bbox
    assert depth[50, 50] == 0.0
    assert int(out.n_dropped) == 0


def test_single_triangle_depth_gradient():
    proj = jnp.asarray([[0.0, 0.0], [40.0, 0.0], [0.0, 40.0]])
    z = jnp.asarray([1.0, 3.0, 1.0])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize(proj, z, faces, 64, 64, budget=4096)
    depth = np.asarray(out.depth)
    # along the x axis, depth interpolates linearly 1 -> 3
    assert depth[0, 20] == pytest.approx(2.0, abs=1e-4)
    assert depth[0, 10] == pytest.approx(1.5, abs=1e-4)


def test_occlusion_nearer_face_wins_any_order():
    proj = jnp.asarray([
        [5.0, 5.0], [25.0, 5.0], [5.0, 25.0],     # far triangle
        [5.0, 5.0], [25.0, 5.0], [5.0, 25.0],     # near triangle (same 2D)
    ])
    z = jnp.asarray([3.0, 3.0, 3.0, 1.0, 1.0, 1.0])
    for order in ([[0, 1, 2], [3, 4, 5]], [[3, 4, 5], [0, 1, 2]]):
        faces = jnp.asarray(order, jnp.int32)
        out = rasterize(proj, z, faces, 32, 32, budget=2048)
        assert np.asarray(out.depth)[10, 10] == pytest.approx(1.0, abs=1e-4)


def test_budget_overflow_reported():
    proj = jnp.asarray([[0.0, 0.0], [60.0, 0.0], [0.0, 60.0]])
    z = jnp.asarray([1.0, 1.0, 1.0])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize(proj, z, faces, 64, 64, budget=16)
    assert int(out.n_dropped) > 0


@pytest.fixture(scope="module")
def posed_avatar():
    from avatar_tpu.testing import synthetic_model

    model = synthetic_model(detail=1)
    ava = Avatar(model)
    ava.randomize(seed=20)
    ava.p = np.array([0.0, 0.0, 2.5])
    ava.update()
    return ava


def test_full_model_render_consistency(posed_avatar):
    ava = posed_avatar
    H = W = 64
    rend = AvatarRenderer(ava, INTRIN)
    depth = rend.render_depth((H, W))
    mask = rend.render_part_mask((H, W))
    fid = rend.render_faces((H, W))

    fg = depth > 0
    assert fg.sum() > 100, "render produced almost no coverage"
    # depth in plausible range of the posed cloud
    zmin, zmax = ava.cloud[:, 2].min(), ava.cloud[:, 2].max()
    assert depth[fg].min() >= zmin - 1e-3
    assert depth[fg].max() <= zmax + 1e-3
    # part mask: foreground labels are valid joints; background is 255
    labels = np.unique(mask)
    assert 255 in labels
    assert all(l < 24 or l == 255 for l in labels)
    # edge-on-as-background: depth==0 wherever mask==255 within fid>=0 region
    np.testing.assert_array_equal(mask != 255, depth > 0)

    # back-projection consistency: rendered depth pixels, unprojected, lie
    # near the model cloud (within a couple of face sizes)
    ys, xs = np.nonzero(fg)
    sel = slice(0, None, 7)
    pts2d = np.stack([xs[sel], ys[sel]], axis=1).astype(np.float32)
    zz = depth[ys[sel], xs[sel]]
    xyz = np.array(INTRIN.to_3d(jnp.asarray(pts2d), jnp.asarray(zz)))
    xyz[:, 1] = -xyz[:, 1]  # undo render y-flip to get avatar space
    from scipy.spatial import cKDTree

    tree = cKDTree(ava.cloud)
    d, _ = tree.query(xyz)
    assert np.percentile(d, 95) < 0.06, f"back-projected depth far from mesh: {np.percentile(d, 95)}"


def test_part_mask_matches_nearest_visible_region(posed_avatar):
    """Pixels at the projection of clearly-visible vertices should get that
    vertex's part (through the NN-vertex rule) most of the time."""
    ava = posed_avatar
    H = W = 64
    rend = AvatarRenderer(ava, INTRIN)
    mask = rend.render_part_mask((H, W))
    depth = rend.render_depth((H, W))
    proj = rend.get_projected_points()
    cloud = ava.cloud
    mj = ava.model.main_joint
    hits = 0
    total = 0
    for i in range(0, cloud.shape[0], 5):
        x, y = int(round(proj[i, 0])), int(round(proj[i, 1]))
        if not (0 <= x < W and 0 <= y < H):
            continue
        if depth[y, x] <= 0 or cloud[i, 2] > depth[y, x] + 0.02:
            continue  # occluded or edge pixel
        total += 1
        if mask[y, x] == mj[i]:
            hits += 1
    assert total > 20
    assert hits / total > 0.7, f"part mask agreement too low: {hits}/{total}"


def test_lambert_render(posed_avatar):
    rend = AvatarRenderer(posed_avatar, INTRIN)
    lam = rend.render_lambert((64, 64))
    assert lam.dtype == np.uint8
    assert (lam > 0).sum() > 100
    depth = rend.render_depth((64, 64))
    # lambert coverage roughly within depth coverage (edge-on faces differ)
    both = ((lam > 0) & (depth > 0)).sum()
    assert both / max((lam > 0).sum(), 1) > 0.8


def test_batched_render_matches_single(posed_avatar):
    ava = posed_avatar
    H = W = 48
    cloud = jnp.asarray(ava.cloud, jnp.float32)
    faces = jnp.asarray(ava.model.faces, jnp.int32)
    vp = jnp.asarray(ava.model.main_joint, jnp.int32)
    budget = raster.default_budget(H, W, int(faces.shape[0]))

    single = render_frame(cloud, faces, vp, INTRIN.fx, INTRIN.fy, INTRIN.cx,
                          INTRIN.cy, H, W, budget)
    batched = jax.vmap(
        lambda c: render_frame(c, faces, vp, INTRIN.fx, INTRIN.fy, INTRIN.cx,
                               INTRIN.cy, H, W, budget)
    )(jnp.stack([cloud, cloud + jnp.asarray([0.1, 0, 0])]))
    np.testing.assert_array_equal(np.asarray(batched.depth[0]),
                                  np.asarray(single.depth))
    assert not np.array_equal(np.asarray(batched.depth[1]),
                              np.asarray(single.depth))


def test_renderer_requires_update():
    from avatar_tpu.testing import synthetic_model

    ava = Avatar(synthetic_model(detail=1))
    rend = AvatarRenderer(ava, INTRIN)
    with pytest.raises(RuntimeError):
        rend.render_depth((32, 32))
