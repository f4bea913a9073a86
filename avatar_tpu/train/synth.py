"""Batched synthetic depth-frame generation (the AvatarDataSource / smplsynth
rendering path, on device).

Rebuild of reference AvatarDataSource (RTree.cpp:421-540) and the smplsynth
worker loop (smplsynth.cpp:89-168): image i is generated deterministically
from its id — mocap pose frame seq[i % F] with identity root rotation, plus
randomized shape (N(0,1)) and root position/orientation (the reference
regenerates images on checkpoint resume the same way, via its stored xorKey).

Everything is vmapped: a whole batch of avatars is posed, skinned and
rasterized in one jitted program; shard the batch axis over a device mesh
for multi-chip generation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from avatar_tpu.core import rotation
from avatar_tpu.core.lbs import LBSParams, lbs
from avatar_tpu.render import raster
from avatar_tpu.render.renderer import render_frame


class SynthSource(NamedTuple):
    """Static inputs of the generator (a frozen pytree)."""
    lbs: LBSParams
    faces: jnp.ndarray         # [F, 3]
    vertex_part: jnp.ndarray   # [P] part labels (part_map applied)
    mocap_pos: jnp.ndarray     # [M, 3] mocap root positions
    mocap_rots: jnp.ndarray    # [M, J, 3, 3] mocap joint rotations
    frame_seq: jnp.ndarray     # [N_img] shuffled mocap frame ids
    intrin: jnp.ndarray        # [4] fx, fy, cx, cy


def sample_pose(src: SynthSource, image_id: jnp.ndarray, seed: jnp.ndarray,
                n_keys: int):
    """Deterministic pose/shape for one image id (AvatarDataSource
    semantics: mocap pose, identity root rotation, randomized shape + root
    pos/rot; smplsynth.cpp:106-114)."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), image_id)
    k_w, k_pos, k_up, k_ax, k_pang = jax.random.split(key, 5)
    M = src.mocap_pos.shape[0]
    frame = src.frame_seq[image_id % src.frame_seq.shape[0]] % M
    rots = src.mocap_rots[frame]
    w = jax.random.normal(k_w, (n_keys,))
    # root box + facing rotation (Avatar.cpp:103-125)
    u = jax.random.uniform(k_pos, (3,))
    p = jnp.stack([u[0] * 2 - 1, u[1] - 0.5, 2.2 + u[2] * 2.3])
    angle_up = jax.random.uniform(k_up, (), minval=-jnp.pi / 3,
                                  maxval=jnp.pi / 3) + jnp.pi
    theta = jax.random.uniform(k_ax, (), minval=0.0, maxval=2 * jnp.pi)
    phi = jax.random.uniform(k_ax, (), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    axis = rotation.from_spherical(1.0, theta, phi)
    angle_pert = 0.2 * jax.random.normal(k_pang, ())
    r0 = rotation.so3_exp(axis * angle_pert) @ rotation.so3_exp(
        jnp.asarray([0.0, 1.0, 0.0]) * angle_up)
    rots = rots.at[0].set(r0)
    return w, p, rots


@functools.partial(
    jax.jit, static_argnames=("parents", "height", "width", "budget",
                              "n_keys"))
def render_batch(src: SynthSource, parents: Tuple[int, ...],
                 image_ids: jnp.ndarray, seed: jnp.ndarray, height: int,
                 width: int, n_keys: int, budget: int = 0):
    """Generate a batch of synthetic frames: (depth [B,H,W],
    part_mask [B,H,W] uint8, joints [B,J,3])."""
    if budget == 0:
        budget = raster.default_budget(height, width,
                                       int(src.faces.shape[0]))
    fx, fy, cx, cy = src.intrin[0], src.intrin[1], src.intrin[2], src.intrin[3]

    def one(i):
        w, p, rots = sample_pose(src, i, seed, n_keys)
        cloud, joints, _, _ = lbs(src.lbs, parents, w, p, rots)
        fr = render_frame(cloud, src.faces, src.vertex_part, fx, fy, cx, cy,
                          height, width, budget)
        return fr.depth, fr.part_mask, joints

    return jax.vmap(one)(image_ids)


def make_source(model, intrin, part_map=None, pose_seq=None, n_images=1000,
                seed: int = 0) -> SynthSource:
    """Build a SynthSource from an AvatarModel (+ optional mocap bank)."""
    import numpy as np

    mj = model.main_joint
    if part_map is None or len(part_map) == 0:
        vertex_part = jnp.asarray(mj, jnp.int32)
    else:
        vertex_part = jnp.asarray(np.asarray(part_map, np.int32)[mj])
    if pose_seq is not None and pose_seq.num_frames > 0:
        pos, rots = pose_seq.frames_as_arrays(model.dtype)
    else:
        # no mocap bank: sample poses from the GMM prior
        if model.pose_prior is None:
            raise ValueError("need a mocap bank or a pose prior")
        key = jax.random.PRNGKey(seed + 1)
        M = min(n_images, 512)
        aa = model.pose_prior.sample(key, (M,)).reshape(
            M, model.num_joints() - 1, 3)
        rots = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=model.dtype), (M, 1, 3, 3)),
             rotation.so3_exp(aa)], axis=1)
        pos = jnp.zeros((M, 3), model.dtype)
    rng = np.random.default_rng(seed)
    frame_seq = jnp.asarray(
        rng.permutation(np.arange(n_images, dtype=np.int32)) %
        max(int(pos.shape[0]), 1))
    return SynthSource(
        lbs=model.params,
        faces=jnp.asarray(model.faces, jnp.int32),
        vertex_part=vertex_part,
        mocap_pos=pos,
        mocap_rots=rots,
        frame_seq=frame_seq,
        intrin=jnp.asarray([intrin.fx, intrin.fy, intrin.cx, intrin.cy],
                           model.dtype),
    )
