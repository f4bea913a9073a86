"""Background subtraction over XYZ maps.

Rebuild of reference BGSubtractor (BGSubtractor.h:4-27, BGSubtractor.cpp):

  Pass 1 — a pixel is *foreground* iff no valid background pixel within a
  (2*size+1)^2 window (size = 1) lies within sqrt(nn_dist_thresh) of it in
  3D.  Pixels with z == 0 are invalid.  Implemented as 9 shifted 3D
  distance stencils (BGSubtractor.cpp:30-80).

  Pass 2 — flood-fill foreground into connected components gated by
  3D neighbor distance <= neighb_thresh; components smaller than
  max(H*W/1000, 100) pixels are erased (BGSubtractor.cpp:82-126).
  Implemented with the label-propagation CC kernel; component ids are
  assigned in first-pixel scan order, matching the reference's discovery
  order.

Mask semantics preserved: uint8 with component ids 0..253, 255 = background
(the reference's INVALID); 254 never appears.  Thresholds scale as
1200000 / (H*W) * rel (BGSubtractor.cpp:160-162).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.perception import cc


@functools.partial(jax.jit, static_argnames=())
def _foreground_mask(background: jnp.ndarray, image: jnp.ndarray,
                     nn_dist_thresh) -> jnp.ndarray:
    """Pass 1: [H, W] bool foreground mask."""
    valid = image[..., 2] != 0.0
    bg_valid = background[..., 2] != 0.0
    min_d2 = jnp.full(image.shape[:2], jnp.inf, image.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = jnp.roll(background, (dy, dx), (0, 1))
            nb_valid = jnp.roll(bg_valid, (dy, dx), (0, 1))
            # out-of-bounds neighbors invalid
            if dy == 1:
                nb_valid = nb_valid.at[0, :].set(False)
            elif dy == -1:
                nb_valid = nb_valid.at[-1, :].set(False)
            if dx == 1:
                nb_valid = nb_valid.at[:, 0].set(False)
            elif dx == -1:
                nb_valid = nb_valid.at[:, -1].set(False)
            d2 = jnp.sum((nb - image) ** 2, axis=-1)
            min_d2 = jnp.where(nb_valid, jnp.minimum(min_d2, d2), min_d2)
    return valid & (min_d2 >= nn_dist_thresh)


@functools.partial(jax.jit, static_argnames=())
def _components(image: jnp.ndarray, fg: jnp.ndarray, neighb_thresh):
    """Pass 2: gated CC over foreground.  Returns (labels [H,W] int32 root
    ids with -1 background, sizes [H*W])."""

    def gate(vals, shifted):
        return jnp.sum((vals - shifted) ** 2, axis=-1) <= neighb_thresh

    labels = cc.connected_components(fg, values=image, edge_gate_fn=gate)
    sizes = cc.component_sizes(labels)
    return labels, sizes


class BGSubtractor:
    def __init__(self, background: np.ndarray, stride: int = 1):
        """background: [H, W, 3] XYZ map of the empty scene.

        stride > 1 runs both passes on a subsampled grid and repeats the
        result back to full resolution — downstream consumers (forest at
        stride 2, optimizer at stride 12) never read finer than that, and
        the connected-component label propagation cost drops by stride^2.
        """
        self.background = np.asarray(background, np.float32)
        self.stride = stride
        self.nn_dist_thresh_rel = 0.005
        self.neighb_thresh_rel = 0.005
        self.num_threads = 1  # API parity; ignored
        self.top_left: Tuple[int, int] = (0, 0)
        self.bot_right: Tuple[int, int] = (0, 0)

    # C++ attribute aliases
    @property
    def nnDistThreshRel(self):
        return self.nn_dist_thresh_rel

    @nnDistThreshRel.setter
    def nnDistThreshRel(self, v):
        self.nn_dist_thresh_rel = v

    @property
    def neighbThreshRel(self):
        return self.neighb_thresh_rel

    @neighbThreshRel.setter
    def neighbThreshRel(self, v):
        self.neighb_thresh_rel = v

    @property
    def topLeft(self):
        return self.top_left

    @property
    def botRight(self):
        return self.bot_right

    def run(self, image: np.ndarray,
            comps_by_size: Optional[List] = None) -> np.ndarray:
        """Segment an XYZ frame: returns a uint8 mask (component ids, 255 =
        background) and updates top_left / bot_right to the foreground bbox.

        If comps_by_size is a list, it is filled with [size, component_id]
        pairs sorted descending (reference BGSubtractor.cpp:152-154).
        """
        Hf, Wf = image.shape[:2]
        st = self.stride
        image_s = image[::st, ::st] if st > 1 else image
        bg_s = self.background[::st, ::st] if st > 1 else self.background
        H, W = image_s.shape[:2]
        # threshold scaling uses full-res dimensions (reference semantics)
        scale = 1200000.0 / (Hf * Wf)
        nn_t = scale * self.nn_dist_thresh_rel
        nb_t = scale * self.neighb_thresh_rel
        img = jnp.asarray(image_s, jnp.float32)
        bg = jnp.asarray(bg_s, jnp.float32)
        fg = _foreground_mask(bg, img, jnp.asarray(nn_t, jnp.float32))
        labels, sizes = _components(img, fg, jnp.asarray(nb_t, jnp.float32))

        labels = np.asarray(labels)
        sizes = np.asarray(sizes)
        min_pts = max(Hf * Wf // 1000, 100) // (st * st)

        roots = np.nonzero(sizes >= min_pts)[0]  # ascending = scan order
        roots = roots[:254]
        id_map = np.full(H * W + 1, 255, np.uint8)
        id_map[roots] = np.arange(len(roots), dtype=np.uint8)
        flat = labels.reshape(-1)
        mask = id_map[np.where(flat >= 0, flat, H * W)].reshape(H, W)

        if st > 1:
            mask = np.repeat(np.repeat(mask, st, 0), st, 1)[:Hf, :Wf]

        valid = mask != 255
        if valid.any():
            ys, xs = np.nonzero(valid)
            self.top_left = (int(xs.min()), int(ys.min()))
            self.bot_right = (int(xs.max()), int(ys.max()))
        else:
            self.top_left = (Wf - 1, Hf - 1)
            self.bot_right = (0, 0)

        if comps_by_size is not None:
            comps_by_size.clear()
            pairs = sorted(
                ([int(sizes[r]) * st * st, i]
                 for i, r in enumerate(roots)), reverse=True)
            comps_by_size.extend(pairs)
        return mask
