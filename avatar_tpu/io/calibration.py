"""Camera intrinsics (pinhole + distortion coefficients).

Mirrors the reference ``CameraIntrin`` (include/Calibration.h:11-77,
Calibration.cpp) including the on-disk ``intrin.txt`` format: whitespace
separated ``tag value`` pairs with tags fx/fy/cx/cy plus distortion
coefficients.

Documented divergence (bug-for-bug fidelity NOT preserved, on purpose):
the reference's ``writeFile`` emits 0-based distortion tags ``k0..k5`` /
``p0 p1`` (Calibration.cpp:104-108), and the genuine Azure-Kinect-produced
artifact shipped with the reference (``intrin.txt``) uses that scheme —
but the reference's ``readFile`` decodes tags with ``idx = tag[1] - '1'``
(Calibration.cpp:39-46), i.e. 1-based, so it silently DROPS ``k0`` and
``p0`` of its own writer's output and shifts nothing else. We parse the
writer's 0-based scheme faithfully, recovering every coefficient from
genuine reference files; see tests/test_formats.py::test_intrin_reads_
reference_artifact.

Device-side helpers (`depth_to_xyz`, `project`) are plain jnp functions so
they can be fused into larger jitted pipelines.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CameraIntrin:
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    # Radial distortion k1..k6 and tangential p1, p2 (stored, not applied —
    # same as the reference, which stores but never applies distortion).
    k: tuple = (0.0,) * 6
    p: tuple = (0.0, 0.0)

    # -- file I/O (reference Calibration.cpp:19-51, 97-112) ------------------

    @classmethod
    def from_file(cls, path: str) -> "CameraIntrin":
        intr = cls()
        k = [0.0] * 6
        p = [0.0] * 2
        good = 0
        with open(path, "r") as f:
            toks = f.read().split()
        it = iter(range(0, len(toks) - 1))
        i = 0
        while i + 1 < len(toks):
            tag = toks[i]
            if len(tag) != 2:
                i += 1
                continue
            try:
                val = float(toks[i + 1])
            except ValueError:
                i += 1
                continue
            if tag == "fx":
                intr.fx = val
                good += 1
            elif tag == "fy":
                intr.fy = val
                good += 1
            elif tag == "cx":
                intr.cx = val
                good += 1
            elif tag == "cy":
                intr.cy = val
                good += 1
            elif tag[0] == "k" and tag[1].isdigit():
                # 0-based, matching the reference *writer* and the genuine
                # artifact (see module docstring re the reference reader's
                # off-by-one).
                idx = int(tag[1])
                if 0 <= idx < 6:
                    k[idx] = val
            elif tag[0] == "p" and tag[1].isdigit():
                idx = int(tag[1])
                if 0 <= idx < 2:
                    p[idx] = val
            i += 2
        intr.k = tuple(k)
        intr.p = tuple(p)
        if good != 4:
            raise ValueError(f"intrin file {path} missing fx/fy/cx/cy")
        return intr

    def write_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(f"fx {self.fx}\ncx {self.cx}\nfy {self.fy}\ncy {self.cy}\n")
            for i, v in enumerate(self.k):
                if v != 0.0:
                    f.write(f"k{i} {v}\n")
            for i, v in enumerate(self.p):
                if v != 0.0:
                    f.write(f"p{i} {v}\n")

    # -- geometry -------------------------------------------------------------

    def to_3d(self, points_2d, depth):
        """Screen [..., 2] + depth [...] -> camera-space XYZ [..., 3].

        Reference Calibration.cpp:68-74.
        """
        x = (points_2d[..., 0] - self.cx) * depth / self.fx
        y = (points_2d[..., 1] - self.cy) * depth / self.fy
        return jnp.stack([x, y, depth], axis=-1)

    def to_2d(self, points_3d):
        """Camera-space XYZ [..., 3] -> screen [..., 2].

        Reference Calibration.cpp:76-80 (note: no y-flip; the avatar
        renderer applies its own y-flip separately).
        """
        z = points_3d[..., 2]
        return jnp.stack(
            [
                points_3d[..., 0] * self.fx / z + self.cx,
                points_3d[..., 1] * self.fy / z + self.cy,
            ],
            axis=-1,
        )

    def depth_to_xyz(self, depth):
        """Depth map [H, W] -> XYZ map [H, W, 3].

        Reference Calibration.cpp:82-95:  x = (c - cx) z / fx,
        y = (r - cy) z / fy.  Zero depth maps to (0, 0, 0).
        """
        H, W = depth.shape
        cols = jnp.arange(W, dtype=depth.dtype)
        rows = jnp.arange(H, dtype=depth.dtype)
        x = (cols[None, :] - self.cx) * depth / self.fx
        y = (rows[:, None] - self.cy) * depth / self.fy
        return jnp.stack([x, y, depth], axis=-1)

    def depth_to_xyz_np(self, depth: np.ndarray) -> np.ndarray:
        """Host (numpy) version of `depth_to_xyz` for the IO pipeline."""
        H, W = depth.shape
        cols = np.arange(W, dtype=depth.dtype)
        rows = np.arange(H, dtype=depth.dtype)
        x = (cols[None, :] - self.cx) * depth / self.fx
        y = (rows[:, None] - self.cy) * depth / self.fy
        return np.stack([x, y, depth], axis=-1)


def intrin_from_xyz(xyz_map: np.ndarray) -> "CameraIntrin":
    """Recover pinhole intrinsics from a recorded XYZ map by least squares
    (reference getCameraIntrinFromXYZ, Util.cpp:137-174).

    Solves  c*z = fx*x + cx*z  and  r*z = fy*y + cy*z  over all pixels.
    Pixels with zero depth contribute zero rows (as in the reference,
    where they only reinforce the trivial equation 0 = 0).
    """
    m = np.asarray(xyz_map, np.float64)
    H, W = m.shape[:2]
    cols, rows = np.meshgrid(np.arange(W), np.arange(H))
    x = m[..., 0].ravel()
    y = m[..., 1].ravel()
    z = m[..., 2].ravel()
    A = np.stack([x, z], axis=1)
    fx, cx = np.linalg.lstsq(A, cols.ravel() * z, rcond=None)[0]
    A[:, 0] = y
    fy, cy = np.linalg.lstsq(A, rows.ravel() * z, rcond=None)[0]
    return CameraIntrin(fx=float(fx), fy=float(fy),
                        cx=float(cx), cy=float(cy))
