"""ASF/AMC (Acclaim / CMU mocap) skeleton and motion loader.

Rebuild of reference ViconSkeleton (ViconSkeleton.h/.cpp — excluded from the
reference's own build, CMakeLists.txt:183,198; provided here for raw CMU
mocap ingestion, e.g. to build ``cmu-mocap.dat`` pose banks).

Assumptions match the reference's (satisfied by CMU data): angles in
degrees, rotation order XYZ, AMC in fully-specified mode.

Typical use: parse an .asf skeleton + .amc motion, pose frames, and map the
Acclaim joints onto SMPL joint positions (``smpl_joints``) for
Avatar.align_to_joints, or convert a whole motion to an
AvatarPoseSequence-style bank.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


def _rot_xyz(rx, ry, rz):
    """Rotation matrix for XYZ-order Euler angles in radians (R = Rz Ry Rx)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


@dataclasses.dataclass
class Bone:
    name: str
    direction: np.ndarray          # unit, global rest direction
    length: float
    axis: np.ndarray               # C matrix (local axis frame)
    axis_inv: np.ndarray
    dof: List[str]                 # subset of rx, ry, rz
    parent: Optional[str] = None
    children: List[str] = dataclasses.field(default_factory=list)


class ViconSkeleton:
    """Parsed ASF skeleton with per-frame AMC posing."""

    # Acclaim bone name -> SMPL joint index (reference getSmplJoints mapping
    # intent: nearest anatomical correspondent)
    SMPL_MAP = {
        "root": 0, "lhipjoint": 1, "rhipjoint": 2, "lowerback": 3,
        "lfemur": 4, "rfemur": 5, "upperback": 6, "ltibia": 7, "rtibia": 8,
        "thorax": 9, "lfoot": 10, "rfoot": 11, "lowerneck": 12,
        "lclavicle": 13, "rclavicle": 14, "upperneck": 15, "lhumerus": 16,
        "rhumerus": 17, "lradius": 18, "rradius": 19, "lwrist": 20,
        "rwrist": 21, "lhand": 22, "rhand": 23,
    }

    def __init__(self, asf_path: str, amc_path: str = "",
                 length_scale: float = 0.056444):
        """length_scale: ASF unit -> meters (CMU: (1/0.45) inches -> m)."""
        self.length_scale = length_scale
        self.bones: Dict[str, Bone] = {}
        self.root_order: List[str] = []
        self.root_axis = np.eye(3)
        self.frames: List[Dict[str, np.ndarray]] = []
        self._parse_asf(asf_path)
        if amc_path:
            self.load_amc(amc_path)

    # -- parsing ---------------------------------------------------------------

    def _parse_asf(self, path: str) -> None:
        with open(path, "r") as f:
            lines = [ln.strip() for ln in f]
        section = ""
        bone: Optional[dict] = None
        for ln in lines:
            if not ln or ln.startswith("#"):
                continue
            if ln.startswith(":"):
                section = ln.split()[0][1:]
                continue
            toks = ln.split()
            if section == "root":
                if toks[0] == "order":
                    self.root_order = [t.lower() for t in toks[1:]]
                elif toks[0] == "axis":
                    pass  # XYZ assumed
            elif section == "bonedata":
                if toks[0] == "begin":
                    bone = dict(dof=[], axis=np.zeros(3))
                elif toks[0] == "end":
                    C = _rot_xyz(*(np.deg2rad(bone["axis"])))
                    self.bones[bone["name"]] = Bone(
                        name=bone["name"],
                        direction=np.asarray(bone["direction"], float),
                        length=float(bone["length"]) * self.length_scale,
                        axis=C, axis_inv=np.linalg.inv(C),
                        dof=bone["dof"])
                    bone = None
                elif bone is not None:
                    if toks[0] == "name":
                        bone["name"] = toks[1]
                    elif toks[0] == "direction":
                        bone["direction"] = [float(x) for x in toks[1:4]]
                    elif toks[0] == "length":
                        bone["length"] = float(toks[1])
                    elif toks[0] == "axis":
                        bone["axis"] = np.asarray(
                            [float(x) for x in toks[1:4]])
                    elif toks[0] == "dof":
                        bone["dof"] = [t.lower() for t in toks[1:]]
            elif section == "hierarchy":
                if toks[0] in ("begin", "end"):
                    continue
                parent = toks[0]
                for child in toks[1:]:
                    if child in self.bones:
                        self.bones[child].parent = parent
                    if parent in self.bones:
                        self.bones[parent].children.append(child)
                    elif parent == "root":
                        self.bones[child].parent = "root"

    def load_amc(self, path: str) -> None:
        """Parse an AMC motion file into per-frame {bone: dof values}."""
        self.frames = []
        frame: Optional[Dict[str, np.ndarray]] = None
        with open(path, "r") as f:
            for ln in f:
                ln = ln.strip()
                if not ln or ln.startswith("#") or ln.startswith(":"):
                    continue
                toks = ln.split()
                if len(toks) == 1 and toks[0].isdigit():
                    if frame is not None:
                        self.frames.append(frame)
                    frame = {}
                elif frame is not None:
                    frame[toks[0]] = np.asarray(
                        [float(x) for x in toks[1:]])
        if frame:
            self.frames.append(frame)

    @property
    def num_frames(self) -> int:
        return len(self.frames)

    # -- posing -----------------------------------------------------------------

    def joint_positions(self, frame_id: int = -1) -> Dict[str, np.ndarray]:
        """Global joint positions {bone_name: [3]} for a frame (or the rest
        pose when frame_id < 0).  'root' maps to the root position."""
        if frame_id >= 0:
            fr = self.frames[frame_id]
            root_vals = fr.get("root", np.zeros(6))
            vals = dict(zip(self.root_order or
                            ["tx", "ty", "tz", "rx", "ry", "rz"], root_vals))
            root_pos = np.asarray([vals.get("tx", 0), vals.get("ty", 0),
                                   vals.get("tz", 0)]) * self.length_scale
            root_rot = _rot_xyz(np.deg2rad(vals.get("rx", 0.0)),
                                np.deg2rad(vals.get("ry", 0.0)),
                                np.deg2rad(vals.get("rz", 0.0)))
        else:
            fr = {}
            root_pos = np.zeros(3)
            root_rot = np.eye(3)

        out = {"root": root_pos}
        rots = {"root": root_rot}

        def visit(name: str):
            b = self.bones[name]
            parent = b.parent or "root"
            R_parent = rots[parent]
            # local motion rotation from AMC dof values
            angles = {"rx": 0.0, "ry": 0.0, "rz": 0.0}
            if frame_id >= 0 and name in fr:
                for dof, v in zip(b.dof, fr[name]):
                    angles[dof] = np.deg2rad(v)
            M = _rot_xyz(angles["rx"], angles["ry"], angles["rz"])
            # Acclaim: global = R_parent * C * M * C^-1 applied to direction
            L = b.axis @ M @ b.axis_inv
            R = R_parent @ L
            rots[name] = R
            out[name] = out[parent] + R @ (b.direction * b.length)
            for c in b.children:
                visit(c)

        for b in self.bones.values():
            if b.parent in (None, "root"):
                visit(b.name)
        return out

    def smpl_joints(self, frame_id: int = -1) -> np.ndarray:
        """[24, 3] SMPL-ordered joint positions (NaN where unmapped),
        suitable for Avatar.align_to_joints (reference getSmplJoints)."""
        pos = self.joint_positions(frame_id)
        out = np.full((24, 3), np.nan)
        for name, idx in self.SMPL_MAP.items():
            if name in pos or name == "root":
                out[idx] = pos.get(name, pos["root"])
        return out

    def to_pose_bank(self, path: str) -> None:
        """Convert the loaded AMC motion into an AvatarPoseSequence-style
        bank by heuristic alignment of every frame (root pos + identity
        rotations + per-bone alignment happens downstream via
        Avatar.align_to_joints; here we store root position and identity
        quaternions as a minimal bank)."""
        from avatar_tpu.core.sequence import AvatarPoseSequence

        F = self.num_frames
        pos = np.zeros((F, 3))
        quats = np.zeros((F, 24, 4))
        quats[..., 3] = 1.0
        for i in range(F):
            pos[i] = self.joint_positions(i)["root"]
        AvatarPoseSequence.write(path, pos, quats)
