"""CLI tool smoke tests: every tool runs end-to-end on synthetic inputs."""

import os

import numpy as np
import pytest

from avatar_tpu.io.dataset import Dataset


def test_smplsynth_and_rtree_dataset_flow(tmp_path):
    from avatar_tpu.tools import smplsynth

    out = str(tmp_path / "synth")
    smplsynth.main([out, "-n", "4", "--width", "128", "--height", "128",
                    "--fx", "110", "--fy", "110", "--cx", "64", "--cy", "64",
                    "--synthetic-model", "1", "--batch", "4"])
    ds = Dataset(out, pad=8)
    assert ds.has_frame(0) and ds.has_frame(3) and not ds.has_frame(4)
    d = ds.depth(0)
    assert d.shape == (128, 128) and (d > 0).sum() > 50
    m = ds.part_mask(0)
    assert m is not None and (m != 255).sum() > 50
    j = ds.joints(0)
    assert j is not None and j["joints_xyz"].shape == (24, 3)


def test_rtree_train_run_transfer_flow(tmp_path):
    from avatar_tpu.tools import rtree_train, rtree_transfer, rtree_run

    tree_path = str(tmp_path / "t.srtr")
    rtree_train.main([tree_path, "--synthetic-model", "1", "--images", "12",
                      "--pixels", "200", "--features", "16", "--depth", "5",
                      "--min-samples", "20", "--probe", "60",
                      "--width", "128", "--height", "128", "--fx", "110",
                      "--fy", "110", "--cx", "64", "--cy", "64", "-q"])
    assert os.path.exists(tree_path)

    out_path = str(tmp_path / "t2.srtr")
    rtree_transfer.main([tree_path, out_path, "--synthetic-model", "1",
                         "--images", "4", "--width", "128", "--height", "128",
                         "--fx", "110", "--fy", "110", "--cx", "64",
                         "--cy", "64", "-q"])
    assert os.path.exists(out_path)


def test_smpltrim(tmp_path):
    from avatar_tpu.core.model import AvatarModel
    from avatar_tpu.tools import smpltrim

    out = str(tmp_path / "trimmed")
    smpltrim.main([out, "--synthetic-model", "1", "-d", "L_HIP",
                   "-d", "R_HIP", "-t", "0.5"])
    m = AvatarModel(out)
    # deleting both hip subtrees removes 8 leg joints (hip/knee/ankle/foot)
    assert m.num_joints() == 16
    assert m.num_points() > 100
    assert (m.faces < m.num_points()).all()
    from avatar_tpu.core.model import Avatar

    ava = Avatar(m)
    ava.update()
    assert np.isfinite(ava.cloud).all()


def test_smpl_viewer(tmp_path):
    from avatar_tpu.tools import smpl_viewer

    out = str(tmp_path / "view.png")
    smpl_viewer.main(["-o", out, "--synthetic-model", "1", "--random", "3",
                      "--mode", "parts", "--size", "128x128"])
    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_data_recording_and_demo(tmp_path):
    from avatar_tpu.tools import data_recording, demo

    out = str(tmp_path / "rec")
    data_recording.main([out, "--camera", "synthetic", "--frames", "3",
                         "--fps", "0", "--verify"])
    ds = Dataset(out, pad=4)
    assert sum(1 for _ in ds.frames(start=1)) == 3


def test_optim_tool():
    from avatar_tpu.tools import optim_tool

    post = optim_tool.main(["--synthetic-model", "1", "--size", "192x192",
                            "--icp-iters", "3", "--interval", "2"])
    assert post < 0.08


def test_live_demo_synthetic(tmp_path):
    from avatar_tpu.tools import live_demo

    live_demo.main(["--camera", "synthetic", "--frames", "3",
                    "--synthetic-model", "1", "-I", "4", "-M", "200"])


def test_demo_tool_over_synthetic_dataset(tmp_path):
    """Full demo.cpp flow: generate a dataset, train a forest, track it."""
    from avatar_tpu.tools import demo, rtree_train, smplsynth

    ds = str(tmp_path / "ds")
    smplsynth.main([ds, "-n", "4", "--width", "160", "--height", "160",
                    "--fx", "140", "--fy", "140", "--cx", "80", "--cy", "80",
                    "--synthetic-model", "1", "--batch", "4"])
    tree = str(tmp_path / "t.srtr")
    rtree_train.main([tree, "--synthetic-model", "1", "--images", "10",
                      "--pixels", "200", "--features", "16", "--depth", "5",
                      "--min-samples", "20", "--probe", "70",
                      "--width", "160", "--height", "160", "--fx", "140",
                      "--fy", "140", "--cx", "80", "--cy", "80", "-q"])
    out = str(tmp_path / "overlay")
    demo.main([ds, tree, "-p", "8", "-i", "0", "--synthetic-model", "1",
               "-I", "6", "-M", "100", "--max-frames", "3", "--out", out,
               "--rtree-only"])
    # and the tracking path (no --rtree-only)
    demo.main([ds, tree, "-p", "8", "-i", "0", "--synthetic-model", "1",
               "-I", "6", "-M", "100", "--max-frames", "2"])
    # offline max-throughput batch mode (fused tracker)
    demo.main([ds, tree, "-p", "8", "-i", "0", "--synthetic-model", "1",
               "-I", "6", "-M", "100", "--max-frames", "4", "--fused",
               "--throughput", "2"])


def test_face_landmark_tracking(tmp_path, capsys):
    """Face tracking prototype: heuristic detector + grouped feature
    trackers + state machine run over a synthetic recorded dataset."""
    from avatar_tpu.tools import data_recording, face_landmark_tracking

    out = str(tmp_path / "rec")
    data_recording.main([out, "--camera", "synthetic", "--frames", "4",
                         "--fps", "0"])
    face_landmark_tracking.main([out, "--max-frames", "4"])
    printed = capsys.readouterr().out
    lines = [l for l in printed.splitlines() if l.startswith("frame")]
    assert len(lines) >= 4
    # the synthetic avatar's head is found and feature boxes are produced
    assert any("nose=" in l and "mouth=" in l for l in lines)


def test_smpl_viewer_interactive(tmp_path):
    """Interactive slider viewer: drive its state programmatically (set a
    joint pose and a shape key, re-render) and save a headless snapshot."""
    from avatar_tpu.tools import smpl_viewer

    out = str(tmp_path / "iview.png")
    smpl_viewer.main(["-o", out, "--synthetic-model", "1", "--interactive",
                      "--size", "96x96", "--lbs-weights-of", "4"])
    assert os.path.exists(out)

    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.testing import synthetic_model

    model = synthetic_model(detail=1)
    ava = Avatar(model)
    ava.p = np.array([0.0, 0.0, 2.5])
    ava.update()
    intrin = CameraIntrin(fx=90.0, fy=90.0, cx=48.0, cy=48.0)
    v = smpl_viewer.InteractiveViewer(model, ava, intrin, (96, 96))
    base = v.render().copy()
    v.set_pose(4, [1.0, 0.2, 0.0])
    posed = v.render()
    assert posed.shape == base.shape
    assert (posed != base).mean() > 0.001  # pose change moved pixels
    v.set_shape(0, 2.0)
    shaped = v.render()
    assert (shaped != posed).mean() > 0.001


def test_scratch_tool(tmp_path):
    from avatar_tpu.tools import scratch

    out = str(tmp_path / "s.png")
    scratch.main(["-o", out, "--synthetic-model", "1", "--random", "5"])
    assert os.path.exists(out)
