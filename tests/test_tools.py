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


def test_live_demo_interactive_state_machine():
    """Scripted-key drive of the reference's interactive loop
    (live-demo.cpp:491-529): start paused -> no tracking; SPACE unpauses
    AND captures the background; pausing again arms reinit; the next
    unpause reinitializes; 'b' recaptures background; 'q' quits."""
    from avatar_tpu.tools import live_demo

    # frame_no -> keycode script (everything else: no key)
    script = {0: ord(' '),    # unpause + capture background
              4: ord(' '),    # pause (arms reinit)
              6: ord('b'),    # recapture background while paused
              7: ord(' '),    # unpause -> reinitialized track
              10: ord('q')}   # quit
    frame_no = [0]

    def keys():
        k = script.get(frame_no[0], -1)
        frame_no[0] += 1
        return k

    log = []

    def on_frame(n, state, res):
        log.append((n, state.pause, state.bg_set,
                    None if res is None else res.reinitialized))

    live_demo.main(["--camera", "synthetic", "--frames", "12",
                    "--synthetic-model", "1", "-I", "4", "-M", "200",
                    "--interactive"],
                   key_source=keys, on_frame=on_frame)

    by_frame = {n: (p, bg, r) for n, p, bg, r in log}
    # frame 0: space flips pause off and captures the background; tracking
    # runs (result may be lost: the captured background contains the
    # subject, exactly as in the reference when unpausing with someone in
    # frame)
    assert by_frame[0][0] is False and by_frame[0][1] is True
    assert by_frame[0][2] is not None
    # frames 1-3: unpaused, tracking produces results
    assert by_frame[2][0] is False and by_frame[2][2] is not None
    # frames 4-6: paused -> no tracking
    assert by_frame[4] == (True, True, None)
    assert by_frame[5][2] is None
    # frame 7: unpaused again -> tracking resumes
    assert by_frame[7][0] is False and by_frame[7][2] is not None
    # quit key ends the loop before --frames
    assert max(by_frame) < 11


def test_live_demo_state_reinit_arming():
    """Pure state-machine semantics (live-demo.cpp:516-525): the first
    SPACE captures the background and unpauses; pausing arms
    tracker.reinit; 'b' recaptures; 'q'/ESC quit."""
    from avatar_tpu.tools.live_demo import LiveDemoState

    class StubTracker:
        reinit = False
        backgrounds = 0

        def set_background(self, xyz):
            self.backgrounds += 1

    tr = StubTracker()
    st = LiveDemoState(start_paused=True)
    st.handle_key(ord(" "), tr, None)       # unpause + capture
    assert (st.pause, st.bg_set, tr.backgrounds) == (False, True, 1)
    assert tr.reinit is False
    st.handle_key(ord(" "), tr, None)       # pause -> arms reinit
    assert st.pause is True and tr.reinit is True
    st.handle_key(ord("b"), tr, None)       # recapture (no new arm logic)
    assert tr.backgrounds == 2
    st.handle_key(ord(" "), tr, None)       # unpause again, bg NOT recaptured
    assert st.pause is False and tr.backgrounds == 2
    st.handle_key(ord("h"), tr, None)
    assert st.show_bbox is True
    st.handle_key(ord("t"), tr, None)
    assert st.rtree_only is True
    st.handle_key(ord("2"), tr, None)
    assert st.background_type == 2
    st.handle_key(27, tr, None)             # ESC
    assert st.quit is True


def test_rtree_run_dataset_interactive(tmp_path):
    """Scripted-key drive of rtree_run_dataset --interactive: the a/d/m/q
    frame-stepping loop of rtree-run-dataset.cpp:103-186.  Asserts the
    frame-position and mask-toggle state transitions frame by frame."""
    from avatar_tpu.tools import rtree_run_dataset, rtree_train, smplsynth

    out = str(tmp_path / "synth")
    smplsynth.main([out, "-n", "3", "--width", "96", "--height", "96",
                    "--fx", "85", "--fy", "85", "--cx", "48", "--cy", "48",
                    "--synthetic-model", "1", "--batch", "3"])
    tree_path = str(tmp_path / "t.srtr")
    rtree_train.main([tree_path, "--synthetic-model", "1", "--images", "6",
                      "--pixels", "100", "--features", "8", "--depth", "4",
                      "--min-samples", "20", "--probe", "40",
                      "--width", "96", "--height", "96", "--fx", "85",
                      "--fy", "85", "--cx", "48", "--cy", "48", "-q"])

    keys = iter([ord("d"), ord("d"), ord("a"), ord("m"), ord("m"),
                 ord("d"), ord("q")])
    seen = []
    rtree_run_dataset.main(
        [out, tree_path, "--interactive", "--start", "0", "-p", "8",
         "--out", str(tmp_path / "viz")],
        key_source=lambda: next(keys),
        on_frame=lambda fid, mask, img: seen.append((fid, mask)))
    # d,d -> frames 0,1,2; a -> 1; m shows frame 1's GT mask; m back to
    # seg; d -> 2; q exits after displaying it
    assert seen == [(0, False), (1, False), (2, False), (1, False),
                    (1, True), (1, False), (2, False)]
