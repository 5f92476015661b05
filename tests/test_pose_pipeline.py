"""Pose-extraction adapter: detections → two-person clips → 263-d features.

Covers the reconstruction of the reference's absent Extract3Dpose
post-process (reference preprocess/README.md:17-33): two-track association
from shuffled multi-person detections, gap interpolation, SMPL-24 joint
subsetting, and the full extract_pose.py → preprocess.py chain that makes
stage 1-1 training one command away from any 3D pose estimator's output.
"""

import os
import runpy
import sys

import numpy as np
import pytest

from hig_tpu.data.pose_tracks import assemble_clip, associate_two_tracks, fill_gaps

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "geometry.npz")


def run_tool(name, argv):
    sys.path.insert(0, TOOLS)
    old = sys.argv
    sys.argv = [name + ".py"] + argv
    try:
        runpy.run_path(os.path.join(TOOLS, name + ".py"), run_name="__main__")
    finally:
        sys.argv = old
        sys.path.remove(TOOLS)


def two_actor_motion():
    """Ground-truth (2, T, 22, 3) from the golden skeleton motion: actor 0
    in place, actor 1 the same motion offset 1.5 m away and drifting."""
    base = np.load(GOLDEN)["joints"]  # (48, 22, 3)
    T = base.shape[0]
    drift = np.linspace(0, 0.4, T)[:, None]
    a = base
    b = base + np.concatenate(
        [1.5 + drift, np.zeros((T, 1)), 0.3 - drift], axis=1
    )[:, None, :]
    return np.stack([a, b]).astype(np.float32)


class TestPoseTracks:
    def test_association_recovers_shuffled_tracks(self):
        gt = two_actor_motion()
        T = gt.shape[1]
        rng = np.random.RandomState(0)
        frame_ids, dets = [], []
        dropped_b = {10, 11, 25}
        for t in range(T):
            order = [0, 1] if rng.rand() < 0.5 else [1, 0]
            for k in order:
                if k == 1 and t in dropped_b:
                    continue
                frame_ids.append(t)
                dets.append(gt[k, t])
            if t == 30:  # spurious far-away detection
                frame_ids.append(t)
                dets.append(gt[0, t] + np.array([10.0, 0, 10.0], np.float32))
        tracks, observed = associate_two_tracks(
            np.array(frame_ids), np.stack(dets), num_frames=T
        )
        # the track<->actor identity depends on the detection order in the
        # first frame; what matters is that it stays CONSISTENT throughout
        ka = 0 if np.allclose(tracks[0, 0], gt[0, 0]) else 1
        kb = 1 - ka
        assert observed[ka].all()
        assert set(np.flatnonzero(~observed[kb])) == dropped_b
        np.testing.assert_allclose(tracks[ka], gt[0], atol=1e-6)
        mask = observed[kb]
        np.testing.assert_allclose(tracks[kb][mask], gt[1][mask], atol=1e-6)

    def test_gap_fill_is_linear_interpolation(self):
        tracks = np.zeros((2, 5, 22, 3), np.float32)
        observed = np.zeros((2, 5), bool)
        tracks[0, 0], tracks[0, 4] = 1.0, 5.0
        observed[0, 0] = observed[0, 4] = True
        observed[1, :] = True
        filled = fill_gaps(tracks, observed)
        np.testing.assert_allclose(filled[0, 2], 3.0)
        np.testing.assert_allclose(filled[0, 1], 2.0)

    def test_smpl24_extra_joints_dropped(self):
        gt = two_actor_motion()
        T = gt.shape[1]
        pad = np.zeros((T, 2, 3), np.float32)  # two extra SMPL rows (hands)
        frame_ids = np.repeat(np.arange(T), 2)
        dets = np.concatenate(
            [np.stack([gt[0], gt[1]], axis=1).reshape(2 * T, 22, 3),
             np.repeat(pad, 2, axis=0).reshape(2 * T, 2, 3)], axis=1
        )
        clip = assemble_clip(frame_ids, dets, num_frames=T)
        assert clip.shape == (2, T, 22, 3)
        np.testing.assert_allclose(clip[0], gt[0], atol=1e-6)

    def test_low_coverage_rejected(self):
        gt = two_actor_motion()
        frame_ids = np.array([0, 0, 1])  # actor 1 seen once over 48 frames
        dets = np.stack([gt[0, 0], gt[1, 0], gt[0, 1]])
        with pytest.raises(ValueError, match="coverage"):
            assemble_clip(frame_ids, dets, num_frames=gt.shape[1])


class TestExtractPoseChain:
    def test_detections_to_features(self, tmp_path):
        """extract_pose.py → preprocess.py: raw detections end as (2, *, 263)
        feature clips with dataset Mean/Std — the full replacement for the
        reference's two absent preprocessing submodules."""
        gt = two_actor_motion()
        T = gt.shape[1]
        det_dir = tmp_path / "dets"
        det_dir.mkdir()
        rng = np.random.RandomState(1)
        for name in ("clipA", "clipB"):
            frame_ids, dets = [], []
            for t in range(T):
                for k in (rng.permutation(2)):
                    frame_ids.append(t)
                    dets.append(gt[k, t])
            np.savez(det_dir / f"{name}.npz",
                     frame_ids=np.array(frame_ids), joints=np.stack(dets))
        # a clip with one actor barely detected: must be dropped, not crash
        np.savez(det_dir / "bad.npz",
                 frame_ids=np.array([0, 0]),
                 joints=np.stack([gt[0, 0], gt[1, 0]]), num_frames=T)

        joints_dir = tmp_path / "joints"
        run_tool("extract_pose", [
            "--detections_dir", str(det_dir), "--out_dir", str(joints_dir),
            "--smooth_sigma", "0",
        ])
        files = sorted(os.listdir(joints_dir))
        assert files == ["clipA.npy", "clipB.npy"]
        clip = np.load(joints_dir / "clipA.npy")
        assert clip.shape == (2, T, 22, 3)
        if not np.allclose(clip[0, 0], gt[0, 0]):
            clip = clip[::-1]  # track identity follows first-frame order
        np.testing.assert_allclose(clip, gt, atol=1e-6)

        out_root = tmp_path / "feat"
        run_tool("preprocess", [
            "--joints_dir", str(joints_dir), "--out_root", str(out_root),
        ])
        feats = sorted(os.listdir(out_root / "new_joint_vecs"))
        assert feats == ["clipA.npy", "clipB.npy"]
        f = np.load(out_root / "new_joint_vecs" / "clipA.npy")
        assert f.ndim == 3 and f.shape[0] == 2 and f.shape[2] == 263
        assert np.isfinite(f).all()
        assert os.path.exists(out_root / "Mean.npy")
        assert os.path.exists(out_root / "Std.npy")
