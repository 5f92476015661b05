"""Assemble two-person joint clips from raw 3D pose-estimator detections.

The reference's extraction stage (preprocess/README.md:17-33) runs its
Extract3Dpose submodule — a ROMP/BEV fork, absent from the checkout — whose
post-process step merges per-frame multi-person detections into two actor
tracks. This CLI is that step, estimator-agnostic: point any monocular 3D
pose estimator's output at it and it emits the (2, T, 22, 3) npy clips
that ``tools/preprocess.py`` converts into 263-d features.

Input: a directory of per-clip ``.npz`` files, each with
  frame_ids  (N,)   int  frame index of each detection
  joints     (N, J, 3)   world-frame SMPL-ordered joints, J >= 22
  num_frames ()     int  optional total video frame count (else inferred
                         as max(frame_ids)+1 — coverage checks need it
                         when detections stop before the video ends)
Output: ``<out_dir>/<clip>.npy`` of shape (2, T, 22, 3).

Chain: extract_pose.py → preprocess.py → train.py (stage 1-1).
"""

import argparse
import os
from os.path import join as pjoin

import _common  # noqa: F401

import numpy as np

from hig_tpu.data.pose_tracks import assemble_clip


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--detections_dir", type=str, required=True,
                        help="directory of per-clip npz detection files")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--smooth_sigma", type=float, default=1.0,
                        help="temporal gaussian smoothing (0 = off)")
    parser.add_argument("--min_coverage", type=float, default=0.5,
                        help="min fraction of frames each actor must be detected in")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(args.detections_dir) if f.endswith(".npz"))
    kept = dropped = 0
    for fname in files:
        data = np.load(pjoin(args.detections_dir, fname))
        try:
            nf = int(data["num_frames"]) if "num_frames" in data else None
            clip = assemble_clip(
                data["frame_ids"], data["joints"], num_frames=nf,
                smooth_sigma=args.smooth_sigma,
                min_coverage=args.min_coverage,
            )
        except ValueError as e:
            print(f"drop {fname}: {e}")
            dropped += 1
            continue
        np.save(pjoin(args.out_dir, fname[:-4] + ".npy"), clip)
        kept += 1
    print(f"assembled {kept} clips ({dropped} dropped) -> {args.out_dir}")


if __name__ == "__main__":
    main()
