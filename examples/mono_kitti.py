#!/usr/bin/env python
"""Monocular KITTI driver — the Examples/Monocular/mono_kitti.cc analog.

Usage:
  python examples/mono_kitti.py SETTINGS_YAML SEQUENCE_DIR \
      [--out KeyFrameTrajectory.txt] [--max-frames N]
"""

import argparse

from _common import run_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--vocab", default=None)
    args = ap.parse_args()

    from orb_line_slam_tpu.config import load_settings
    from orb_line_slam_tpu.data.kitti import KittiStereoSequence
    from orb_line_slam_tpu.pipeline.system import System

    cfg = load_settings(args.settings)
    seq = KittiStereoSequence(args.sequence)  # left camera only is used
    n = len(seq) if not args.max_frames else min(len(seq), args.max_frames)
    print(f"KITTI mono sequence: {n} frames")

    slam = System(cfg, vocabulary=args.vocab)

    def step(i):
        img, _, ts = seq[i]
        slam.track_monocular(img, ts)

    run_sequence(slam, n, step)
    slam.save_keyframe_trajectory_tum(args.out)
    print(f"keyframe trajectory written to {args.out}")


if __name__ == "__main__":
    main()
