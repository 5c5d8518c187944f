#!/usr/bin/env python
"""Monocular EuRoC driver — the Examples/Monocular/mono_euroc.cc analog.

Usage:
  python examples/mono_euroc.py SETTINGS_YAML MAV0_DIR \
      [--out KeyFrameTrajectory.txt] [--max-frames N]

When the settings carry LEFT.* rectification blocks (the reference's
EuRoC.yaml), cam0 frames are rectified with the left map before
tracking, as mono_euroc.cc does.
"""

import argparse

from _common import run_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("mav0")
    ap.add_argument("--out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--vocab", default=None)
    args = ap.parse_args()

    from orb_line_slam_tpu.config import load_settings
    from orb_line_slam_tpu.data.euroc import EurocStereoSequence
    from orb_line_slam_tpu.pipeline.system import System

    cfg = load_settings(args.settings)
    seq = EurocStereoSequence(args.mav0, rectify=cfg.rectify)
    n = len(seq) if not args.max_frames else min(len(seq), args.max_frames)
    print(f"EuRoC mono sequence: {n} frames (cam0)")

    slam = System(cfg, vocabulary=args.vocab)

    def step(i):
        img, _, ts = seq[i]
        slam.track_monocular(img, ts)

    run_sequence(slam, n, step)
    slam.save_keyframe_trajectory_tum(args.out)
    print(f"keyframe trajectory written to {args.out}")


if __name__ == "__main__":
    main()
