#!/usr/bin/env python
"""TUM RGB-D driver — the Examples/RGB-D/rgbd_tum.cc analog.

Usage:
  python examples/rgbd_tum.py SETTINGS_YAML SEQUENCE_DIR \
      [--out CameraTrajectory.txt] [--max-frames N] [--vocab ORBvoc.txt]

SETTINGS_YAML may be the reference's TUM1/2/3.yaml verbatim
(DepthMapFactor is honored).  rgb/depth pairs are associated by nearest
timestamp as upstream's associate.py does.
"""

import argparse

from _common import run_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--vocab", default=None)
    args = ap.parse_args()

    from orb_line_slam_tpu.config import load_settings
    from orb_line_slam_tpu.data.tum import TumRgbdSequence
    from orb_line_slam_tpu.pipeline.system import System

    cfg = load_settings(args.settings)
    seq = TumRgbdSequence(args.sequence, depth_map_factor=cfg.depth_map_factor)
    n = len(seq) if not args.max_frames else min(len(seq), args.max_frames)
    print(f"TUM RGB-D sequence: {n} associated rgb/depth pairs")

    slam = System(cfg, vocabulary=args.vocab)

    def step(i):
        img, depth, ts = seq[i]
        slam.track_rgbd(img, depth, ts)

    run_sequence(slam, n, step)
    slam.save_trajectory_tum(args.out)
    print(f"trajectory written to {args.out}")


if __name__ == "__main__":
    main()
