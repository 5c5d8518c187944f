"""Monocular pipeline: initialization from two views + tracking a short
rendered sequence (scale-free ATE via Umeyama with scale)."""

import numpy as np
import pytest

from orb_line_slam_tpu.config import LineConfig, MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
from orb_line_slam_tpu.eval.trajectory import ate_rmse
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.pipeline.tracking import Tracker

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=1280, n_levels=4),
    lines=LineConfig(enabled=False),
    map=MapConfig(max_keyframes=64, max_points=8192, max_lines=64,
                  local_window=8, local_points=2048),
)


@pytest.mark.slow
def test_mono_sequence():
    """Short monocular run: init must wait for parallax, then track with
    small similarity-aligned ATE.  (Long-run mono robustness — map
    growth under pure rotation/scale drift — is tracked as future work;
    the reference's benchmarks are stereo.)"""
    n_frames = 10
    scene = SyntheticScene(CAM, n_points=1000, seed=12,
                           extent=((-10, 10), (-5, 5), (4, 25)))
    # Sideways-dominant motion gives parallax for mono init.
    poses = []
    for i in range(n_frames):
        R = np.eye(3)
        t = -np.array([0.2 * i, 0.0, 0.08 * i])  # t_cw = -R^T twc, R=I
        poses.append((R, t))

    tracker = Tracker(CFG)
    for i, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        tracker.process_mono(img, timestamp=i * 0.1)

    traj = tracker.final_trajectory()
    tracked = [
        (e, p) for e, p in zip(traj, poses) if not e[4]
    ]
    assert len(tracked) >= 4, "too few tracked frames"
    est = np.array([-e[2].T @ e[3] for e, _ in tracked])
    gt = np.array([-R.T @ t for _, (R, t) in tracked])
    # Mono is scale-free: align with similarity.
    ate = ate_rmse(est, gt, align=True, with_scale=True)
    assert ate < 0.08, f"mono ATE {ate:.3f} m"  # mono: sim-aligned, ~3% drift tolerance
    assert tracker.map.pt_valid.sum() > 80
