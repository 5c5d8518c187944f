"""Full-pipeline integration: track a rendered synthetic stereo sequence
and assert near-zero ATE (SURVEY.md §4 synthetic-scene strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_line_slam_tpu.config import MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
from orb_line_slam_tpu.eval.trajectory import ate_rmse
from orb_line_slam_tpu.pipeline.tracking import Tracker
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=768, n_levels=4),
    map=MapConfig(max_keyframes=64, max_points=8192, max_lines=256,
                  local_window=8, local_points=2048),
)


@pytest.mark.slow
def test_synthetic_sequence_ate():
    n_frames = 20
    scene = SyntheticScene(CAM, n_points=600, seed=8,
                           extent=((-14, 14), (-6, 6), (6, 60)))
    poses = circular_trajectory(n_frames, step=0.35)
    tracker = Tracker(CFG)
    for i, (R, t) in enumerate(poses):
        imL, imR = scene.render_stereo(R, t)
        tracker.process_stereo(imL, imR, timestamp=i * 0.1)

    assert tracker.state == "OK"
    traj = tracker.final_trajectory()
    assert len(traj) == n_frames
    lost = sum(1 for e in traj if e[4])
    assert lost == 0, f"{lost} frames lost"

    # Camera centers: est vs ground truth.
    est = []
    gt = []
    for (fid, ts, R_cw, t_cw, _), (Rg, tg) in zip(traj, poses):
        est.append(-R_cw.T @ t_cw)
        gt.append(-Rg.T @ tg)
    ate = ate_rmse(np.array(est), np.array(gt), align=False)
    total_len = 0.35 * (n_frames - 1)
    assert ate < 0.05 * total_len, f"ATE {ate:.3f} m over {total_len:.1f} m"
    # Keyframes were created and the map grew.
    assert tracker.map.n_keyframes() >= 2
    assert tracker.map.pt_valid.sum() > 300
