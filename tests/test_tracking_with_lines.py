"""Point+line tracking integration: map lines get created from stereo and
contribute to pose optimization without degrading ATE."""

import numpy as np
import pytest

from orb_line_slam_tpu.config import LineConfig, MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.pipeline.tracking import Tracker

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=768, n_levels=4),
    lines=LineConfig(enabled=True, n_lines=64),
    map=MapConfig(max_keyframes=64, max_points=8192, max_lines=512,
                  local_window=8, local_points=2048),
)


@pytest.mark.slow
def test_point_line_tracking():
    n_frames = 12
    scene = SyntheticScene(
        CAM, n_points=500, n_lines=40, seed=9, extent=((-14, 14), (-6, 6), (6, 60))
    )
    poses = circular_trajectory(n_frames, step=0.3)
    tracker = Tracker(CFG)
    for i, (R, t) in enumerate(poses):
        imL, imR = scene.render_stereo(R, t)
        tracker.process_stereo(imL, imR, timestamp=i * 0.1)

    assert tracker.state == "OK"
    errs = []
    for e, (Rg, tg) in zip(tracker.final_trajectory(), poses):
        _, _, R_cw, t_cw, lost = e
        assert not lost
        errs.append(np.linalg.norm(-R_cw.T @ t_cw - (-Rg.T @ tg)))
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.15, f"ATE {ate:.3f} m"
    # Line landmarks exist in the map.
    assert tracker.map.ln_valid.sum() >= 5, (
        f"only {tracker.map.ln_valid.sum()} map lines"
    )
