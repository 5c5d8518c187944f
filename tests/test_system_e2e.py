"""System-level end-to-end tests: full pipeline with loop closing on a
rendered out-and-back sequence, and the KITTI example driver."""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from orb_line_slam_tpu.config import LineConfig, MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.data.synthetic import SyntheticScene
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.pipeline.system import System

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=768, n_levels=4),
    lines=LineConfig(enabled=False),
    map=MapConfig(max_keyframes=96, max_points=16384, max_lines=64,
                  local_window=8, local_points=2048),
)


def out_and_back_poses(n_out=12, step=0.4):
    """Drive forward, then return to start (same orientation): the
    return frames revisit the first views -> loop-closure material."""
    poses = []
    for i in range(n_out):
        poses.append((np.eye(3), -np.array([0.0, 0.0, step * i])))
    for i in range(n_out - 2, -1, -1):
        poses.append((np.eye(3), -np.array([0.0, 0.0, step * i])))
    return poses


@pytest.mark.slow
def test_full_system_out_and_back():
    """Out-and-back through the FULL System (vocab trained on the fly,
    loop module active).  A well-tracked return re-attaches to the old
    map via covisibility, so no loop closure is *needed* — the pass
    criterion is trajectory quality and a near-zero return error.
    (Loop CORRECTION under forced drift is covered by
    tests/test_loop_closing.py.)"""
    scene = SyntheticScene(CAM, n_points=700, seed=21,
                           extent=((-14, 14), (-6, 6), (8, 60)))
    poses = out_and_back_poses(n_out=10, step=0.4)
    slam = System(CFG, use_loop_closing=True)
    for i, (R, t) in enumerate(poses):
        imL, imR = scene.render_stereo(R, t)
        slam.track_stereo(imL, imR, timestamp=i * 0.1)

    assert slam.tracking_state() == "OK"
    traj = slam.tracker.final_trajectory()
    errs = [
        np.linalg.norm(-Rc.T @ tc - (-Rg.T @ tg))
        for (_, _, Rc, tc, lost), (Rg, tg) in zip(traj, poses)
        if not lost
    ]
    assert len(errs) >= len(poses) - 2
    ate = float(np.sqrt(np.mean(np.square(errs))))
    path_len = 0.4 * (len(poses) - 1)
    assert ate < 0.04 * path_len, f"ATE {ate:.3f} m over {path_len:.1f} m"
    # The final pose must be near the start (we returned home).
    end_err = errs[-1]
    assert end_err < 0.3, f"end-of-loop error {end_err:.2f} m"

    # Trajectory writers produce parseable output.
    with tempfile.TemporaryDirectory() as d:
        kitti = os.path.join(d, "kitti.txt")
        tum = os.path.join(d, "tum.txt")
        slam.save_trajectory_kitti(kitti)
        slam.save_trajectory_tum(tum)
        rows = np.loadtxt(kitti)
        assert rows.shape == (len(poses), 12)
        rows_tum = np.loadtxt(tum)
        assert rows_tum.shape == (len(poses), 8)
        q_norms = np.linalg.norm(rows_tum[:, 4:], axis=1)
        np.testing.assert_allclose(q_norms, 1.0, atol=1e-5)


@pytest.mark.slow
def test_kitti_example_driver():
    """Write a KITTI-format sequence dir + YAML and run the CLI driver."""
    import cv2

    scene = SyntheticScene(CAM, n_points=600, seed=4,
                           extent=((-14, 14), (-6, 6), (6, 60)))
    with tempfile.TemporaryDirectory() as d:
        seq = Path(d) / "00"
        (seq / "image_0").mkdir(parents=True)
        (seq / "image_1").mkdir(parents=True)
        times = []
        for i in range(4):
            R = np.eye(3)
            t = -np.array([0.0, 0.0, 0.3 * i])
            imL, imR = scene.render_stereo(R, t)
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), imL)
            cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), imR)
            times.append(i * 0.1)
        (seq / "times.txt").write_text("\n".join(f"{t:.6f}" for t in times))

        yaml_path = Path(d) / "settings.yaml"
        yaml_path.write_text(
            """%YAML:1.0
Camera.fx: 400.0
Camera.fy: 400.0
Camera.cx: 320.0
Camera.cy: 160.0
Camera.bf: 160.0
Camera.width: 640
Camera.height: 320
Camera.fps: 10.0
ThDepth: 35
ORBextractor.nFeatures: 512
ORBextractor.nLevels: 3
ORBextractor.scaleFactor: 1.2
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
        )
        out = Path(d) / "traj.txt"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [
                sys.executable,
                str(Path(__file__).resolve().parents[1] / "examples" / "stereo_kitti.py"),
                str(yaml_path), str(seq), "--out", str(out), "--no-loop",
            ],
            capture_output=True, text=True, timeout=500, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rows = np.loadtxt(out)
        assert rows.shape == (4, 12)
        # forward motion recovered: z increases
        assert rows[-1, 11] > 0.5, f"final z {rows[-1, 11]}"
