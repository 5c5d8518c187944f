"""Dataset loaders (TUM association, DepthMapFactor) + the shipped
per-dataset YAML configs + the RGB-D/mono example drivers.

Parity targets: Examples/RGB-D/rgbd_tum.cc, Examples/Monocular/
mono_tum.cc and the reference's per-dataset settings files
(SURVEY.md §2.1 row 22, §5 config table).
"""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from orb_line_slam_tpu.config import (
    LineConfig, MapConfig, OrbConfig, SlamConfig, load_settings,
)
from orb_line_slam_tpu.data.synthetic import SyntheticScene
from orb_line_slam_tpu.data.tum import TumRgbdSequence, associate
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

REPO = Path(__file__).resolve().parents[1]

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=768, n_levels=4),
    lines=LineConfig(enabled=False),
    map=MapConfig(max_keyframes=64, max_points=8192, max_lines=64,
                  local_window=8, local_points=2048),
)


# ---------------------------------------------------------------------
def test_associate_nearest_timestamp():
    a = np.array([0.0, 0.1, 0.2, 0.3])
    b = np.array([0.005, 0.11, 0.35, 0.50])
    pairs = associate(a, b, max_offset=0.02)
    assert (0, 0) in pairs and (1, 1) in pairs
    # 0.3 vs 0.35 exceeds the offset; 0.2 has no partner at all.
    assert all(i not in (2, 3) for i, _ in pairs)


def _write_tum_sequence(d: Path, frames, factor=5000.0):
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir(parents=True)
    import cv2

    rgb_lines = ["# rgb"]
    depth_lines = ["# depth"]
    for i, (img, depth, ts) in enumerate(frames):
        rgb_name = f"rgb/{ts:.6f}.png"
        # Depth stamps slightly offset, as the real sensor's are.
        dts = ts + 0.004
        d_name = f"depth/{dts:.6f}.png"
        cv2.imwrite(str(d / rgb_name), img)
        cv2.imwrite(str(d / d_name), (depth * factor).astype(np.uint16))
        rgb_lines.append(f"{ts:.6f} {rgb_name}")
        depth_lines.append(f"{dts:.6f} {d_name}")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(depth_lines))


def test_tum_rgbd_loader_roundtrip():
    # Keep depths < 13.1 m: uint16 @ factor 5000 saturates there (the
    # real sensor's range is ~5 m).
    scene = SyntheticScene(CAM, n_points=200, seed=3,
                           extent=((-6, 6), (-3, 3), (2, 12)))
    img, depth = scene.render_rgbd(np.eye(3), np.zeros(3))
    with tempfile.TemporaryDirectory() as d:
        _write_tum_sequence(Path(d), [(img, depth, 100.0), (img, depth, 100.05)])
        seq = TumRgbdSequence(d, depth_map_factor=5000.0)
        assert len(seq) == 2
        im2, dp2, ts = seq[0]
        assert ts == pytest.approx(100.0)
        np.testing.assert_array_equal(im2, img)
        # uint16 quantization: 1/5000 m steps.
        assert np.abs(dp2 - depth).max() < 1e-3


# ---------------------------------------------------------------------
def test_shipped_configs_parse():
    cfgs = sorted((REPO / "examples" / "configs").glob("*.yaml"))
    assert len(cfgs) >= 7
    for path in cfgs:
        cfg = load_settings(path)
        assert cfg.camera.fx > 100.0, path.name
        assert cfg.orb.n_features >= 512, path.name
    euroc = load_settings(REPO / "examples" / "configs" / "EuRoC.yaml")
    assert euroc.rectify is not None
    assert euroc.rectify["LEFT"]["K"].shape == (3, 3)
    assert euroc.rectify["RIGHT"]["P"].shape == (3, 4)
    tum1 = load_settings(REPO / "examples" / "configs" / "TUM1.yaml")
    assert tum1.depth_map_factor == pytest.approx(5000.0)
    assert tum1.camera.k1 == pytest.approx(0.262383)


# ---------------------------------------------------------------------
@pytest.mark.slow
def test_rgbd_tracking_synthetic():
    """RGB-D tracking end-to-end on rendered frames with a real depth
    channel (Frame::ComputeStereoFromRGBD analog)."""
    from orb_line_slam_tpu.pipeline.system import System

    scene = SyntheticScene(CAM, n_points=600, seed=11,
                           extent=((-14, 14), (-6, 6), (6, 60)))
    slam = System(CFG, use_loop_closing=False)
    poses = [(np.eye(3), -np.array([0.0, 0.0, 0.3 * i])) for i in range(6)]
    for i, (R, t) in enumerate(poses):
        img, depth = scene.render_rgbd(R, t)
        slam.track_rgbd(img, depth, timestamp=i * 0.1)
    assert slam.tracking_state() == "OK"
    traj = slam.tracker.final_trajectory()
    errs = [
        np.linalg.norm(-Rc.T @ tc - (-Rg.T @ tg))
        for (_, _, Rc, tc, lost), (Rg, tg) in zip(traj, poses)
        if not lost
    ]
    assert len(errs) >= 5
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.1


@pytest.mark.slow
def test_rgbd_tum_example_driver():
    """Synthesize a TUM-format sequence dir and run the CLI driver."""
    # z < 13.1 m so uint16 depth @ factor 5000 doesn't saturate.
    scene = SyntheticScene(CAM, n_points=600, seed=12,
                           extent=((-8, 8), (-4, 4), (5, 12)))
    with tempfile.TemporaryDirectory() as d:
        seq = Path(d) / "fr1_synth"
        frames = []
        for i in range(4):
            img, depth = scene.render_rgbd(
                np.eye(3), -np.array([0.0, 0.0, 0.3 * i])
            )
            frames.append((img, depth, 10.0 + 0.1 * i))
        _write_tum_sequence(seq, frames)
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
DepthMapFactor: 5000.0
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
                str(REPO / "examples" / "rgbd_tum.py"),
                str(yaml_path), str(seq), "--out", str(out), "--max-frames", "4",
            ],
            capture_output=True, text=True, timeout=500, env=env,
            cwd=str(REPO / "examples"),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rows = np.loadtxt(out)
        assert rows.shape == (4, 8)
        # forward motion recovered: z increases (TUM stores twc).
        assert rows[-1, 3] > 0.5, f"final z {rows[-1, 3]}"
