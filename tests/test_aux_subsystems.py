"""Auxiliary subsystem tests: checkpoint round-trip, viewer artifacts,
trajectory I/O, YAML config parsing, multi-sequence front-end."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_line_slam_tpu.config import MapConfig, OrbConfig, SlamConfig, load_settings
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.slam_map.checkpoint import load_map, save_map
from orb_line_slam_tpu.slam_map.map_store import MapStore

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)


class _FakeFrame:
    def __init__(self, n, rng):
        self.xy = rng.uniform(0, 300, (n, 2)).astype(np.float32)
        self.u_right = rng.uniform(-1, 100, n).astype(np.float32)
        self.depth = rng.uniform(-1, 30, n).astype(np.float32)
        self.octave = rng.integers(0, 4, n).astype(np.int32)
        self.angle = rng.uniform(0, 6, n).astype(np.float32)
        self.desc = rng.integers(0, 256, (n, 32), dtype=np.uint8)
        self.valid = np.ones(n, bool)


def make_store():
    rng = np.random.default_rng(0)
    store = MapStore(MapConfig(max_keyframes=8, max_points=256, max_lines=16), 64,
                     n_lines=8)
    f = _FakeFrame(64, rng)
    kf = store.add_keyframe(f, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    ids = store.add_points(
        rng.normal(size=(20, 3)).astype(np.float32),
        rng.integers(0, 256, (20, 32), dtype=np.uint8),
        np.zeros(20, np.int32), kf, np.arange(20),
    )
    store.add_lines(
        rng.normal(size=(4, 3)).astype(np.float32),
        rng.normal(size=(4, 3)).astype(np.float32),
        rng.integers(0, 256, (4, 32), dtype=np.uint8), kf, np.arange(4),
    )
    return store


class TestCheckpoint:
    def test_roundtrip(self):
        store = make_store()
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "map.npz")
            save_map(store, p)
            loaded = load_map(p)
        np.testing.assert_array_equal(loaded.pt_pos, store.pt_pos)
        np.testing.assert_array_equal(loaded.kf_desc, store.kf_desc)
        np.testing.assert_array_equal(loaded.kf_obs_lm, store.kf_obs_lm)
        np.testing.assert_array_equal(loaded.ln_start, store.ln_start)
        assert loaded._next_kf == store._next_kf
        assert loaded._free_pts == store._free_pts
        # loaded store is functional: can add more landmarks
        ids = loaded.add_points(
            np.zeros((3, 3), np.float32),
            np.zeros((3, 32), np.uint8), np.zeros(3, np.int32), 0,
            np.arange(30, 33),
        )
        assert len(ids) == 3


class TestViewer:
    def test_artifacts(self):
        store = make_store()
        from orb_line_slam_tpu.eval.viewer import (
            draw_frame_overlay,
            save_map_figure,
            save_metrics_csv,
        )

        traj = [(0, 0.0, np.eye(3), np.zeros(3), False)]
        rng = np.random.default_rng(1)
        with tempfile.TemporaryDirectory() as d:
            fig = os.path.join(d, "map.png")
            save_map_figure(store, traj, fig)
            assert os.path.getsize(fig) > 5000
            f = _FakeFrame(64, rng)
            img = rng.integers(0, 255, (320, 640), dtype=np.uint8)
            ov = os.path.join(d, "overlay.png")
            draw_frame_overlay(img, f, np.full(64, -1), ov)
            assert os.path.getsize(ov) > 5000
            csvp = os.path.join(d, "metrics.csv")
            save_metrics_csv([{"frame": 0, "inliers": 12}], csvp)
            assert "inliers" in open(csvp).read()


class TestConfigYaml:
    def test_reference_format_yaml(self):
        """Parse a cv::FileStorage-style YAML like the reference ships."""
        yaml_text = """%YAML:1.0
Camera.fx: 718.856
Camera.fy: 718.856
Camera.cx: 607.1928
Camera.cy: 185.2157
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 1241
Camera.height: 376
Camera.fps: 10.0
Camera.bf: 386.1448
Camera.RGB: 1
ThDepth: 35
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "KITTI00-02.yaml")
            open(p, "w").write(yaml_text)
            cfg = load_settings(p)
        assert cfg.camera.fx == 718.856
        assert cfg.camera.bf == 386.1448
        assert cfg.orb.n_features == 2000
        assert cfg.orb.n_levels == 8
        assert cfg.tracking.th_depth == 35
        assert cfg.fps == 10.0

    def test_opencv_matrix_block(self):
        yaml_text = """%YAML:1.0
Camera.fx: 435.2
Camera.fy: 435.2
Camera.cx: 367.4
Camera.cy: 252.2
Camera.bf: 47.9
Camera.width: 752
Camera.height: 480
LEFT.height: 480
LEFT.width: 752
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0.0, 367.4, 0.0, 0.0, 435.2, 252.2, 0.0, 0.0, 0.0, 1.0, 0.0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0.0, 367.4, -47.9, 0.0, 435.2, 252.2, 0.0, 0.0, 0.0, 1.0, 0.0]
"""
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "EuRoC.yaml")
            open(p, "w").write(yaml_text)
            cfg = load_settings(p)
        assert cfg.rectify is not None
        assert cfg.rectify["LEFT"]["K"].shape == (3, 3)
        assert cfg.rectify["RIGHT"]["P"].shape == (3, 4)


class TestMultiSequence:
    def test_batched_frontend_over_mesh(self):
        from jax.sharding import Mesh

        from orb_line_slam_tpu.parallel.multi_sequence import make_batched_frontend

        n_dev = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        cfg = SlamConfig(camera=CAM, orb=OrbConfig(n_features=256, n_levels=3))
        rng = np.random.default_rng(2)
        imgs_l = jnp.asarray(rng.integers(0, 255, (n_dev, 320, 640), dtype=np.uint8))
        imgs_r = jnp.asarray(rng.integers(0, 255, (n_dev, 320, 640), dtype=np.uint8))
        fn = make_batched_frontend(mesh, cfg)
        frames = fn(imgs_l, imgs_r)
        assert frames.xy.shape == (n_dev, 256, 2)
        assert frames.valid.shape == (n_dev, 256)
        # each sequence got its own features (different images)
        assert not np.allclose(np.asarray(frames.xy[0]), np.asarray(frames.xy[1]))
