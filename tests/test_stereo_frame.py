"""Stereo frame building on a rendered synthetic scene: depth accuracy
and frame-to-frame pose recovery through the full front-end."""

import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend import pose_optimize
from orb_line_slam_tpu.config import OrbConfig, SlamConfig
from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
from orb_line_slam_tpu.frontend.frame import build_stereo_frame
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics, backproject
from orb_line_slam_tpu.matching import search_by_projection
from orb_line_slam_tpu.geometry.se3 import se3_apply, se3_inverse

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=768, n_levels=4))


def test_stereo_depth_accuracy():
    scene = SyntheticScene(CAM, n_points=300, seed=3)
    R, t = np.eye(3), np.zeros(3)
    imL, imR = scene.render_stereo(R, t)
    frame = build_stereo_frame(jnp.asarray(imL), jnp.asarray(imR), CFG)
    depth = np.asarray(frame.depth)
    xy = np.asarray(frame.xy)
    ok = depth > 0
    assert ok.sum() > 80, f"only {ok.sum()} stereo matches"

    # Each billboard is fronto-parallel, so every pixel on it shares the
    # center's depth: associate each keypoint with the front-most
    # billboard covering it and compare depths in disparity space.
    cam_pts = scene.points  # world == camera at identity
    z = cam_pts[:, 2]
    u = CAM.fx * cam_pts[:, 0] / z + CAM.cx
    v = CAM.fy * cam_pts[:, 1] / z + CAM.cy
    s = CAM.fx * scene.world_size / z  # projected half-size
    derr = []
    for i in np.nonzero(ok)[0]:
        inside = (np.abs(u - xy[i, 0]) < s / 2 - 2) & (np.abs(v - xy[i, 1]) < s / 2 - 2)
        if not inside.any():
            continue
        j = np.nonzero(inside)[0][z[inside].argmin()]  # front-most
        derr.append(abs(CAM.bf / depth[i] - CAM.bf / z[j]))
    derr = np.array(derr)
    assert len(derr) > 40
    assert np.median(derr) < 0.6, f"median disparity error {np.median(derr):.2f} px"
    assert (derr < 1.5).mean() > 0.8


def test_two_frame_visual_odometry():
    """Front-end + matcher + pose opt must recover a known inter-frame
    motion from rendered images (the minimum end-to-end slice)."""
    scene = SyntheticScene(CAM, n_points=400, seed=5)
    poses = circular_trajectory(2, step=0.4)
    (R0, t0), (R1, t1) = poses

    f0 = build_stereo_frame(*map(jnp.asarray, scene.render_stereo(R0, t0)), CFG)
    f1 = build_stereo_frame(*map(jnp.asarray, scene.render_stereo(R1, t1)), CFG)

    # Landmarks from frame-0 stereo: backproject into world (pose known).
    depth0 = f0.depth
    pts_c0 = backproject(CAM, f0.xy, depth0)
    Rwc0, twc0 = se3_inverse(jnp.asarray(R0), jnp.asarray(t0))
    pts_w = se3_apply(Rwc0, twc0, pts_c0)
    lm_valid = f0.has_depth

    # Match landmarks into frame 1 with the frame-0 pose as the guess.
    m = search_by_projection(
        pts_w, f0.desc, lm_valid, f0.octave,
        jnp.asarray(R0), jnp.asarray(t0),
        f1, CAM, CFG.orb.level_scales, radius=20.0, ratio=0.9,
    )
    n_matches = int(m.mask.sum())
    assert n_matches > 60, f"only {n_matches} projection matches"

    obs = jnp.stack(
        [
            f1.xy[m.idx, 0],
            f1.xy[m.idx, 1],
            f1.u_right[m.idx],
        ],
        axis=-1,
    )
    res = pose_optimize(
        jnp.asarray(R0.astype(np.float32)), jnp.asarray(t0.astype(np.float32)),
        pts_w, obs, f1.octave[m.idx], m.mask, CAM,
    )
    assert int(res.n_inliers) > 40
    t_err = np.linalg.norm(np.asarray(res.t) - t1)
    R_err = np.rad2deg(
        np.arccos(np.clip((np.trace(np.asarray(res.R).T @ R1) - 1) / 2, -1, 1))
    )
    assert t_err < 0.05, f"translation error {t_err:.3f} m"
    assert R_err < 0.5, f"rotation error {R_err:.3f} deg"
