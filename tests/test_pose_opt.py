"""Pose optimization tests: Jacobians vs finite differences, convergence
from a perturbed pose, outlier rejection, line residuals."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend import (
    line_obs_coeffs,
    make_line_residual_fn,
    make_point_residual_fn,
    pose_jacobian,
    pose_optimize,
)
from orb_line_slam_tpu.geometry import se3_apply, se3_exp, so3_exp
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics, project_stereo

CAM = CameraIntrinsics(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0, width=640, height=480
)
RNG = np.random.default_rng(11)


def make_scene(m=200, seed=5):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-5, 5, m),
            rng.uniform(-3, 3, m),
            rng.uniform(4, 30, m),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(pts)


class TestJacobians:
    def test_point_jacobian_fd(self):
        pts = make_scene(16)
        R, t = se3_exp(jnp.asarray(RNG.normal(size=6).astype(np.float32) * 0.1))
        obs = project_stereo(CAM, se3_apply(R, t, pts))
        fn = make_point_residual_fn(CAM)
        stereo = jnp.ones(16, bool)
        r, J = pose_jacobian(fn, R, t, pts, obs, stereo)
        from orb_line_slam_tpu.geometry import se3_compose

        eps = 1e-2
        for k in range(6):
            xi = np.zeros(6, np.float32)
            xi[k] = eps
            dRp, dtp = se3_exp(jnp.asarray(xi))
            Rp, tp = se3_compose(dRp, dtp, R, t)
            dRm, dtm = se3_exp(jnp.asarray(-xi))
            Rm, tm = se3_compose(dRm, dtm, R, t)
            fd = (np.asarray(fn(Rp, tp, pts, obs, stereo)) - np.asarray(fn(Rm, tm, pts, obs, stereo))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J)[..., k], fd, atol=0.3, rtol=3e-2)

    def test_line_jacobian_fd(self):
        rng = np.random.default_rng(2)
        ls = jnp.asarray(rng.uniform(-2, 2, (8, 3)).astype(np.float32) + [0, 0, 8])
        le = ls + jnp.asarray(rng.uniform(0.5, 2, (8, 3)).astype(np.float32))
        R, t = se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.05))
        from orb_line_slam_tpu.geometry.camera import project

        obs = line_obs_coeffs(
            project(CAM, se3_apply(R, t, ls)), project(CAM, se3_apply(R, t, le))
        )
        fn = make_line_residual_fn(CAM)
        r, J = pose_jacobian(fn, R, t, ls, le, obs)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)
        from orb_line_slam_tpu.geometry import se3_compose

        eps = 1e-2
        for k in range(6):
            xi = np.zeros(6, np.float32)
            xi[k] = eps
            dRp, dtp = se3_exp(jnp.asarray(xi))
            Rp, tp = se3_compose(dRp, dtp, R, t)
            dRm, dtm = se3_exp(jnp.asarray(-xi))
            Rm, tm = se3_compose(dRm, dtm, R, t)
            fd = (np.asarray(fn(Rp, tp, ls, le, obs)) - np.asarray(fn(Rm, tm, ls, le, obs))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J)[..., k], fd, atol=0.3, rtol=3e-2)


class TestPoseOptimize:
    def _run(self, noise=0.0, outlier_frac=0.0, stereo=True):
        pts = make_scene(300)
        xi_true = jnp.asarray([0.2, -0.1, 0.3, 0.02, -0.03, 0.01], dtype=jnp.float32)
        R_true, t_true = se3_exp(xi_true)
        obs = project_stereo(CAM, se3_apply(R_true, t_true, pts))
        obs = np.array(obs)
        if not stereo:
            obs[:, 2] = -1.0
        rng = np.random.default_rng(9)
        if noise:
            obs[:, :2] += rng.normal(0, noise, obs[:, :2].shape)
        n_out = int(outlier_frac * len(obs))
        if n_out:
            obs[:n_out, :2] += rng.uniform(20, 80, (n_out, 2))
        valid = jnp.ones(len(pts), bool)
        # Start from a perturbed pose.
        xi0 = xi_true + jnp.asarray([0.1, 0.05, -0.08, 0.01, 0.02, -0.01])
        R0, t0 = se3_exp(xi0)
        res = pose_optimize(
            R0, t0, pts, jnp.asarray(obs), jnp.zeros(len(pts), jnp.int32), valid, CAM
        )
        return res, R_true, t_true, n_out

    def test_converges_clean(self):
        res, R_true, t_true, _ = self._run()
        np.testing.assert_allclose(res.R, R_true, atol=1e-4)
        np.testing.assert_allclose(res.t, t_true, atol=1e-3)
        assert int(res.n_inliers) == 300

    def test_converges_mono(self):
        res, R_true, t_true, _ = self._run(stereo=False)
        np.testing.assert_allclose(res.R, R_true, atol=1e-3)
        np.testing.assert_allclose(res.t, t_true, atol=5e-3)

    def test_rejects_outliers(self):
        res, R_true, t_true, n_out = self._run(noise=0.3, outlier_frac=0.2)
        np.testing.assert_allclose(res.R, R_true, atol=5e-3)
        np.testing.assert_allclose(res.t, t_true, atol=5e-2)
        # Outliers must be gated out.
        assert int(res.inliers[:n_out].sum()) < n_out * 0.2
        assert int(res.n_inliers) > 200

    def test_lines_contribute(self):
        """With only 2 points + lines, pose is still recoverable."""
        rng = np.random.default_rng(4)
        ls = jnp.asarray(rng.uniform(-3, 3, (40, 3)).astype(np.float32) + [0, 0, 10])
        le = ls + jnp.asarray(rng.uniform(-2, 2, (40, 3)).astype(np.float32))
        xi_true = jnp.asarray([0.1, -0.05, 0.15, 0.01, -0.02, 0.015], dtype=jnp.float32)
        R_true, t_true = se3_exp(xi_true)
        from orb_line_slam_tpu.geometry.camera import project

        lobs = line_obs_coeffs(
            project(CAM, se3_apply(R_true, t_true, ls)),
            project(CAM, se3_apply(R_true, t_true, le)),
        )
        pts = make_scene(8)
        obs = project_stereo(CAM, se3_apply(R_true, t_true, pts))
        R0, t0 = se3_exp(xi_true * 0.5)
        res = pose_optimize(
            R0,
            t0,
            pts,
            obs,
            jnp.zeros(8, jnp.int32),
            jnp.ones(8, bool),
            CAM,
            line_start_w=ls,
            line_end_w=le,
            line_obs=lobs,
            line_octave=jnp.zeros(40, jnp.int32),
            line_valid=jnp.ones(40, bool),
        )
        np.testing.assert_allclose(res.R, R_true, atol=1e-3)
        np.testing.assert_allclose(res.t, t_true, atol=1e-2)
        assert int(res.line_inliers.sum()) > 30
