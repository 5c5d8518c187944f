"""EPnP RANSAC and monocular two-view initializer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend.pnp import solve_pnp_ransac
from orb_line_slam_tpu.frontend.initializer import initialize_two_view
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics, project
from orb_line_slam_tpu.geometry.se3 import se3_apply, se3_exp

CAM = CameraIntrinsics(
    fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=90.0, width=640, height=480
)
RNG = np.random.default_rng(55)


class TestPnP:
    def _problem(self, n=100, outlier_frac=0.0, noise=0.0):
        pts = np.stack(
            [RNG.uniform(-5, 5, n), RNG.uniform(-3, 3, n), RNG.uniform(4, 25, n)], -1
        ).astype(np.float32)
        xi = jnp.asarray([0.3, -0.2, 0.5, 0.1, -0.05, 0.08], dtype=jnp.float32)
        R, t = se3_exp(xi)
        uv = np.array(project(CAM, se3_apply(R, t, jnp.asarray(pts))))
        if noise:
            uv += RNG.normal(0, noise, uv.shape)
        n_out = int(outlier_frac * n)
        if n_out:
            uv[:n_out] += RNG.uniform(30, 120, (n_out, 2))
        return pts, uv.astype(np.float32), np.asarray(R), np.asarray(t), n_out

    def test_clean(self):
        pts, uv, R_gt, t_gt, _ = self._problem()
        R, t, inl, cnt = solve_pnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts), bool),
            jax.random.PRNGKey(0), CAM, jnp.ones(len(pts)),
        )
        assert int(cnt) > 90
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-2)

    def test_outliers(self):
        pts, uv, R_gt, t_gt, n_out = self._problem(outlier_frac=0.3, noise=0.5)
        R, t, inl, cnt = solve_pnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts), bool),
            jax.random.PRNGKey(1), CAM, jnp.ones(len(pts)),
        )
        assert int(cnt) > 55
        assert np.asarray(inl)[:n_out].mean() < 0.2
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=2e-2)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=0.15)


class TestInitializer:
    def _two_view(self, planar=False, n=150):
        if planar:
            pts = np.stack(
                [RNG.uniform(-5, 5, n), RNG.uniform(-3, 3, n), np.full(n, 10.0)], -1
            ).astype(np.float32)
        else:
            pts = np.stack(
                [RNG.uniform(-5, 5, n), RNG.uniform(-3, 3, n), RNG.uniform(6, 25, n)],
                -1,
            ).astype(np.float32)
        R_gt, t_gt = se3_exp(jnp.asarray([0.4, 0.05, 0.1, 0.02, -0.06, 0.01]))
        p1 = np.asarray(project(CAM, jnp.asarray(pts)))
        p2 = np.asarray(project(CAM, se3_apply(R_gt, t_gt, jnp.asarray(pts))))
        ok = (
            (p1[:, 0] > 0) & (p1[:, 0] < 640) & (p1[:, 1] > 0) & (p1[:, 1] < 480)
            & (p2[:, 0] > 0) & (p2[:, 0] < 640) & (p2[:, 1] > 0) & (p2[:, 1] < 480)
        )
        return pts, p1, p2, ok, np.asarray(R_gt), np.asarray(t_gt)

    def _check(self, planar):
        pts, p1, p2, ok, R_gt, t_gt = self._two_view(planar)
        res = initialize_two_view(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(ok),
            jax.random.PRNGKey(3), CAM,
        )
        assert bool(res.success), "initialization failed"
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=2e-2)
        # translation up to scale
        t_est = np.asarray(res.t)
        t_dir = t_gt / np.linalg.norm(t_gt)
        cos = abs(np.dot(t_est, t_dir))
        assert cos > 0.995, f"translation direction off (cos={cos:.3f})"
        # triangulated structure correct up to scale
        inl = np.asarray(res.inliers)
        assert inl.sum() > 50
        s = np.median(pts[inl, 2] / np.asarray(res.points3d)[inl, 2])
        err = np.linalg.norm(np.asarray(res.points3d)[inl] * s - pts[inl], axis=1)
        assert np.median(err) < 0.2

    def test_general_scene_uses_fundamental(self):
        self._check(planar=False)

    def test_planar_scene(self):
        self._check(planar=True)
