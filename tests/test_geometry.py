"""Geometry unit tests: SE3/Sim3 round-trips, quaternions, camera model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_line_slam_tpu.geometry import (
    CameraIntrinsics,
    backproject,
    distort,
    in_image,
    project,
    project_stereo,
    quat_from_rotmat,
    rotmat_from_quat,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_log,
    se3_retract,
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
    so3_exp,
    so3_log,
    undistort_points,
)

RNG = np.random.default_rng(0)


def rand_xi(n, scale=1.0):
    return jnp.asarray(RNG.normal(size=(n, 6)).astype(np.float32) * scale)


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = jnp.asarray(RNG.normal(size=(64, 3)).astype(np.float32))
        R = so3_exp(phi)
        # R is orthonormal with det 1
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
        phi2 = so3_log(R)
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_small_angle(self):
        phi = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], dtype=jnp.float32)
        R = so3_exp(phi)
        np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(so3_log(R))))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rand_xi(64, 0.7)
        R, t = se3_exp(xi)
        xi2 = se3_log(R, t)
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_compose_inverse(self):
        xi = rand_xi(8)
        R, t = se3_exp(xi)
        Ri, ti = se3_inverse(R, t)
        Rc, tc = se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros((8, 3)), atol=1e-5)

    def test_retract_zero(self):
        R, t = se3_exp(rand_xi(4))
        R2, t2 = se3_retract(R, t, jnp.zeros((4, 6)))
        np.testing.assert_allclose(R2, R, atol=1e-6)
        np.testing.assert_allclose(t2, t, atol=1e-6)

    def test_apply_matches_matrix(self):
        xi = rand_xi(4)
        R, t = se3_exp(xi)
        x = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
        y = se3_apply(R, t, x)
        y_ref = np.einsum("nij,nj->ni", np.asarray(R), np.asarray(x)) + np.asarray(t)
        np.testing.assert_allclose(y, y_ref, atol=1e-5)


class TestQuat:
    def test_roundtrip(self):
        phi = jnp.asarray(RNG.normal(size=(128, 3)).astype(np.float32) * 2.0)
        R = so3_exp(phi)
        q = quat_from_rotmat(R)
        R2 = rotmat_from_quat(q)
        np.testing.assert_allclose(R2, R, atol=1e-4)

    def test_unit_norm(self):
        R = so3_exp(jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32)))
        q = quat_from_rotmat(R)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 7)).astype(np.float32) * 0.5)
        s, R, t = sim3_exp(xi)
        xi2 = sim3_log(s, R, t)
        np.testing.assert_allclose(xi2, xi, atol=2e-3)

    def test_compose_inverse(self):
        xi = jnp.asarray(RNG.normal(size=(8, 7)).astype(np.float32) * 0.5)
        s, R, t = sim3_exp(xi)
        si, Ri, ti = sim3_inverse(s, R, t)
        sc, Rc, tc = sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(sc, np.ones(8), atol=1e-5)
        np.testing.assert_allclose(Rc, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros((8, 3)), atol=1e-4)

    def test_apply(self):
        s = jnp.asarray([2.0])
        R = so3_exp(jnp.zeros((1, 3)))
        t = jnp.asarray([[1.0, 0.0, 0.0]])
        x = jnp.asarray([[1.0, 1.0, 1.0]])
        y = sim3_apply(s, R, t, x)
        np.testing.assert_allclose(y, [[3.0, 2.0, 2.0]], atol=1e-6)


class TestCamera:
    CAM = CameraIntrinsics(
        fx=718.856, fy=718.856, cx=607.19, cy=185.21, bf=386.14, width=1241, height=376
    )

    def test_project_backproject(self):
        uv = jnp.asarray(RNG.uniform(0, 300, size=(32, 2)).astype(np.float32))
        depth = jnp.asarray(RNG.uniform(1, 50, size=(32,)).astype(np.float32))
        x = backproject(self.CAM, uv, depth)
        uv2 = project(self.CAM, x)
        np.testing.assert_allclose(uv2, uv, atol=1e-3)

    def test_stereo_disparity(self):
        x = jnp.asarray([[1.0, 0.5, 10.0]])
        obs = project_stereo(self.CAM, x)
        disparity = obs[0, 0] - obs[0, 2]
        np.testing.assert_allclose(disparity, self.CAM.bf / 10.0, atol=1e-4)

    def test_undistort_roundtrip(self):
        cam = self.CAM._replace(k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-5)
        uv = jnp.asarray(RNG.uniform(100, 300, size=(16, 2)).astype(np.float32))
        xn = jnp.stack(
            [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=-1
        )
        xd = distort(cam, xn)
        uvd = jnp.stack([xd[:, 0] * cam.fx + cam.cx, xd[:, 1] * cam.fy + cam.cy], -1)
        uvu = undistort_points(cam, uvd)
        np.testing.assert_allclose(uvu, uv, atol=0.05)

    def test_in_image(self):
        uv = jnp.asarray([[0.0, 0.0], [-1.0, 10.0], [1240.9, 375.9], [1241.0, 0.0]])
        mask = in_image(self.CAM, uv)
        np.testing.assert_array_equal(mask, [True, False, True, False])
