"""Pinhole camera model: projection, stereo, radial-tangential distortion.

Replaces the reference's camera handling spread across src/Frame.cc
(UndistortKeyPoints, ComputeImageBounds) and src/Tracking.cc YAML camera
parsing (SURVEY.md §2.1 rows 2, 5; §5 config table).  All math is
batched jax.numpy with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CameraIntrinsics(NamedTuple):
    """Static per-sequence camera parameters (host-side constants)."""

    fx: float
    fy: float
    cx: float
    cy: float
    bf: float  # baseline * fx (stereo); 0 for monocular
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 0
    height: int = 0

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def project(cam: CameraIntrinsics, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (...,3) -> pixel coords (...,2). No distortion
    (the pipeline undistorts keypoints once at extraction, as the
    reference does in Frame::UndistortKeyPoints)."""
    z = xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] * inv_z + cam.cx
    v = cam.fy * xc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: CameraIntrinsics, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (...,3) -> (u_L, v_L, u_R) stereo observation,
    matching g2o EdgeStereoSE3ProjectXYZ's measurement model
    (u_R = u_L - bf/z)."""
    z = xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] * inv_z + cam.cx
    v = cam.fy * xc[..., 1] * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    return jnp.stack([u, v, ur], axis=-1)


def backproject(cam: CameraIntrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (...,2) + depth (...) -> camera-frame 3D points (...,3).
    Mirrors Frame::UnprojectStereo."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort(cam: CameraIntrinsics, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords (...,2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraIntrinsics, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Iteratively undistort pixel coords (...,2) — fixed-iteration
    Newton-style inverse of ``distort`` (cv::undistortPoints analog used
    by Frame::UndistortKeyPoints; fixed iteration count keeps it
    jit-friendly)."""
    if cam.k1 == 0.0 and cam.k2 == 0.0 and cam.p1 == 0.0 and cam.p2 == 0.0:
        return uv
    xn0 = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xn = xn0
    for _ in range(iters):
        d = distort(cam, xn) - xn
        xn = xn0 - d
    return jnp.stack(
        [xn[..., 0] * cam.fx + cam.cx, xn[..., 1] * cam.fy + cam.cy], axis=-1
    )


def in_image(cam: CameraIntrinsics, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Boolean mask for pixels inside the image bounds."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )
