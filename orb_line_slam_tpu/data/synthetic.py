"""Synthetic stereo scene renderer for dataset-free integration tests.

The reference family has no tests at all (SURVEY.md §4); this module
implements the survey's prescribed synthetic-scene strategy: render
point (and line) landmarks along a known trajectory, run the pipeline,
assert ATE ~ 0.  Rendering is host-side numpy/cv2 (test-only code, not
part of the TPU compute path).

Each 3D landmark carries a fixed random 5x5 texture patch so that ORB
descriptors are distinctive and stable across views.
"""

from __future__ import annotations

import numpy as np

from ..geometry.camera import CameraIntrinsics


class SyntheticScene:
    def __init__(
        self,
        cam: CameraIntrinsics,
        n_points: int = 400,
        n_lines: int = 0,
        extent=((-8.0, 8.0), (-4.0, 4.0), (2.0, 40.0)),
        seed: int = 0,
        clear_radius: float = 0.0,
        ground: tuple | None = None,
    ):
        rng = np.random.default_rng(seed)
        self.cam = cam
        lo = np.array([e[0] for e in extent])
        hi = np.array([e[1] for e in extent])
        self.points = rng.uniform(lo, hi, size=(n_points, 3)).astype(np.float64)
        if clear_radius > 0.0:
            # Keep a free corridor around the z axis (the camera path):
            # push landmarks inside the tube radially outward, as a real
            # street/corridor has free space along the trajectory.
            xy = self.points[:, :2]
            r = np.linalg.norm(xy, axis=1)
            inside = r < clear_radius
            scale = (clear_radius + rng.uniform(0, 2.0, inside.sum())) / np.maximum(
                r[inside], 1e-6
            )
            xy[inside] *= scale[:, None]
        if ground is not None:
            # Road-surface landmarks (KITTI-like): a fraction of points
            # lies on a textured ground plane y ≈ y0 below the camera,
            # supplying the close features the keyframe policy's
            # tracked-close counters assume (+y is down in camera frame).
            y0, frac = ground
            n_g = int(n_points * frac)
            g = rng.uniform(lo, hi, size=(n_g, 3))
            g[:, 1] = y0 + rng.normal(0.0, 0.05, n_g)
            self.points[:n_g] = g
        # Distinctive textured billboard per landmark with a fixed
        # PHYSICAL size: the projected patch scales with depth, so
        # appearance is geometrically consistent under camera motion
        # (ORB's scale pyramid handles the zoom, as with real texture).
        # Fractal (multi-octave) textures: structure at all scales, so
        # appearance stays correlated at any viewing distance — per-texel
        # white noise would decorrelate under sub-pixel resampling.
        import cv2

        patches = np.zeros((n_points, 64, 64), np.float32)
        for g, amp in ((4, 1.0), (8, 0.6), (16, 0.4), (32, 0.25)):
            grids = rng.uniform(-1, 1, size=(n_points, g, g)).astype(np.float32)
            for i in range(n_points):
                patches[i] += amp * cv2.resize(grids[i], (64, 64), interpolation=cv2.INTER_LINEAR)
        pmin = patches.min(axis=(1, 2), keepdims=True)
        pmax = patches.max(axis=(1, 2), keepdims=True)
        self.patches = (255 * (patches - pmin) / (pmax - pmin + 1e-6)).astype(np.uint8)
        self.world_size = rng.uniform(0.35, 0.9, size=n_points)
        # Mipmap chain per patch (area-filtered) so minified billboards
        # don't alias frame-to-frame (warpAffine has no area filter).
        import cv2

        self.mips = []
        for lvl_size in (64, 32, 16, 8, 4):
            if lvl_size == 64:
                self.mips.append(self.patches)
            else:
                self.mips.append(
                    np.stack(
                        [
                            cv2.resize(p, (lvl_size, lvl_size), interpolation=cv2.INTER_AREA)
                            for p in self.patches
                        ]
                    )
                )
        # Optional per-frame sensor noise (sigma in gray levels): the
        # noise field is independent per render call, which is what
        # degrades frame-to-frame matching the way a real sensor does —
        # the noise-free renderer tracks at ~0.2% drift, too clean to
        # exercise loop closure.
        self.noise_sigma = 0.0
        self._noise_calls = 0
        self.lines = None
        if n_lines:
            starts = rng.uniform(lo, hi, size=(n_lines, 3))
            dirs = rng.normal(size=(n_lines, 3))
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            lengths = rng.uniform(1.0, 4.0, size=(n_lines, 1))
            self.lines = np.stack([starts, starts + dirs * lengths], axis=1)
        self.bg = 110

    def render(self, R_cw: np.ndarray, t_cw: np.ndarray) -> np.ndarray:
        """Render the left view for camera pose Tcw."""
        return self._render_view(R_cw, t_cw, baseline_shift=0.0)

    def render_stereo(self, R_cw: np.ndarray, t_cw: np.ndarray):
        left = self._render_view(R_cw, t_cw, 0.0)
        right = self._render_view(R_cw, t_cw, self.cam.baseline)
        return left, right

    def render_rgbd(self, R_cw: np.ndarray, t_cw: np.ndarray):
        """Left view + registered depth map in meters (0 = no return),
        as a TUM-style RGB-D sensor would deliver."""
        depth = np.zeros((self.cam.height, self.cam.width), np.float32)
        img = self._render_view(R_cw, t_cw, 0.0, depth_out=depth)
        return img, depth

    def _render_view(self, R_cw, t_cw, baseline_shift, depth_out=None):
        import cv2

        cam = self.cam
        h, w = cam.height, cam.width
        # Flat background: any texture here would be fixed in SCREEN
        # space (not world space) and would corrupt descriptors of
        # features whose sampling pattern overlaps it.
        img = np.full((h, w), self.bg, dtype=np.uint8)

        xc = (R_cw @ self.points.T).T + t_cw
        xc = xc - np.array([baseline_shift, 0.0, 0.0])  # right cam offset
        z = xc[:, 2]
        u = cam.fx * xc[:, 0] / np.where(z > 0.1, z, 1.0) + cam.cx
        v = cam.fy * xc[:, 1] / np.where(z > 0.1, z, 1.0) + cam.cy
        vis = z > 0.5
        order = np.argsort(-z)  # far first so near landmarks overdraw
        for i in order:
            if not vis[i]:
                continue
            s = cam.fx * self.world_size[i] / z[i]  # projected size in px
            if s < 3.0 or s > 600.0:
                continue
            half = s / 2.0
            x0 = int(np.floor(u[i] - half)) - 1
            y0 = int(np.floor(v[i] - half)) - 1
            size = int(np.ceil(s)) + 3
            # Clip the ROI to the image (partially-visible billboards
            # must render their visible part, not vanish).
            cx0, cy0 = max(x0, 0), max(y0, 0)
            cx1, cy1 = min(x0 + size, w), min(y0 + size, h)
            if cx1 - cx0 < 2 or cy1 - cy0 < 2:
                continue
            # Pick the smallest mip level that is >= the projected size.
            mip = self.mips[0]
            for m in self.mips:
                if m.shape[1] >= s:
                    mip = m
                else:
                    break
            patch = mip[i]
            scale = s / patch.shape[1]
            M = np.array(
                [
                    [scale, 0.0, u[i] - half - cx0],
                    [0.0, scale, v[i] - half - cy0],
                ]
            )
            warped = cv2.warpAffine(
                patch.astype(np.float32), M, (cx1 - cx0, cy1 - cy0),
                flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=-1.0,
            )
            mask = warped >= 0
            roi = img[cy0:cy1, cx0:cx1]
            roi[mask] = warped[mask].astype(np.uint8)
            if depth_out is not None:
                # Billboards are fronto-parallel: constant depth across
                # the patch footprint.
                droi = depth_out[cy0:cy1, cx0:cx1]
                droi[mask] = z[i]

        if self.lines is not None:
            for seg in self.lines:
                pc = (R_cw @ seg.T).T + t_cw - np.array([baseline_shift, 0.0, 0.0])
                # Clip against the z=1 near plane (shorten, don't skip —
                # and never project near-zero depths, which would paint
                # streaks across the whole frame).
                z0, z1 = pc[0, 2], pc[1, 2]
                if z0 < 1.0 and z1 < 1.0:
                    continue
                pc = pc.copy()
                if z0 < 1.0:
                    a = (1.0 - z0) / (z1 - z0)
                    pc[0] = pc[0] + a * (pc[1] - pc[0])
                elif z1 < 1.0:
                    a = (1.0 - z1) / (z0 - z1)
                    pc[1] = pc[1] + a * (pc[0] - pc[1])
                p0 = (
                    cam.fx * pc[0, 0] / pc[0, 2] + cam.cx,
                    cam.fy * pc[0, 1] / pc[0, 2] + cam.cy,
                )
                p1 = (
                    cam.fx * pc[1, 0] / pc[1, 2] + cam.cx,
                    cam.fy * pc[1, 1] / pc[1, 2] + cam.cy,
                )
                cv2.line(
                    img,
                    (int(round(p0[0])), int(round(p0[1]))),
                    (int(round(p1[0])), int(round(p1[1]))),
                    int(30),
                    2,
                    cv2.LINE_8,
                )
        if self.noise_sigma > 0.0:
            nrng = np.random.default_rng(977 + self._noise_calls)
            self._noise_calls += 1
            img = np.clip(
                img.astype(np.float32)
                + nrng.normal(0.0, self.noise_sigma, img.shape),
                0, 255,
            ).astype(np.uint8)
        return img


def loop_circuit_trajectory(
    n_frames: int, radius: float = 10.0, laps: float = 1.08
):
    """A genuine closed circuit: the camera travels a circle of the
    given radius in the x-z plane, yawing with the tangent, and comes
    back through its starting poses (laps > 1 ⇒ the final keyframes
    literally REVISIT the first ones — the pixels-to-loop-closure
    stimulus the one-way ``circular_trajectory`` cannot produce;
    VERDICT r3 'next round' #2/#3).  Mirrors the reference's loop
    validation on KITTI 00-style circuits (src/LoopClosing.cc).

    Returns [(R_cw, t_cw)] world-to-camera poses; the camera starts at
    the origin looking +z and orbits the circle centered at
    (radius, 0, 0), always heading along the tangent.
    """
    poses = []
    total = 2.0 * np.pi * laps
    for i in range(n_frames):
        yaw = total * i / max(n_frames - 1, 1)
        Rwc = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ]
        )
        # Circle center sits at (0, 0, radius); the camera starts at the
        # origin facing +z and always faces the tangent direction.
        twc = np.array(
            [radius * (1.0 - np.cos(yaw)), 0.0, radius * np.sin(yaw)]
        )
        R_cw = Rwc.T
        t_cw = -Rwc.T @ twc
        poses.append((R_cw, t_cw))
    return poses


def circular_trajectory(n_frames: int, radius: float = 0.0, step: float = 0.3):
    """Forward motion with slight yaw — a KITTI-like segment.

    Returns list of (R_cw, t_cw) world-to-camera poses; camera looks +z.
    """
    poses = []
    for i in range(n_frames):
        yaw = 0.002 * i
        Rwc = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ]
        )
        twc = np.array([radius * np.sin(yaw), 0.0, step * i])
        R_cw = Rwc.T
        t_cw = -Rwc.T @ twc
        poses.append((R_cw, t_cw))
    return poses
