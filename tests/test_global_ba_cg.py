"""Matrix-free CG-on-Schur bundle adjuster vs the dense-block solver.

The two implement the same normal equations (Optimizer::
GlobalBundleAdjustemnt's problem), so from the same perturbed start
they must recover the same geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_line_slam_tpu.backend.global_ba import bundle_adjust_cg
from orb_line_slam_tpu.backend.local_ba import bundle_adjust
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.geometry.se3 import se3_apply

CAM = CameraIntrinsics(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=200.0, width=640, height=480
)


def _make_problem(C=10, P=600, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-10, 10, P), rng.uniform(-4, 4, P), rng.uniform(6, 40, P)], -1
    ).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    t = np.zeros((C, 3), np.float32)
    t[:, 0] = -np.arange(C) * 0.4  # camera moves +x in world
    # Each camera sees 2/3 of the landmarks, with overlapping subsets
    # (disjoint subsets would leave unanchored gauge-free subsystems).
    obs_cam, obs_lm, obs_uvur = [], [], []
    for c in range(C):
        sel = np.arange(P)[(np.arange(P) + c) % 3 != 0]
        xc = pts[sel] @ R[c].T + t[c]
        z = xc[:, 2]
        ok = z > 1.0
        u = CAM.fx * xc[:, 0] / z + CAM.cx
        v = CAM.fy * xc[:, 1] / z + CAM.cy
        ur = u - CAM.bf / z
        inside = ok & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        obs_cam.append(np.full(inside.sum(), c))
        obs_lm.append(sel[inside])
        obs_uvur.append(np.stack([u[inside], v[inside], ur[inside]], -1))
    obs_cam = np.concatenate(obs_cam).astype(np.int32)
    obs_lm = np.concatenate(obs_lm).astype(np.int32)
    obs_uvur = np.concatenate(obs_uvur).astype(np.float32)
    if noise:
        obs_uvur += rng.normal(0, noise, obs_uvur.shape).astype(np.float32)
    O = len(obs_cam)
    return pts, R, t, obs_cam, obs_lm, obs_uvur, O


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_recovers_perturbed_geometry(solver):
    pts, R, t, oc, ol, ouv, O = _make_problem()
    rng = np.random.default_rng(1)
    C, P = len(R), len(pts)
    pts0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    t0 = t + rng.normal(0, 0.02, t.shape).astype(np.float32)
    t0[0] = t[0]
    fixed = np.zeros(C, bool)
    fixed[0] = True
    fn = bundle_adjust if solver == "dense" else bundle_adjust_cg
    res = fn(
        jnp.asarray(R), jnp.asarray(t0), jnp.asarray(fixed),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.zeros(O, jnp.int32), jnp.ones(O, bool), CAM,
    )
    t_err = float(np.abs(np.asarray(res.t) - t).max())
    p_err = float(np.median(np.linalg.norm(np.asarray(res.points) - pts, axis=-1)))
    # 15 f32 LM iterations from a 5 cm perturbation: geometry back to
    # the centimeter level and reprojections to sub-pixel chi2.
    assert t_err < 2e-2, f"{solver}: camera translation error {t_err}"
    assert p_err < 1e-2, f"{solver}: median landmark error {p_err}"
    assert float(res.chi2) < 1.0


def test_cg_matches_dense_with_noise():
    """Same noisy problem through both solvers -> same optimum."""
    pts, R, t, oc, ol, ouv, O = _make_problem(noise=0.4)
    rng = np.random.default_rng(2)
    C, P = len(R), len(pts)
    pts0 = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[0] = True
    args = (
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(fixed),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.zeros(O, jnp.int32), jnp.ones(O, bool), CAM,
    )
    rd = bundle_adjust(*args)
    rc = bundle_adjust_cg(*args)
    # Optima agree (both ran the same LM schedule).
    assert float(rc.chi2) < float(rd.chi2) * 1.05 + 1.0
    # Truncated CG (48 iters) walks a slightly different LM path than
    # the exact dense solve; with 0.4 px observation noise the optima
    # agree to a few mm over a 3.6 m trajectory.
    t_diff = float(np.abs(np.asarray(rc.t) - np.asarray(rd.t)).max())
    assert t_diff < 5e-3, f"solver disagreement {t_diff}"
    # Inlier gates agree on >99% of observations.
    agree = (np.asarray(rc.obs_inlier) == np.asarray(rd.obs_inlier)).mean()
    assert agree > 0.99


def test_cg_respects_fixed_cameras():
    pts, R, t, oc, ol, ouv, O = _make_problem(C=6, P=300, seed=3)
    rng = np.random.default_rng(4)
    C, P = len(R), len(pts)
    t0 = t + rng.normal(0, 0.05, t.shape).astype(np.float32)
    fixed = np.zeros(C, bool)
    fixed[:2] = True
    t0[:2] = t[:2]
    res = bundle_adjust_cg(
        jnp.asarray(R), jnp.asarray(t0), jnp.asarray(fixed),
        jnp.asarray(pts), jnp.ones(P, bool),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.zeros(O, jnp.int32), jnp.ones(O, bool), CAM,
    )
    np.testing.assert_array_equal(np.asarray(res.t)[:2], t[:2])
    np.testing.assert_array_equal(np.asarray(res.R)[:2], R[:2])
    assert float(np.abs(np.asarray(res.t)[2:] - t[2:]).max()) < 5e-3
