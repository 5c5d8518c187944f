"""Bundle adjustment tests: synthetic multi-view problems with noisy
initialization must converge to ground truth; outliers must be gated;
Schur solve must agree with a dense joint solve."""

import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend.local_ba import bundle_adjust
from orb_line_slam_tpu.geometry import se3_apply, se3_exp
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics, project_stereo

CAM = CameraIntrinsics(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0, width=640, height=480
)


def make_ba_problem(C=6, P=120, stereo=True, seed=0, noise_px=0.0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-6, 6, P), rng.uniform(-4, 4, P), rng.uniform(6, 30, P)], -1
    ).astype(np.float32)
    R_list, t_list = [], []
    for i in range(C):
        xi = np.zeros(6, np.float32)
        xi[:3] = [0.4 * i, 0.02 * i, 0.05 * i]  # mostly x translation
        xi[3:] = rng.normal(0, 0.01, 3)
        R, t = se3_exp(jnp.asarray(xi))
        R_list.append(np.asarray(R))
        t_list.append(np.asarray(t))
    R_gt = np.stack(R_list)
    t_gt = np.stack(t_list)

    obs_cam, obs_lm, obs, octv = [], [], [], []
    for c in range(C):
        xc = (R_gt[c] @ pts.T).T + t_gt[c]
        uvur = np.asarray(project_stereo(CAM, jnp.asarray(xc)))
        vis = (
            (xc[:, 2] > 1)
            & (uvur[:, 0] > 0) & (uvur[:, 0] < CAM.width)
            & (uvur[:, 1] > 0) & (uvur[:, 1] < CAM.height)
        )
        for p in np.nonzero(vis)[0]:
            o = uvur[p].copy()
            if not stereo:
                o[2] = -1.0
            if noise_px:
                o[:2] += rng.normal(0, noise_px, 2)
            obs_cam.append(c)
            obs_lm.append(p)
            obs.append(o)
            octv.append(0)
    return (
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(pts),
        jnp.asarray(np.array(obs_cam, np.int32)),
        jnp.asarray(np.array(obs_lm, np.int32)),
        jnp.asarray(np.array(obs, np.float32)),
        jnp.asarray(np.array(octv, np.int32)),
    )


def test_ba_converges_from_noisy_init():
    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem()
    rng = np.random.default_rng(1)
    C, P, O = R_gt.shape[0], pts_gt.shape[0], obs.shape[0]

    # Perturb all but the first two cameras and all points.
    R0, t0 = [], []
    for c in range(C):
        if c < 2:
            R0.append(np.asarray(R_gt[c])); t0.append(np.asarray(t_gt[c]))
        else:
            from orb_line_slam_tpu.geometry import se3_compose
            dxi = jnp.asarray(
                np.concatenate([rng.normal(0, 0.05, 3), rng.normal(0, 0.01, 3)]).astype(np.float32)
            )
            dR, dt = se3_exp(dxi)
            Rp, tp = se3_compose(dR, dt, R_gt[c], t_gt[c])
            R0.append(np.asarray(Rp)); t0.append(np.asarray(tp))
    pts0 = pts_gt + jnp.asarray(rng.normal(0, 0.1, (P, 3)).astype(np.float32))

    fixed = jnp.asarray([True, True] + [False] * (C - 2))
    res = bundle_adjust(
        jnp.asarray(np.stack(R0)), jnp.asarray(np.stack(t0)), fixed,
        pts0, jnp.ones(P, bool),
        obs_cam, obs_lm, obs, octv, jnp.ones(O, bool), CAM,
    )
    np.testing.assert_allclose(res.R, R_gt, atol=2e-3)
    np.testing.assert_allclose(res.t, t_gt, atol=2e-2)
    err = np.linalg.norm(np.asarray(res.points) - np.asarray(pts_gt), axis=-1)
    assert np.median(err) < 0.02, f"median point error {np.median(err):.4f}"
    assert int(res.obs_inlier.sum()) > 0.95 * O


def test_ba_gates_outliers():
    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem(noise_px=0.3)
    O = obs.shape[0]
    rng = np.random.default_rng(2)
    obs_np = np.array(obs)
    n_out = O // 10
    out_idx = rng.choice(O, n_out, replace=False)
    obs_np[out_idx, :2] += rng.uniform(15, 60, (n_out, 2))
    C, P = R_gt.shape[0], pts_gt.shape[0]
    fixed = jnp.asarray([True, True] + [False] * (C - 2))
    res = bundle_adjust(
        R_gt, t_gt, fixed,
        pts_gt + jnp.asarray(rng.normal(0, 0.05, (P, 3)).astype(np.float32)),
        jnp.ones(P, bool),
        obs_cam, obs_lm, jnp.asarray(obs_np), octv, jnp.ones(O, bool), CAM,
    )
    inl = np.asarray(res.obs_inlier)
    assert inl[out_idx].mean() < 0.1, "outliers not gated"
    assert inl.mean() > 0.8
    np.testing.assert_allclose(res.t, t_gt, atol=3e-2)


def test_ba_mono_only():
    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem(stereo=False)
    C, P, O = R_gt.shape[0], pts_gt.shape[0], obs.shape[0]
    rng = np.random.default_rng(3)
    fixed = jnp.asarray([True, True] + [False] * (C - 2))
    res = bundle_adjust(
        R_gt, t_gt, fixed,
        pts_gt + jnp.asarray(rng.normal(0, 0.08, (P, 3)).astype(np.float32)),
        jnp.ones(P, bool),
        obs_cam, obs_lm, obs, octv, jnp.ones(O, bool), CAM,
    )
    err = np.linalg.norm(np.asarray(res.points) - np.asarray(pts_gt), axis=-1)
    assert np.median(err) < 0.03
    np.testing.assert_allclose(res.t, t_gt, atol=2e-2)


def test_schur_matches_dense_joint_solve():
    """One Gauss-Newton step via Schur must equal the dense joint solve."""
    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem(C=3, P=30)
    # Perturb to create a nonzero gradient.
    rng = np.random.default_rng(4)
    pts0 = pts_gt + jnp.asarray(rng.normal(0, 0.05, pts_gt.shape).astype(np.float32))
    C, P = 3, 30
    from orb_line_slam_tpu.backend.residuals import make_point_residual_fn
    from orb_line_slam_tpu.backend.local_ba import _residuals_and_jacs

    point_fn = make_point_residual_fn(CAM)
    is_stereo = obs[:, 2] > 0
    r, Jc, Jp = _residuals_and_jacs(
        point_fn, R_gt, t_gt, pts0, obs_cam, obs_lm, obs, is_stereo
    )
    r, Jc, Jp = map(np.asarray, (r, Jc, Jp))
    O = r.shape[0]
    # Dense joint system over [6C + 3P] with cam 0 fixed.
    n = 6 * C + 3 * P
    J = np.zeros((3 * O, n))
    for o in range(O):
        J[3 * o : 3 * o + 3, 6 * obs_cam[o] : 6 * obs_cam[o] + 6] = Jc[o]
        J[3 * o : 3 * o + 3, 6 * C + 3 * obs_lm[o] : 6 * C + 3 * obs_lm[o] + 3] = Jp[o]
    H = J.T @ J
    g = J.T @ r.reshape(-1)
    free = np.ones(n, bool)
    free[:6] = False  # cam 0 fixed
    dx = np.zeros(n)
    dx[free] = np.linalg.solve(H[np.ix_(free, free)] + 1e-8 * np.eye(free.sum()), -g[free])

    res = bundle_adjust(
        R_gt, t_gt, jnp.asarray([True, False, False]),
        pts0, jnp.ones(P, bool),
        obs_cam, obs_lm, obs, octv, jnp.ones(O, bool), CAM,
        iters1=1, iters2=0,
    )
    # After one accepted LM step with tiny lambda, the point update should
    # be close to the dense GN step.
    dp_dense = dx[6 * C :].reshape(P, 3)
    dp_ours = np.asarray(res.points) - np.asarray(pts0)
    # Direction agreement (damping makes magnitudes differ slightly).
    cos = np.sum(dp_dense * dp_ours) / (
        np.linalg.norm(dp_dense) * np.linalg.norm(dp_ours) + 1e-12
    )
    assert cos > 0.99, f"Schur step diverges from dense GN (cos={cos:.3f})"
