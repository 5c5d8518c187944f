"""Joint point+line BA tests: Plücker/orthonormal round-trips, line
Jacobian sanity, and convergence of perturbed lines + cameras."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend.line_ba import _line_residual_fn, bundle_adjust_pl
from orb_line_slam_tpu.geometry.lines3d import (
    closest_points_on_line,
    orthonormal_from_pluecker,
    orthonormal_retract,
    pluecker_from_endpoints,
    pluecker_from_orthonormal,
    pluecker_transform,
)
from orb_line_slam_tpu.geometry import se3_apply, se3_exp
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics, project, project_stereo

CAM = CameraIntrinsics(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0, width=640, height=480
)
RNG = np.random.default_rng(77)


class TestPlueckerOrthonormal:
    def test_roundtrip(self):
        p1 = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32) + [0, 0, 8])
        p2 = p1 + jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32))
        n, v = pluecker_from_endpoints(p1, p2)
        U, w = orthonormal_from_pluecker(n, v)
        n2, v2 = pluecker_from_orthonormal(U, w)
        # same line up to scale: n2/v2 parallel to n/v with a COMMON scale
        s = np.linalg.norm(np.asarray(n), axis=1) / (
            np.linalg.norm(np.asarray(n2), axis=1) + 1e-12
        )
        np.testing.assert_allclose(np.asarray(n2) * s[:, None], n, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(v2) * s[:, None], v, rtol=1e-4, atol=1e-3)

    def test_retract_identity(self):
        p1 = jnp.asarray([[1.0, 2.0, 8.0]])
        p2 = jnp.asarray([[2.0, 1.0, 9.0]])
        U, w = orthonormal_from_pluecker(*pluecker_from_endpoints(p1, p2))
        U2, w2 = orthonormal_retract(U, w, jnp.zeros((1, 4)))
        np.testing.assert_allclose(U2, U, atol=1e-6)
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_closest_points(self):
        p1 = jnp.asarray([0.0, 0.0, 5.0])
        p2 = jnp.asarray([1.0, 0.0, 5.0])
        n, v = pluecker_from_endpoints(p1, p2)
        pts = jnp.asarray([[0.5, 1.0, 5.0], [2.0, -1.0, 6.0]])
        cp = closest_points_on_line(n, v, pts)
        np.testing.assert_allclose(cp[0], [0.5, 0.0, 5.0], atol=1e-5)
        np.testing.assert_allclose(cp[1], [2.0, 0.0, 5.0], atol=1e-5)

    def test_residual_zero_at_truth(self):
        fn = _line_residual_fn(CAM)
        p1 = jnp.asarray([1.0, -0.5, 9.0])
        p2 = jnp.asarray([-1.0, 0.8, 11.0])
        R, t = se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.02, 0.01, -0.03]))
        U, w = orthonormal_from_pluecker(*pluecker_from_endpoints(p1, p2))
        a = project(CAM, se3_apply(R, t, p1))
        b = project(CAM, se3_apply(R, t, p2))
        r = fn(R, t, U, w, a, b)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)


def make_pl_problem(C=5, P=60, L=24, seed=1):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-5, 5, P), rng.uniform(-3, 3, P), rng.uniform(6, 25, P)], -1
    ).astype(np.float32)
    l1 = np.stack(
        [rng.uniform(-5, 5, L), rng.uniform(-3, 3, L), rng.uniform(6, 25, L)], -1
    ).astype(np.float32)
    l2 = (l1 + rng.normal(0, 1.5, (L, 3))).astype(np.float32)

    R_list, t_list = [], []
    for i in range(C):
        xi = np.zeros(6, np.float32)
        xi[:3] = [0.45 * i, 0.02 * i, 0.03 * i]
        xi[3:] = rng.normal(0, 0.01, 3)
        R, t = se3_exp(jnp.asarray(xi))
        R_list.append(np.asarray(R)); t_list.append(np.asarray(t))
    R_gt, t_gt = np.stack(R_list), np.stack(t_list)

    oc, ol, ouv, oo = [], [], [], []
    lc, ll, la, lb = [], [], [], []
    for c in range(C):
        xc = pts @ R_gt[c].T + t_gt[c]
        uvur = np.asarray(project_stereo(CAM, jnp.asarray(xc)))
        for p in range(P):
            if xc[p, 2] > 1:
                oc.append(c); ol.append(p); ouv.append(uvur[p]); oo.append(0)
        a = np.asarray(project(CAM, jnp.asarray(l1 @ R_gt[c].T + t_gt[c])))
        b = np.asarray(project(CAM, jnp.asarray(l2 @ R_gt[c].T + t_gt[c])))
        for i in range(L):
            lc.append(c); ll.append(i); la.append(a[i]); lb.append(b[i])
    return (
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(pts),
        jnp.asarray(l1), jnp.asarray(l2),
        jnp.asarray(np.array(oc, np.int32)), jnp.asarray(np.array(ol, np.int32)),
        jnp.asarray(np.array(ouv, np.float32)), jnp.asarray(np.array(oo, np.int32)),
        jnp.asarray(np.array(lc, np.int32)), jnp.asarray(np.array(ll, np.int32)),
        jnp.asarray(np.array(la, np.float32)), jnp.asarray(np.array(lb, np.float32)),
    )


def test_joint_pl_ba_converges():
    (R_gt, t_gt, pts, l1, l2, oc, ol, ouv, oo, lc, ll, la, lb) = make_pl_problem()
    rng = np.random.default_rng(2)
    C, P, L = R_gt.shape[0], pts.shape[0], l1.shape[0]

    # Perturb points, lines and later cameras.
    pts0 = pts + jnp.asarray(rng.normal(0, 0.08, (P, 3)).astype(np.float32))
    l1p = l1 + jnp.asarray(rng.normal(0, 0.08, (L, 3)).astype(np.float32))
    l2p = l2 + jnp.asarray(rng.normal(0, 0.08, (L, 3)).astype(np.float32))
    from orb_line_slam_tpu.geometry.lines3d import (
        orthonormal_from_pluecker, pluecker_from_endpoints,
    )
    U0, w0 = orthonormal_from_pluecker(*pluecker_from_endpoints(l1p, l2p))
    from orb_line_slam_tpu.geometry import se3_compose

    R0l, t0l = [], []
    for c in range(C):
        if c < 2:
            R0l.append(np.asarray(R_gt[c])); t0l.append(np.asarray(t_gt[c]))
        else:
            dR, dt = se3_exp(jnp.asarray(
                np.concatenate([rng.normal(0, 0.04, 3), rng.normal(0, 0.008, 3)]).astype(np.float32)))
            Rp, tp = se3_compose(dR, dt, R_gt[c], t_gt[c])
            R0l.append(np.asarray(Rp)); t0l.append(np.asarray(tp))

    O, Ol = oc.shape[0], lc.shape[0]
    res = bundle_adjust_pl(
        jnp.asarray(np.stack(R0l)), jnp.asarray(np.stack(t0l)),
        jnp.asarray([True, True] + [False] * (C - 2)),
        pts0, jnp.ones(P, bool),
        oc, ol, ouv, oo, jnp.ones(O, bool),
        U0, w0, jnp.ones(L, bool),
        lc, ll, la, lb, jnp.zeros(Ol, jnp.int32), jnp.ones(Ol, bool),
        CAM,
    )
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=3e-3)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=3e-2)
    # Lines converged: the optimized Plücker lines must pass near the
    # ground-truth endpoints.
    from orb_line_slam_tpu.geometry.lines3d import (
        closest_points_on_line, pluecker_from_orthonormal,
    )
    n, v = pluecker_from_orthonormal(res.line_U, res.line_w)
    cp1 = closest_points_on_line(n, v, l1)
    cp2 = closest_points_on_line(n, v, l2)
    d1 = np.linalg.norm(np.asarray(cp1) - np.asarray(l1), axis=1)
    d2 = np.linalg.norm(np.asarray(cp2) - np.asarray(l2), axis=1)
    assert np.median(np.concatenate([d1, d2])) < 0.03, (
        f"line dist median {np.median(np.concatenate([d1, d2])):.3f}"
    )
    assert int(res.lobs_inlier.sum()) > 0.9 * Ol
