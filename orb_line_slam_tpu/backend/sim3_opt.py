"""Sim3 relative-pose refinement (g2o OptimizeSim3 equivalent).

Rebuilds Optimizer::OptimizeSim3 (reference src/Optimizer.cc, SURVEY.md
§2.1 row 13 / §3.4 ComputeSim3): given matched landmark pairs between
two keyframes and an initial Sim3 ``T_12`` (mapping frame-2 camera
coordinates into frame 1), minimize the bidirectional reprojection
error

    e1_i = obs1_i - project(cam1, S_12   · p2_i)
    e2_i = obs2_i - project(cam2, S_12^-1 · p1_i)

over the 7-DoF Sim3 tangent (scale frozen when ``fix_scale``, the
stereo/RGB-D case).  The reference runs g2o LM with a chi2=10 gate
after 5 iterations, drops outliers, and re-optimizes; we mirror that
schedule as two fixed Gauss–Newton phases with the gate in between —
one jitted device program, Jacobians by forward-mode autodiff instead
of g2o's hand-written linearization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
_HI = jax.lax.Precision.HIGHEST  # small-K geometry: bf16-unsafe

from ..geometry.camera import CameraIntrinsics, project
from ..geometry.sim3 import sim3_inverse, sim3_retract


class Sim3OptResult(NamedTuple):
    s: jnp.ndarray        # scalar
    R: jnp.ndarray        # [3, 3]
    t: jnp.ndarray        # [3]
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # scalar int32


def _residuals(s, R, t, pts1, pts2, obs1, obs2, cam1, cam2):
    p2in1 = s * jnp.matmul(pts2, R.T, precision=_HI) + t
    e1 = obs1 - project(cam1, p2in1)
    si, Ri, ti = sim3_inverse(s, R, t)
    p1in2 = si * jnp.matmul(pts1, Ri.T, precision=_HI) + ti
    e2 = obs2 - project(cam2, p1in2)
    return e1, e2, p2in1[..., 2], p1in2[..., 2]


@functools.partial(
    jax.jit, static_argnames=("cam1", "cam2", "fix_scale", "iters1", "iters2")
)
def optimize_sim3(
    s0: jnp.ndarray,        # initial scale (scalar)
    R0: jnp.ndarray,        # [3, 3]
    t0: jnp.ndarray,        # [3]
    pts1: jnp.ndarray,      # [N, 3] landmark positions in camera-1 frame
    pts2: jnp.ndarray,      # [N, 3] matched positions in camera-2 frame
    obs1: jnp.ndarray,      # [N, 2] measured keypoints in image 1
    obs2: jnp.ndarray,      # [N, 2] measured keypoints in image 2
    sigma2_1: jnp.ndarray,  # [N] per-match pixel variance in image 1
    sigma2_2: jnp.ndarray,  # [N]
    valid: jnp.ndarray,     # [N]
    cam1: CameraIntrinsics,
    cam2: CameraIntrinsics,
    fix_scale: bool = True,
    iters1: int = 5,
    iters2: int = 5,
    th2: float = 10.0,
) -> Sim3OptResult:
    """Two-phase Gauss–Newton on the Sim3 tangent with a chi2 outlier
    gate between phases (the reference's 5 + gate + 10·more schedule)."""
    N = pts1.shape[0]
    w1 = 1.0 / jnp.maximum(sigma2_1, 1e-8)
    w2 = 1.0 / jnp.maximum(sigma2_2, 1e-8)

    def chi2(s, R, t, mask):
        e1, e2, z1, z2 = _residuals(s, R, t, pts1, pts2, obs1, obs2, cam1, cam2)
        c1 = jnp.sum(e1 * e1, -1) * w1
        c2 = jnp.sum(e2 * e2, -1) * w2
        bad = (z1 <= 0.05) | (z2 <= 0.05)
        c1 = jnp.where(bad, jnp.inf, c1)
        c2 = jnp.where(bad, jnp.inf, c2)
        return c1, c2

    def gn_step(carry, _):
        s, R, t, mask = carry

        def resid_flat(xi):
            s2, R2, t2 = sim3_retract(s, R, t, xi)
            e1, e2, _, _ = _residuals(
                s2, R2, t2, pts1, pts2, obs1, obs2, cam1, cam2
            )
            return jnp.concatenate([e1, e2], axis=0)  # [2N, 2]

        xi0 = jnp.zeros(7, pts1.dtype)
        r = resid_flat(xi0)                      # [2N, 2]
        J = jax.jacfwd(resid_flat)(xi0)          # [2N, 2, 7]
        w = jnp.concatenate([w1 * mask, w2 * mask], 0)  # [2N]
        # Huber robust weights (g2o sets an sqrt(th2) Huber kernel on
        # both edge directions) as IRLS: w *= min(1, delta/|r|_w).
        chi_row = jnp.sqrt(jnp.sum(r * r, -1) * jnp.maximum(w, 1e-12))
        w = w * jnp.minimum(1.0, jnp.sqrt(th2) / jnp.maximum(chi_row, 1e-6))
        # Guard non-finite rows (points behind a camera under the
        # current iterate) — weight them out instead of poisoning H.
        row_ok = jnp.all(jnp.isfinite(r), -1) & jnp.all(
            jnp.isfinite(J.reshape(J.shape[0], -1)), -1
        )
        w = jnp.where(row_ok, w, 0.0)
        r = jnp.where(row_ok[:, None], r, 0.0)
        J = jnp.where(row_ok[:, None, None], J, 0.0)
        H = jnp.einsum("nrk,n,nrl->kl", J, w, J, precision=_HI)
        g = jnp.einsum("nrk,n,nr->k", J, w, r, precision=_HI)
        if fix_scale:
            # Freeze the scale coordinate: unit row/col, zero gradient.
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        H = H + 1e-6 * jnp.trace(H) / 7.0 * jnp.eye(7, dtype=H.dtype)
        dx = -jnp.linalg.solve(H, g)
        s2, R2, t2 = sim3_retract(s, R, t, dx)
        # Reject a diverging step (GN safeguard; g2o's LM would damp).
        c_old = jnp.sum(jnp.where(mask > 0, sum(chi2(s, R, t, mask)), 0.0))
        c_new = jnp.sum(jnp.where(mask > 0, sum(chi2(s2, R2, t2, mask)), 0.0))
        take = jnp.isfinite(c_new) & (c_new <= c_old)
        s = jnp.where(take, s2, s)
        R = jnp.where(take, R2, R)
        t = jnp.where(take, t2, t)
        return (s, R, t, mask), None

    mask0 = valid.astype(pts1.dtype)
    (s, R, t, _), _ = jax.lax.scan(
        gn_step, (jnp.asarray(s0, pts1.dtype), R0, t0, mask0), None, length=iters1
    )
    c1, c2 = chi2(s, R, t, mask0)
    inl = valid & (c1 < th2) & (c2 < th2)
    mask1 = inl.astype(pts1.dtype)
    (s, R, t, _), _ = jax.lax.scan(gn_step, (s, R, t, mask1), None, length=iters2)
    c1, c2 = chi2(s, R, t, mask1)
    inl = inl & (c1 < th2) & (c2 < th2)
    return Sim3OptResult(s, R, t, inl, jnp.sum(inl).astype(jnp.int32))
