"""Large-scale bundle adjustment: matrix-free CG on the Schur complement.

The dense-block solver (local_ba.py) materializes the camera-landmark
coupling B [P,C,6,3] and the reduced system S [6C,6C] — perfect for
local windows (<= ~48 cameras), but at global-BA scale (hundreds of
keyframes x tens of thousands of landmarks) B alone is gigabytes.  This
is the sparse path the reference gets from g2o's BlockSolver_6_3 +
CHOLMOD (src/Optimizer.cc GlobalBundleAdjustemnt, SURVEY.md §2.1 row 13,
§7.2 hard-part #3), rebuilt for TPU:

  - never materialize B or S: every product against them is a
    segment-sum over the observation list (scatter-add — XLA lowers
    these to efficient sorted-segment ops on TPU);
  - solve S dc = rhs by preconditioned conjugate gradients with the
    block-Jacobi (per-camera 6x6) preconditioner — the standard
    large-BA recipe (cf. "Bundle Adjustment in the Large"'s CG variant);
  - landmark back-substitution stays closed-form per landmark.

Memory is O(O + C + P); compute per CG step is two observation sweeps.
Same two-stage LM schedule + chi2 gating as the dense solver, so the
two are drop-in interchangeable; run_global_ba picks by problem size.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraIntrinsics
from ..geometry.se3 import se3_compose, se3_exp
from .local_ba import BAResult, _residuals_and_jacs
from .residuals import inv_level_sigma2, make_point_residual_fn
from .assembly import inv33
from .robust import CHI2_MONO, CHI2_STEREO, huber_weight


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam", "scale_factor", "iters1", "iters2", "fix_first", "cg_iters"
    ),
)
def bundle_adjust_cg(
    R0: jnp.ndarray,          # [C, 3, 3] world->cam
    t0: jnp.ndarray,          # [C, 3]
    cam_fixed: jnp.ndarray,   # bool [C]
    points0: jnp.ndarray,     # [P, 3]
    point_valid: jnp.ndarray,  # bool [P]
    obs_cam: jnp.ndarray,     # int32 [O]
    obs_lm: jnp.ndarray,      # int32 [O]
    obs_uvur: jnp.ndarray,    # float32 [O, 3] (u, v, uR); uR<0 = mono
    obs_oct: jnp.ndarray,     # int32 [O]
    obs_valid: jnp.ndarray,   # bool [O]
    cam: CameraIntrinsics,
    scale_factor: float = 1.2,
    iters1: int = 5,
    iters2: int = 10,
    fix_first: bool = False,
    cg_iters: int = 48,
) -> BAResult:
    C = R0.shape[0]
    P = points0.shape[0]
    point_fn = make_point_residual_fn(cam)

    if fix_first:
        cam_fixed = cam_fixed.at[0].set(True)

    is_stereo = obs_uvur[:, 2] > 0
    info = inv_level_sigma2(obs_oct, scale_factor)
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    obs_valid = obs_valid & point_valid[obs_lm]

    free_c = (~cam_fixed).astype(jnp.float32)[:, None]  # [C,1]

    def total_chi2(R, t, points, o_valid, use_huber):
        r = point_fn(R[obs_cam], t[obs_cam], points[obs_lm], obs_uvur, is_stereo)
        c = jnp.sum(r * r, axis=-1) * info
        w = huber_weight(c, CHI2_STEREO) if use_huber else 1.0
        return jnp.sum(jnp.where(o_valid, c * w, 0.0)), c

    def lm_iteration(carry, _, o_valid, use_huber):
        R, t, points, lam, _ = carry
        r, Jc, Jp = _residuals_and_jacs(
            point_fn, R, t, points, obs_cam, obs_lm, obs_uvur, is_stereo
        )
        c = jnp.sum(r * r, axis=-1) * info
        w = info * jnp.where(o_valid, 1.0, 0.0)
        if use_huber:
            w = w * huber_weight(c, CHI2_STEREO)

        # Per-observation weighted blocks kept in OBSERVATION-major
        # layout; B/S never materialize.
        JcT_Jc = jnp.einsum("odi,odj,o->oij", Jc, Jc, w)   # [O,6,6]
        JpT_Jp = jnp.einsum("odi,odj,o->oij", Jp, Jp, w)   # [O,3,3]
        JcT_Jp = jnp.einsum("odi,odj,o->oij", Jc, Jp, w)   # [O,6,3]
        gc_o = jnp.einsum("odi,od,o->oi", Jc, r, w)        # [O,6]
        gp_o = jnp.einsum("odi,od,o->oi", Jp, r, w)        # [O,3]

        Hcc = jnp.zeros((C, 6, 6)).at[obs_cam].add(JcT_Jc)
        Hpp = jnp.zeros((P, 3, 3)).at[obs_lm].add(JpT_Jp)
        gc = jnp.zeros((C, 6)).at[obs_cam].add(gc_o)
        gp = jnp.zeros((P, 3)).at[obs_lm].add(gp_o)

        Hcc = Hcc + lam * Hcc * jnp.eye(6) + 1e-8 * jnp.eye(6)
        Hpp = Hpp + lam * Hpp * jnp.eye(3)
        Hpp = Hpp + (1e-6 + (~point_valid[:, None, None]) * 1.0) * jnp.eye(3)
        V = inv33(Hpp)  # [P,3,3]

        m = free_c[:, 0]  # [C] 1=free

        def bt_x(x):
            """B^T x: [C,6] -> [P,3] via one observation sweep."""
            yo = jnp.einsum("oij,oi->oj", JcT_Jp, x[obs_cam])  # [O,3]
            return jnp.zeros((P, 3)).at[obs_lm].add(yo)

        def b_z(z):
            """B z: [P,3] -> [C,6] via one observation sweep."""
            uo = jnp.einsum("oij,oj->oi", JcT_Jp, z[obs_lm])  # [O,6]
            return jnp.zeros((C, 6)).at[obs_cam].add(uo)

        def s_matvec(x):
            """Schur product S x with fixed cameras as identity rows."""
            xm = x * m[:, None]
            hx = jnp.einsum("cij,cj->ci", Hcc, xm)
            z = jnp.einsum("pij,pj->pi", V, bt_x(xm))
            sx = (hx - b_z(z)) * m[:, None]
            return sx + x * (1.0 - m)[:, None]

        # rhs = -(gc - B V gp), masked at fixed cameras.
        rhs = -(gc - b_z(jnp.einsum("pij,pj->pi", V, gp))) * m[:, None]

        # Block-Jacobi preconditioner: per-camera 6x6 inverse of Hcc.
        Minv = jnp.linalg.inv(Hcc + 1e-6 * jnp.eye(6))

        def precond(v):
            return jnp.einsum("cij,cj->ci", Minv, v * m[:, None]) * m[:, None] + v * (
                1.0 - m
            )[:, None]

        def cg_step(state, _):
            x, rr, p, rz = state
            Ap = s_matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(pAp > 1e-20, rz / pAp, 0.0)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros_like(rhs)
        z0 = precond(rhs)
        (dc, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, rhs, z0, jnp.sum(rhs * z0)), None, length=cg_iters
        )
        dc = dc * m[:, None]

        # Landmark back-substitution: dp = -V (gp + B^T dc).
        dp = -jnp.einsum("pij,pj->pi", V, gp + bt_x(dc))
        dp = dp * point_valid[:, None]

        dR, dt = se3_exp(dc * free_c)
        R2, t2 = jax.vmap(se3_compose)(dR, dt, R, t)
        points2 = points + dp
        err0, _ = total_chi2(R, t, points, o_valid, use_huber)
        err1, _ = total_chi2(R2, t2, points2, o_valid, use_huber)
        accept = err1 < err0
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        points = jnp.where(accept, points2, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e5)
        return (R, t, points, lam, err1), None

    def run_stage(R, t, points, o_valid, n_iters, use_huber):
        body = functools.partial(lm_iteration, o_valid=o_valid, use_huber=use_huber)
        (R, t, points, _, err), _ = jax.lax.scan(
            body, (R, t, points, jnp.float32(1e-4), jnp.float32(0.0)), None,
            length=n_iters,
        )
        return R, t, points

    R, t, points = run_stage(R0, t0, points0, obs_valid, iters1, True)
    _, c = total_chi2(R, t, points, obs_valid, False)
    o_valid = obs_valid & (c <= chi2_th)
    R, t, points = run_stage(R, t, points, o_valid, iters2, False)
    err, c = total_chi2(R, t, points, o_valid, False)
    o_valid = obs_valid & (c <= chi2_th)
    return BAResult(R=R, t=t, points=points, obs_inlier=o_valid, chi2=err)
