"""Distributed bundle adjustment: landmark-sharded Schur reduction.

The reference has no distributed anything (single process + pthreads,
SURVEY.md §2.4); this module is the TPU-native scaling path demanded by
BASELINE.json:5/11: keyframes are replicated, landmarks and their
observations are sharded over a `jax.sharding.Mesh` axis, and each
device computes the partial camera Hessian + Schur contribution of its
landmark block.  One `psum` over the mesh assembles the reduced camera
system (the Hessian rides ICI, never the raw observations); every
device solves the small replicated camera system and back-substitutes
its own landmark shard locally.

    S = psum_d( Hcc_d - B_d Hpp_d^-1 B_d^T ),   dc = S^-1 rhs (replicated)
    dp_d = -Hpp_d^-1 (gp_d + B_d^T dc)          (local, no comm)

Math mirrors backend/local_ba.py (same residuals/weights/gating).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend.local_ba import _residuals_and_jacs
from ..backend.residuals import inv_level_sigma2, make_point_residual_fn
from ..backend.robust import CHI2_MONO, CHI2_STEREO, huber_weight
from ..geometry.se3 import se3_compose, se3_exp


def _ba_shard_body(
    R, t, cam_fixed, points, point_valid,
    obs_cam, obs_lm_local, obs_uvur, obs_oct, obs_valid,
    cam, scale_factor, n_iters, axis_name,
):
    """LM loop over one landmark shard; obs_lm_local indexes into the
    LOCAL points shard. Runs inside shard_map with `axis_name`."""
    C = R.shape[0]
    Pl = points.shape[0]
    point_fn = make_point_residual_fn(cam)
    is_stereo = obs_uvur[:, 2] > 0
    info = inv_level_sigma2(obs_oct, scale_factor)
    obs_valid = obs_valid & point_valid[obs_lm_local]
    free_c = (~cam_fixed).astype(jnp.float32)[:, None]

    def total_chi2(R, t, points, use_huber):
        r = point_fn(R[obs_cam], t[obs_cam], points[obs_lm_local], obs_uvur, is_stereo)
        c = jnp.sum(r * r, axis=-1) * info
        w = huber_weight(c, CHI2_STEREO) if use_huber else 1.0
        local = jnp.sum(jnp.where(obs_valid, c * w, 0.0))
        return jax.lax.psum(local, axis_name)

    def body(carry, _):
        R, t, points, lam = carry
        r, Jc, Jp = _residuals_and_jacs(
            point_fn, R, t, points, obs_cam, obs_lm_local, obs_uvur, is_stereo
        )
        c = jnp.sum(r * r, axis=-1) * info
        w = info * huber_weight(c, CHI2_STEREO) * jnp.where(obs_valid, 1.0, 0.0)

        JcT_Jc = jnp.einsum("odi,odj,o->oij", Jc, Jc, w)
        JpT_Jp = jnp.einsum("odi,odj,o->oij", Jp, Jp, w)
        JcT_Jp = jnp.einsum("odi,odj,o->oij", Jc, Jp, w)
        gc_o = jnp.einsum("odi,od,o->oi", Jc, r, w)
        gp_o = jnp.einsum("odi,od,o->oi", Jp, r, w)

        Hcc = jnp.zeros((C, 6, 6)).at[obs_cam].add(JcT_Jc)
        Hpp = jnp.zeros((Pl, 3, 3)).at[obs_lm_local].add(JpT_Jp)
        B = (
            jnp.zeros((Pl * C, 18))
            .at[obs_lm_local * C + obs_cam]
            .add(JcT_Jp.reshape(-1, 18))
            .reshape(Pl, C, 6, 3)
        )
        gc = jnp.zeros((C, 6)).at[obs_cam].add(gc_o)
        gp = jnp.zeros((Pl, 3)).at[obs_lm_local].add(gp_o)

        Hcc = Hcc + lam * Hcc * jnp.eye(6)
        Hpp = Hpp + lam * Hpp * jnp.eye(3)
        Hpp = Hpp + (1e-6 + (~point_valid[:, None, None]) * 1.0) * jnp.eye(3)
        V = jnp.linalg.inv(Hpp)
        Wp = jnp.einsum("pcij,pjk->pcik", B, V)

        A1 = Wp.transpose(1, 2, 0, 3).reshape(C * 6, Pl * 3)
        A2 = B.transpose(1, 2, 0, 3).reshape(C * 6, Pl * 3)
        idx = jnp.arange(C)
        Hcc_full = (
            jnp.zeros((C, 6, C, 6)).at[idx, :, idx, :].set(Hcc).reshape(C * 6, C * 6)
        )
        S_local = Hcc_full - jnp.dot(A1, A2.T, preferred_element_type=jnp.float32)
        rhs_local = -(gc - jnp.einsum("pcik,pk->ci", Wp, gp)).reshape(C * 6)

        # The ONLY cross-device communication: reduce the camera system.
        S = jax.lax.psum(S_local, axis_name)
        rhs = jax.lax.psum(rhs_local, axis_name)
        S = S + 1e-8 * jnp.eye(C * 6)

        m = jnp.repeat(free_c[:, 0], 6)
        S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        rhs = rhs * m
        dc = jnp.linalg.solve(S, rhs).reshape(C, 6)

        dp = -jnp.einsum("pij,pj->pi", V, gp + jnp.einsum("pcij,ci->pj", B, dc))
        dp = dp * point_valid[:, None]

        dR, dt = se3_exp(dc * free_c)
        R2, t2 = jax.vmap(se3_compose)(dR, dt, R, t)
        points2 = points + dp
        err0 = total_chi2(R, t, points, True)
        err1 = total_chi2(R2, t2, points2, True)
        accept = err1 < err0
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        points = jnp.where(accept, points2, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e5)
        return (R, t, points, lam), None

    (R, t, points, _), _ = jax.lax.scan(
        body, (R, t, points, jnp.float32(1e-4)), None, length=n_iters
    )
    return R, t, points


def make_distributed_ba(mesh: Mesh, cam, scale_factor=1.2, n_iters=10,
                        axis_name="dp"):
    """Build a jitted landmark-sharded BA step over `mesh`.

    Expects inputs already laid out so that observation slice d refers
    only to landmark slice d (host groups observations by shard;
    obs_lm is LOCAL to each shard).  Shapes: points [P, 3] with P
    divisible by mesh size; obs arrays [O] with O divisible likewise.
    """
    from jax import shard_map

    body = functools.partial(
        _ba_shard_body,
        cam=cam, scale_factor=scale_factor, n_iters=n_iters,
        axis_name=axis_name,
    )
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),              # R, t, cam_fixed (replicated)
            P(axis_name), P(axis_name),  # points, point_valid
            P(axis_name), P(axis_name), P(axis_name), P(axis_name), P(axis_name),
        ),
        out_specs=(P(), P(), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(sharded)
