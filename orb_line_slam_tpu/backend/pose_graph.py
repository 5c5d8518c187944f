"""Sim3 pose-graph (essential-graph) optimization.

Rebuilds Optimizer::OptimizeEssentialGraph (src/Optimizer.cc —
SURVEY.md §2.1 row 13, §3.4): 7-DoF Sim3 vertices per keyframe, edges
from the spanning tree + strong covisibility (>=100 shared landmarks)
+ loop edges; fixes the loop keyframe; ~20 Gauss-Newton/LM iterations.
Scale drift is corrected by the free scale DoF (s=1 throughout for
stereo, but the parameterization is full Sim3 as in the reference).

Residual of edge (i, j) with measurement S_ji (j<-i):
    r = log( S_ji_meas^-1 ∘ S_j ∘ S_i^-1 )   in R^7
Jacobians by forward-mode autodiff through the retraction; the normal
system is assembled edge-wise with scatter-adds and solved densely
(K <= a few hundred keyframes -> 7K x 7K fits comfortably on chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
_HI = jax.lax.Precision.HIGHEST  # small-K geometry: bf16-unsafe

from ..geometry.sim3 import (
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)


def _edge_residual(s_i, R_i, t_i, s_j, R_j, t_j, sm, Rm, tm):
    """r = log(S_meas^-1 ∘ S_j ∘ S_i^-1), measurement S_meas = S_j S_i^-1."""
    si_, Ri_, ti_ = sim3_inverse(s_i, R_i, t_i)
    s_ji, R_ji, t_ji = sim3_compose(s_j, R_j, t_j, si_, Ri_, ti_)
    sm_, Rm_, tm_ = sim3_inverse(sm, Rm, tm)
    se, Re, te = sim3_compose(sm_, Rm_, tm_, s_ji, R_ji, t_ji)
    return sim3_log(se, Re, te)


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_pose_graph(
    s0: jnp.ndarray,        # [K] initial scales
    R0: jnp.ndarray,        # [K, 3, 3]
    t0: jnp.ndarray,        # [K, 3]
    kf_valid: jnp.ndarray,  # [K]
    fixed: jnp.ndarray,     # [K] bool (loop KF and any anchors)
    edge_i: jnp.ndarray,    # [E] int32
    edge_j: jnp.ndarray,    # [E]
    edge_s: jnp.ndarray,    # [E] measured relative Sim3 (j <- i)
    edge_R: jnp.ndarray,    # [E, 3, 3]
    edge_t: jnp.ndarray,    # [E, 3]
    edge_valid: jnp.ndarray,  # [E]
    edge_weight: jnp.ndarray,  # [E]
    n_iters: int = 20,
    fix_scale: bool = True,
):
    """Returns optimized (s, R, t). fix_scale=True pins every scale DoF
    (stereo/RGB-D mode: the reference uses bFixScale=true there)."""
    K = s0.shape[0]

    def residuals_and_jacs(s, R, t):
        def per_edge(i, j, sm, Rm, tm):
            def f(xi_i, xi_j):
                ds_i, dR_i, dt_i = sim3_exp(xi_i)
                ds_j, dR_j, dt_j = sim3_exp(xi_j)
                s_i, R_i, t_i = sim3_compose(ds_i, dR_i, dt_i, s[i], R[i], t[i])
                s_j, R_j, t_j = sim3_compose(ds_j, dR_j, dt_j, s[j], R[j], t[j])
                return _edge_residual(s_i, R_i, t_i, s_j, R_j, t_j, sm, Rm, tm)

            z = jnp.zeros(7)
            r = f(z, z)
            Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(z, z)
            return r, Ji, Jj

        return jax.vmap(per_edge)(edge_i, edge_j, edge_s, edge_R, edge_t)

    mask_free = (~fixed) & kf_valid

    def body(carry, _):
        s, R, t, lam = carry
        r, Ji, Jj = residuals_and_jacs(s, R, t)   # [E,7], [E,7,7]x2
        w = jnp.where(edge_valid, edge_weight, 0.0)

        H = jnp.zeros((K, 7, K, 7))
        g = jnp.zeros((K, 7))
        JiTJi = jnp.einsum("edi,edj,e->eij", Ji, Ji, w, precision=_HI)
        JjTJj = jnp.einsum("edi,edj,e->eij", Jj, Jj, w, precision=_HI)
        JiTJj = jnp.einsum("edi,edj,e->eij", Ji, Jj, w, precision=_HI)
        H = H.at[edge_i, :, edge_i, :].add(JiTJi)
        H = H.at[edge_j, :, edge_j, :].add(JjTJj)
        H = H.at[edge_i, :, edge_j, :].add(JiTJj)
        H = H.at[edge_j, :, edge_i, :].add(jnp.swapaxes(JiTJj, -1, -2))
        g = g.at[edge_i].add(jnp.einsum("edi,ed,e->ei", Ji, r, w, precision=_HI))
        g = g.at[edge_j].add(jnp.einsum("edi,ed,e->ei", Jj, r, w, precision=_HI))

        m = jnp.repeat(mask_free.astype(jnp.float32), 7)
        if fix_scale:
            # pin the sigma (log-scale) coordinate of every vertex
            scale_pin = jnp.tile(
                jnp.array([1, 1, 1, 1, 1, 1, 0], jnp.float32), K
            )
            m = m * scale_pin
        Hf = H.reshape(7 * K, 7 * K)
        Hf = Hf + lam * jnp.diag(jnp.diag(Hf)) + 1e-8 * jnp.eye(7 * K)
        Hf = Hf * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        gf = g.reshape(-1) * m
        dx = -jnp.linalg.solve(Hf, gf).reshape(K, 7)

        ds, dR, dt = sim3_exp(dx)
        s2, R2, t2 = jax.vmap(sim3_compose)(ds, dR, dt, s, R, t)

        err0 = jnp.sum(jnp.where(edge_valid, jnp.sum(r * r, -1) * edge_weight, 0.0))
        r2, _, _ = residuals_and_jacs(s2, R2, t2)
        err1 = jnp.sum(jnp.where(edge_valid, jnp.sum(r2 * r2, -1) * edge_weight, 0.0))
        accept = err1 < err0
        s = jnp.where(accept, s2, s)
        R = jnp.where(accept, R2, R)
        t = jnp.where(accept, t2, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e5)
        return (s, R, t, lam), None

    (s, R, t, _), _ = jax.lax.scan(
        body, (s0, R0, t0, jnp.float32(1e-6)), None, length=n_iters
    )
    return s, R, t
