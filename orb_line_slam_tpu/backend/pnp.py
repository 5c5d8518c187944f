"""EPnP + RANSAC: camera pose from 2D-3D correspondences.

Rebuilds src/PnPsolver.cc (SURVEY.md §2.1 row 14): EPnP (4 control
points, barycentric coordinates, null-space of the 2n x 12 system)
inside RANSAC, used by relocalization.  The reference's adaptive
iteration loop becomes a fixed batch of hypotheses, each solved with
one vmapped 12x12 eigendecomposition — all hypotheses in parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
_HI = jax.lax.Precision.HIGHEST  # small-K geometry: bf16-unsafe

from ..geometry.camera import CameraIntrinsics, project
from .sim3_solver import horn_alignment


def _epnp_single(pw: jnp.ndarray, uv: jnp.ndarray, cam: CameraIntrinsics):
    """EPnP on n>=6 correspondences: pw [n,3] world, uv [n,2] pixels.
    Returns (R, t) world->cam."""
    n = pw.shape[0]
    # Control points: centroid + principal axes.
    c0 = jnp.mean(pw, axis=0)
    centered = pw - c0
    cov = jnp.matmul(centered.T, centered, precision=_HI) / n
    w, v = jnp.linalg.eigh(cov)
    scales = jnp.sqrt(jnp.clip(w, 1e-8, None))
    C = jnp.concatenate([c0[None], c0[None] + v.T * scales[:, None]], axis=0)  # [4,3]

    # Barycentric coordinates: pw = alpha @ C with sum(alpha)=1.
    Ch = jnp.concatenate([C.T, jnp.ones((1, 4))], axis=0)       # [4,4]
    pwh = jnp.concatenate([pw.T, jnp.ones((1, n))], axis=0)     # [4,n]
    alpha = jnp.linalg.solve(Ch, pwh).T                          # [n,4]

    # M x = 0 with x = 12 control-point camera coords.
    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    u, vv = uv[:, 0], uv[:, 1]
    zeros = jnp.zeros((n, 4))
    rows_u = jnp.concatenate(
        [alpha * fu, zeros, alpha * (uc - u)[:, None]], axis=1
    )  # [n, 12] (x-cols, y-cols, z-cols interleaved by block)
    rows_v = jnp.concatenate(
        [zeros, alpha * fv, alpha * (vc - vv)[:, None]], axis=1
    )
    M = jnp.concatenate([rows_u, rows_v], axis=0)  # [2n, 12]
    MtM = jnp.matmul(M.T, M, precision=_HI)
    _, vecs = jnp.linalg.eigh(MtM)
    x = vecs[:, 0]  # smallest eigenvector
    Cc = jnp.stack([x[0:4], x[4:8], x[8:12]], axis=1)  # [4,3] per block layout

    # Fix sign + scale beta so camera-frame distances match world ones.
    dw = jnp.linalg.norm(C[:, None] - C[None, :], axis=-1)
    dc = jnp.linalg.norm(Cc[:, None] - Cc[None, :], axis=-1)
    beta = jnp.sum(dw * dc) / jnp.maximum(jnp.sum(dc * dc), 1e-12)
    Cc = Cc * beta
    # positive depth: points should be in front (z>0 on average)
    pc = jnp.matmul(alpha, Cc, precision=_HI)
    sign = jnp.where(jnp.mean(pc[:, 2]) < 0, -1.0, 1.0)
    Cc = Cc * sign

    # R, t from control-point alignment (rigid Horn, scale fixed).
    s, R, t = horn_alignment(Cc[None], C[None], fix_scale=True)
    return R[0], t[0]


@functools.partial(jax.jit, static_argnames=("cam", "n_hyps", "sample_size"))
def solve_pnp_ransac(
    points_w: jnp.ndarray,   # [N, 3]
    uv: jnp.ndarray,         # [N, 2]
    valid: jnp.ndarray,      # [N]
    key: jnp.ndarray,
    cam: CameraIntrinsics,
    sigma2: jnp.ndarray,     # [N] per-point sigma^2 (octave-scaled)
    n_hyps: int = 128,
    sample_size: int = 6,
):
    """Batched RANSAC EPnP. Returns (R, t, inlier_mask, n_inliers)."""
    N = points_w.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyps, sample_size), replace=True, p=p)

    def hyp(i):
        R, t = _epnp_single(points_w[idx[i]], uv[idx[i]], cam)
        return R, t

    Rs, ts = jax.vmap(hyp)(jnp.arange(n_hyps))
    # Score all hypotheses.
    pc = jnp.einsum("hij,nj->hni", Rs, points_w, precision=_HI) + ts[:, None, :]
    pred = project(cam, pc)
    err = jnp.sum((pred - uv[None]) ** 2, axis=-1)
    ok = (err < 5.991 * sigma2[None]) & (pc[..., 2] > 0.05) & valid[None]
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], ok[best], counts[best]
