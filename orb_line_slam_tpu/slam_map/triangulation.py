"""Two-view triangulation of new map points between keyframes.

Rebuilds LocalMapping::CreateNewMapPoints +
ORBmatcher::SearchForTriangulation (SURVEY.md §2.1 rows 3, 11; §3.3):
for a keyframe pair, match unassociated features under the epipolar
constraint (dense masked Hamming matrix instead of the BoW node
pruning), triangulate linearly, and apply the reference's acceptance
checks (parallax, positive depth, reprojection error, scale
consistency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import CameraIntrinsics
from ..geometry.se3 import hat, se3_apply, se3_compose, se3_inverse
from ..ops.hamming import hamming_matrix, knn2
from ..frontend.initializer import triangulate_two_view


def fundamental_from_poses(R1, t1, R2, t2, K):
    """F12 such that x2^T F x1 = 0 for pixel coords."""
    R12, t12 = se3_compose(R2, t2, *se3_inverse(R1, t1))  # cam2 <- cam1
    E = hat(t12) @ R12
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor"))
def triangulate_between(
    xy1, desc1, oct1, avail1,     # KF1 feature slots ([N,2],[N,32],[N],[N])
    xy2, desc2, oct2, avail2,     # KF2
    R1, t1, R2, t2,
    cam: CameraIntrinsics,
    scale_factor: float = 1.2,
):
    """Returns (idx2 [N] match in KF2 per KF1 feature, pts_w [N, 3],
    good [N]) for newly triangulated landmarks."""
    K = cam.K
    F12 = fundamental_from_poses(R1, t1, R2, t2, K)

    # Epipolar gate: distance of kp2 to the epipolar line of kp1.
    ah = jnp.concatenate([xy1, jnp.ones((xy1.shape[0], 1))], axis=1)
    lines2 = ah @ F12.T  # line in image 2 per kp1
    bh = jnp.concatenate([xy2, jnp.ones((xy2.shape[0], 1))], axis=1)
    num = (lines2 @ bh.T) ** 2  # [N1, N2]
    den = lines2[:, 0:1] ** 2 + lines2[:, 1:2] ** 2 + 1e-12
    d2 = num / den
    sigma2_2 = jnp.power(jnp.float32(scale_factor), 2.0 * oct2.astype(jnp.float32))
    epi_ok = d2 < 3.84 * sigma2_2[None, :]

    dist = hamming_matrix(desc1, desc2)
    gate = epi_ok & avail2[None, :]
    idx, d1, d2nd = knn2(dist, gate)
    matched = avail1 & (d1 < 50)

    p2 = xy2[idx]
    pts_c1 = triangulate_two_view(
        *se3_compose(R2, t2, *se3_inverse(R1, t1)), K, xy1, p2
    )
    # world coords
    Rwc1, twc1 = se3_inverse(R1, t1)
    pts_w = se3_apply(Rwc1, twc1, pts_c1)

    # checks: positive depth in both, reprojection, parallax
    pc1 = pts_c1
    pc2 = se3_apply(*se3_compose(R2, t2, *se3_inverse(R1, t1)), pts_c1)
    z_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)

    def reproj_err(pc, obs):
        pr = pc @ K.T
        w = jnp.where(jnp.abs(pr[:, 2:]) < 1e-9, 1e-9, pr[:, 2:])
        return jnp.sum((pr[:, :2] / w - obs) ** 2, axis=1)

    sigma2_1 = jnp.power(jnp.float32(scale_factor), 2.0 * oct1.astype(jnp.float32))
    r_ok = (reproj_err(pc1, xy1) < 5.991 * sigma2_1) & (
        reproj_err(pc2, p2) < 5.991 * sigma2_2[idx]
    )
    # parallax: rays must subtend a minimum angle
    Rrel, trel = se3_compose(R2, t2, *se3_inverse(R1, t1))
    c2_in_1 = -jnp.einsum("ji,j->i", Rrel, trel)
    r1 = pc1
    r2 = pc1 - c2_in_1
    cosp = jnp.sum(r1 * r2, axis=1) / (
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1) + 1e-12
    )
    par_ok = cosp < 0.99995

    good = matched & z_ok & r_ok & par_ok
    return idx, pts_w, good


def create_new_map_points(store, kf_id, cam, scale_factor=1.2, n_neighbors=5,
                          max_new=256):
    """Host orchestration of CreateNewMapPoints for a fresh keyframe."""
    ids, _ = store.covisible_keyframes(kf_id, min_weight=10, max_n=n_neighbors)
    created = []
    avail1 = store.kf_feat_valid[kf_id] & (store.kf_obs_lm[kf_id] < 0)
    for k2 in ids:
        if not avail1.any():
            break
        avail2 = store.kf_feat_valid[k2] & (store.kf_obs_lm[k2] < 0)
        # baseline check: skip pairs with tiny baseline (mono rule).
        b = np.linalg.norm(
            (-store.kf_R[kf_id].T @ store.kf_t[kf_id])
            - (-store.kf_R[k2].T @ store.kf_t[k2])
        )
        if b < 0.05:
            continue
        idx, pts_w, good = triangulate_between(
            jnp.asarray(store.kf_xy[kf_id]), jnp.asarray(store.kf_desc[kf_id]),
            jnp.asarray(store.kf_oct[kf_id]), jnp.asarray(avail1),
            jnp.asarray(store.kf_xy[k2]), jnp.asarray(store.kf_desc[k2]),
            jnp.asarray(store.kf_oct[k2]), jnp.asarray(avail2),
            jnp.asarray(store.kf_R[kf_id]), jnp.asarray(store.kf_t[kf_id]),
            jnp.asarray(store.kf_R[k2]), jnp.asarray(store.kf_t[k2]),
            cam, scale_factor,
        )
        idx, pts_w, good = jax.device_get((idx, pts_w, good))
        rows = np.nonzero(good)[0][:max_new]
        if len(rows) == 0:
            continue
        new_ids = store.add_points(
            pts_w[rows], store.kf_desc[kf_id][rows],
            store.kf_oct[kf_id][rows], kf_id, rows,
        )
        # second observation in k2
        n_created = len(new_ids)
        store.kf_obs_lm[k2, idx[rows[:n_created]]] = new_ids
        store.touch_obs()
        avail1[rows[:n_created]] = False
        created.extend(int(i) for i in new_ids)
    return np.asarray(created, np.int32)
