"""Cross-keyframe landmark fusion (SearchInNeighbors).

Rebuilds LocalMapping::SearchInNeighbors + ORBmatcher::Fuse
(SURVEY.md §2.1 rows 3, 11; §3.3): project the new keyframe's landmarks
into its covisible neighbours (and vice versa); where a projection hits
a feature already bound to a DIFFERENT landmark the two are duplicates
of one physical point — merge into the better-observed one; where it
hits a free feature, add the observation.  Kills the duplicate
landmarks that drift creates at revisits.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..matching.point_matcher import resolve_duplicates, search_by_projection


def _kf_view(store, k):
    """Frame pytree over a keyframe's stored feature slots (jit-able)."""
    from ..frontend.frame import Frame

    return Frame(
        xy=jnp.asarray(store.kf_xy[k]),
        response=jnp.zeros(store.F, jnp.float32),
        angle=jnp.asarray(store.kf_angle[k]),
        octave=jnp.asarray(store.kf_oct[k]),
        desc=jnp.asarray(store.kf_desc[k]),
        valid=jnp.asarray(store.kf_feat_valid[k]),
        u_right=jnp.asarray(store.kf_ur[k]),
        depth=jnp.asarray(store.kf_depth[k]),
    )


def replace_point(store, src: int, dst: int):
    """Merge landmark src into dst (MapPoint::Replace)."""
    store.replace_points(np.asarray([src]), np.asarray([dst]))


def fuse_into_keyframe(store, lm_ids: np.ndarray, k: int, cam, level_scales,
                       radius: float = 3.0):
    """Project landmarks into keyframe k; add observations / merge
    duplicates. Returns number of fused observations."""
    lm_ids = lm_ids[store.pt_valid[lm_ids]]
    if len(lm_ids) == 0:
        return 0
    # Pad to a bucketed capacity: a raw len(lm_ids) shape would force an
    # XLA recompile of the projection-search program on every keyframe.
    n = len(lm_ids)
    cap = max(1024, 1 << (n - 1).bit_length())
    pad = cap - n
    ids_p = np.pad(lm_ids, (0, pad))
    valid = np.zeros(cap, bool)
    valid[:n] = True
    view = _kf_view(store, k)
    m = search_by_projection(
        jnp.asarray(store.pt_pos[ids_p]),
        jnp.asarray(store.pt_desc[ids_p]),
        jnp.asarray(valid),
        jnp.asarray(store.pt_oct[ids_p]),
        jnp.asarray(store.kf_R[k]), jnp.asarray(store.kf_t[k]),
        view, cam, level_scales,
        radius=radius, max_dist=50, ratio=1.0, check_ur=True,
        max_dist_p=jnp.asarray(store.pt_max_dist[ids_p]),
        min_dist_p=jnp.asarray(store.pt_min_dist[ids_p]),
        normal_p=jnp.asarray(store.pt_normal[ids_p]),
        oct_tol=2,  # PredictScale is calibrated +1 for this detector
    )
    m = resolve_duplicates(m, store.F)
    import jax

    mask, idx = jax.device_get((m.mask, m.idx))
    counts = store.obs_counts()
    rows = np.nonzero(mask[:n])[0]
    if len(rows) == 0:
        return 0
    lm = lm_ids[rows].astype(np.int64)
    feat = idx[rows].astype(np.int64)
    existing = store.kf_obs_lm[k, feat].astype(np.int64)
    changed = existing != lm
    lm, feat, existing = lm[changed], feat[changed], existing[changed]
    if len(lm) == 0:
        return 0
    is_dup = (existing >= 0) & store.pt_valid[np.clip(existing, 0, None)]
    # Free slots: bind the landmark directly (new observation).
    free = ~is_dup
    if free.any():
        store.kf_obs_lm[k, feat[free]] = lm[free].astype(np.int32)
    # Duplicates: merge into the better-observed landmark (batched).
    if is_dup.any():
        a, b = lm[is_dup], existing[is_dup]
        keep_existing = counts[b] >= counts[a]
        src = np.where(keep_existing, a, b)
        dst = np.where(keep_existing, b, a)
        # Rebind the slot first so replace_points' remap settles it.
        store.kf_obs_lm[k, feat[is_dup]] = src.astype(np.int32)
        store.replace_points(src, dst)
    store.touch_obs()
    return int(len(lm))


def search_in_neighbors(store, kf: int, cam, level_scales, n_neighbors: int = 5):
    """Bidirectional fuse between a fresh keyframe and its covisible
    neighbours. Returns total fused count."""
    ids, _ = store.covisible_keyframes(kf, min_weight=10, max_n=n_neighbors)
    own = store.kf_obs_lm[kf]
    own = np.unique(own[own >= 0])
    total = 0
    neigh_lms = []
    for k2 in ids:
        total += fuse_into_keyframe(store, own, int(k2), cam, level_scales)
        lm2 = store.kf_obs_lm[k2]
        neigh_lms.append(lm2[lm2 >= 0])
    if neigh_lms:
        pooled = np.unique(np.concatenate(neigh_lms))
        total += fuse_into_keyframe(store, pooled, kf, cam, level_scales)
    if total:
        own = store.kf_obs_lm[kf]
        store.update_point_stats(np.unique(own[own >= 0]))
    return total
