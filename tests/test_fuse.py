"""Fusion tests: duplicate landmarks across keyframes get merged and
observations get added (SearchInNeighbors / MapPoint::Replace)."""

import numpy as np

from orb_line_slam_tpu.config import MapConfig
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics, project_stereo
from orb_line_slam_tpu.slam_map.fuse import replace_point, search_in_neighbors
from orb_line_slam_tpu.slam_map.map_store import MapStore
import jax.numpy as jnp

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
F = 128
SCALES = (1.0, 1.2, 1.44, 1.728)


class _F:
    def __init__(self, pts_c, descs):
        obs = np.asarray(project_stereo(CAM, jnp.asarray(pts_c)))
        self.xy = obs[:, :2].astype(np.float32)
        self.u_right = obs[:, 2].astype(np.float32)
        self.depth = pts_c[:, 2].astype(np.float32)
        self.octave = np.zeros(len(pts_c), np.int32)
        self.angle = np.zeros(len(pts_c), np.float32)
        self.desc = descs
        self.valid = np.ones(len(pts_c), bool)


def build_two_kf_store():
    rng = np.random.default_rng(3)
    store = MapStore(MapConfig(max_keyframes=8, max_points=1024, max_lines=8), F)
    pts_w = np.stack(
        [rng.uniform(-4, 4, F), rng.uniform(-2, 2, F), rng.uniform(6, 20, F)], -1
    ).astype(np.float32)
    descs = rng.integers(0, 256, (F, 32), dtype=np.uint8)

    t0 = np.zeros(3, np.float32)
    t1 = np.array([0.3, 0.0, 0.0], np.float32)  # world->cam translation
    f0 = _F(pts_w + t0, descs)
    f1 = _F(pts_w + t1, descs)
    k0 = store.add_keyframe(f0, np.eye(3, dtype=np.float32), t0, 0)
    k1 = store.add_keyframe(f1, np.eye(3, dtype=np.float32), t1, 1)

    # KF0 creates landmarks for all features; KF1 tracked features
    # 60..127 (shared observations -> covisibility) but spawned
    # DUPLICATE landmarks for its first 60 features (match failures at
    # tracking time — the situation SearchInNeighbors exists to fix).
    ids0 = store.add_points(pts_w, descs, np.zeros(F, np.int32), k0, np.arange(F))
    store.kf_obs_lm[k1, 60:] = ids0[60:]
    dup = store.add_points(
        pts_w[:60] + rng.normal(0, 0.01, (60, 3)).astype(np.float32),
        descs[:60], np.zeros(60, np.int32), k1, np.arange(60),
    )
    store.update_point_stats(np.concatenate([ids0, dup]))
    return store, k0, k1, ids0, dup


def test_replace_point():
    store, k0, k1, ids0, dup = build_two_kf_store()
    src, dst = int(dup[0]), int(ids0[0])
    replace_point(store, src, dst)
    assert not store.pt_valid[src]
    assert (store.kf_obs_lm[k1] == dst).sum() == 1


def test_search_in_neighbors_merges_duplicates():
    store, k0, k1, ids0, dup = build_two_kf_store()
    n_before = int(store.pt_valid.sum())
    fused = search_in_neighbors(store, k1, CAM, SCALES, n_neighbors=3)
    n_after = int(store.pt_valid.sum())
    assert fused > 40, f"only {fused} fused"
    assert n_after < n_before - 30, f"{n_before} -> {n_after} landmarks"
    # KF1 now observes (merged) landmarks also seen by KF0 -> covisible.
    W = store.covisibility()
    assert W[k0, k1] > 40
