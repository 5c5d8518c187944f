"""LoopCloser integration on a synthetic drifted map: revisiting a place
must be detected via BoW + consistency, Sim3-corrected, and the
essential graph must pull the drifted tail back."""

import numpy as np
import pytest

from orb_line_slam_tpu.config import MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.loop.loop_closing import LoopCloser
from orb_line_slam_tpu.loop.vocabulary import Vocabulary
from orb_line_slam_tpu.slam_map.map_store import MapStore

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
RNG = np.random.default_rng(33)
F = 256  # features per KF


def fake_frame_arrays(descs, pts_cam):
    """Project camera-frame points to make plausible kf feature slots."""
    u = CAM.fx * pts_cam[:, 0] / pts_cam[:, 2] + CAM.cx
    v = CAM.fy * pts_cam[:, 1] / pts_cam[:, 2] + CAM.cy
    return u, v


class _F:
    """Duck-typed Frame for MapStore.add_keyframe."""

    def __init__(self, descs, pts_cam):
        n = len(descs)
        u, va = fake_frame_arrays(descs, pts_cam)
        self.xy = np.stack([u, va], -1).astype(np.float32)
        self.u_right = (u - CAM.bf / pts_cam[:, 2]).astype(np.float32)
        self.depth = pts_cam[:, 2].astype(np.float32)
        self.octave = np.zeros(n, np.int32)
        self.angle = np.zeros(n, np.float32)
        self.desc = descs
        self.valid = np.ones(n, bool)


def build_drifted_map():
    cfg = SlamConfig(
        camera=CAM,
        orb=OrbConfig(n_features=F, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=8192, max_lines=64,
                      local_window=6, local_points=2048),
    )
    store = MapStore(cfg.map, F)

    n_kf = 12
    drift = np.array([1.5, 0.4, 0.8], np.float32)  # accumulated at return
    n_own = 156  # own landmarks per KF; remaining slots reobserve the
    n_shared = F - n_own  # previous KF's landmarks (creates covisibility)

    # Place descriptors: reused by the return keyframes (same views).
    place_desc = {k: RNG.integers(0, 256, (F, 32), dtype=np.uint8) for k in range(9)}
    pts_cam = np.stack(
        [RNG.uniform(-4, 4, F), RNG.uniform(-2, 2, F), RNG.uniform(5, 25, F)], -1
    ).astype(np.float32)

    true_t = []
    prev_ids = None
    prev_place = None
    for k in range(n_kf):
        place = k if k < 9 else 11 - k
        t_true = np.array([0.0, 0.0, 1.0 * place], np.float32)
        true_t.append(t_true)
        # estimated pose: drifted for the return keyframes
        frac = max(0, (k - 6) / (n_kf - 7))
        t_est = t_true + drift * frac
        R = np.eye(3, dtype=np.float32)

        descs = place_desc[place].copy()
        if prev_place is not None:
            descs[n_own:] = place_desc[prev_place][:n_shared]
        frame = _F(descs, pts_cam)
        kf = store.add_keyframe(frame, R, t_est, frame_id=k, timestamp=k * 0.1)
        # own landmarks from the DRIFTED pose (self-consistent map)
        pts_w = pts_cam[:n_own] - t_est
        ids = store.add_points(
            pts_w, descs[:n_own], np.zeros(n_own, np.int32), kf, np.arange(n_own)
        )
        # shared observations of the previous KF's landmarks — placed at
        # their TRUE projections into this camera, as real tracking
        # would observe them (the Sim3 refinement checks bidirectional
        # reprojection consistency, so fixture geometry must cohere).
        if prev_ids is not None:
            store.kf_obs_lm[kf, n_own:] = prev_ids[:n_shared]
            p_cam = store.pt_pos[prev_ids[:n_shared]] @ R.T + t_est
            u = CAM.fx * p_cam[:, 0] / p_cam[:, 2] + CAM.cx
            v = CAM.fy * p_cam[:, 1] / p_cam[:, 2] + CAM.cy
            store.kf_xy[kf, n_own:] = np.stack([u, v], -1)
            store.kf_ur[kf, n_own:] = u - CAM.bf / p_cam[:, 2]
            store.kf_depth[kf, n_own:] = p_cam[:, 2]
        prev_ids = ids
        prev_place = place

    return cfg, store, np.stack(true_t), drift


@pytest.mark.slow
def test_loop_detection_and_correction():
    cfg, store, true_t, drift = build_drifted_map()
    # Vocabulary trained on all map descriptors.
    voc = Vocabulary.train(
        store.kf_desc[store.kf_valid].reshape(-1, 32)[:8000], k=8, depth=3
    )
    lc = LoopCloser(cfg, store, voc)

    closed_at = None
    for k in range(store._next_kf):
        if lc.process_keyframe(k, run_gba=False):
            closed_at = lc.last_closed_kf
    if closed_at is None and lc.flush(run_gba=False):
        closed_at = lc.last_closed_kf
    assert closed_at is not None, "loop never closed"
    assert closed_at >= 10

    # After correction the drifted return keyframes must be near their
    # true positions (they had up to |drift| = 1.8 m of error).
    err_after = np.linalg.norm(store.kf_t[closed_at] - true_t[closed_at])
    assert err_after < 0.4, f"loop KF error after correction {err_after:.2f} m"
    # Mid-trajectory keyframes must have been pulled back too.
    err_mid = np.linalg.norm(store.kf_t[8] - true_t[8])
    assert err_mid < 0.8, f"mid-chain error {err_mid:.2f} m"


@pytest.mark.slow
def test_async_gba_dispatch_poll_and_propagation():
    """dispatch_global_ba + poll_global_ba must apply the solve and
    propagate to keyframes/landmarks created while it was in flight
    (the reference's RunGlobalBundleAdjustment post-solve handling)."""
    cfg, store, true_t, drift = build_drifted_map()
    voc = Vocabulary.train(
        store.kf_desc[store.kf_valid].reshape(-1, 32)[:8000], k=8, depth=3
    )
    lc = LoopCloser(cfg, store, voc)
    lc.gba_async = True

    lc.dispatch_global_ba(iters1=2, iters2=3)
    assert lc._pending_gba is not None

    # A keyframe arrives while the solve is in flight, with a known
    # relative pose to the last snapshot KF.
    parent = store._next_kf - 1
    Rp, tp = store.kf_R[parent].copy(), store.kf_t[parent].copy()
    R_rel = np.eye(3, dtype=np.float32)
    t_rel = np.array([0.0, 0.0, -1.0], np.float32)
    descs = RNG.integers(0, 256, (F, 32), dtype=np.uint8)
    pts_cam = np.stack(
        [RNG.uniform(-4, 4, F), RNG.uniform(-2, 2, F), RNG.uniform(5, 25, F)], -1
    ).astype(np.float32)
    frame = _F(descs, pts_cam)
    kf_new = store.add_keyframe(
        frame, R_rel @ Rp, R_rel @ tp + t_rel, frame_id=99, timestamp=9.9
    )
    # A landmark created in flight (not part of the dispatched problem).
    Rk, tk = store.kf_R[kf_new], store.kf_t[kf_new]
    x_w = np.array([[1.0, 0.5, 12.0]], np.float32)
    x_cam_before = (Rk @ x_w[0] + tk).copy()
    ids = store.add_points(
        x_w, descs[:1], np.zeros(1, np.int32), kf_new, np.array([0])
    )

    assert lc.poll_global_ba(force=True)
    assert lc._pending_gba is None

    # Relative pose child<-parent is preserved by the propagation.
    R_rel_after = store.kf_R[kf_new] @ store.kf_R[parent].T
    t_rel_after = store.kf_t[kf_new] - R_rel_after @ store.kf_t[parent]
    np.testing.assert_allclose(R_rel_after, R_rel, atol=1e-4)
    np.testing.assert_allclose(t_rel_after, t_rel, atol=1e-3)
    # The in-flight landmark keeps its camera-frame position in its
    # first keyframe.
    x_cam_after = store.kf_R[kf_new] @ store.pt_pos[ids[0]] + store.kf_t[kf_new]
    np.testing.assert_allclose(x_cam_after, x_cam_before, atol=1e-3)
